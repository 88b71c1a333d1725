"""Eval CLI: CLIP metrics over render directories."""

import numpy as np
import pytest


@pytest.mark.slow
def test_eval_cli(tmp_path, capsys):
    from PIL import Image

    from gaussctrl_tpu.cli.eval import main

    rng = np.random.default_rng(0)
    for name in ("edited", "original"):
        d = tmp_path / name
        d.mkdir()
        for i in range(3):
            Image.fromarray((rng.uniform(size=(40, 40, 3)) * 255
                             ).astype(np.uint8)).save(d / f"{i:03d}.png")
    out = main(["--edited", str(tmp_path / "edited"),
                "--original", str(tmp_path / "original"),
                "--edit-prompt", "a polar bear",
                "--reverse-prompt", "a bear statue"])
    assert -1.0 <= out["clip_similarity"] <= 1.0
    assert -1.0 <= out["clip_directional_similarity"] <= 1.0
    assert out["num_views"] == 3 and not out["real_clip_weights"]

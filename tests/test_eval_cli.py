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


@pytest.mark.slow
def test_eval_cli_run_mode(tmp_path, capsys):
    """--run reads prompts/dirs from the run's config.json and writes
    eval_metrics.json back into the run directory."""
    import json

    from PIL import Image

    from gaussctrl_tpu.cli.eval import main

    rng = np.random.default_rng(1)
    run = tmp_path / "run"
    for name in ("edited", "unedited"):
        d = run / name
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray((rng.uniform(size=(40, 40, 3)) * 255
                             ).astype(np.uint8)).save(d / f"{i:03d}.png")
    (run / "config.json").write_text(json.dumps({"pipeline": {
        "edit_prompt": "a polar bear", "reverse_prompt": "a bear statue"}}))
    out = main(["--run", str(run)])
    assert out["num_views"] == 2
    assert -1.0 <= out["clip_directional_similarity"] <= 1.0
    saved = json.loads((run / "eval_metrics.json").read_text())
    assert saved == {k: v for k, v in out.items()}


def test_eval_cli_requires_args():
    from gaussctrl_tpu.cli.eval import main

    with pytest.raises(SystemExit):
        main(["--edited", "/nonexistent"])  # no prompt, no --run


def test_directional_similarity_rejects_unpaired():
    from gaussctrl_tpu.metrics import CLIPScorer, clip_directional_similarity

    scorer = CLIPScorer.from_dir(None)
    a = np.zeros((2, 40, 40, 3), np.float32)
    b = np.zeros((3, 40, 40, 3), np.float32)
    with pytest.raises(ValueError, match="paired views"):
        clip_directional_similarity(scorer, a, b, "x", "y")

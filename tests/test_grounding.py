"""Text->box->mask stack (tiny random weights): shapes + contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.clip import (
    CLIPTextConfig, CLIPTextModel, CLIPVisionConfig, CLIPVisionModel,
    HashTokenizer,
)
from gaussctrl_tpu.seg.grounding import (
    ClipBoxProposer, GroundedSAMMasker, build_langsam_equivalent,
)


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    m = CLIPVisionModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, cfg.image_size, cfg.image_size, 3))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out = m.apply({"params": params}, x)
    g = cfg.image_size // cfg.patch_size
    assert out.shape == (2, 1 + g * g, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def masker():
    return build_langsam_equivalent()  # tiny random-init stack


def test_box_proposer_output_contract(masker):
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (3, 48, 48, 3))
    boxes = masker.proposer(imgs, "a bear")
    assert boxes.shape == (3, 4)
    for b in boxes:
        if b[0] >= 0:
            assert 0 <= b[0] < b[2] <= 48 and 0 <= b[1] < b[3] <= 48


@pytest.mark.slow
def test_grounded_masker_shapes(masker):
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 48, 48, 3))
    masks = masker(imgs, "a bear")
    assert masks.shape == (2, 48, 48, 1)
    m = np.asarray(masks)
    assert ((m == 0) | (m == 1)).all()


def test_masker_rejects_when_below_min_score(masker):
    masker.proposer.min_score = 10.0  # impossible cosine similarity
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (2, 48, 48, 3))
    masks = masker(imgs, "a unicorn")
    assert float(np.abs(np.asarray(masks)).max()) == 0.0
    masker.proposer.min_score = 0.0

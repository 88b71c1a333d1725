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


@pytest.mark.slow
def test_grounded_masker_with_dino_proposer(tmp_path):
    """The FULL reference mask path — GroundingDINO (text->box) into SAM
    (box->mask) into the compositing contract — through the DINO port at
    tiny config, not the CLIP fallback (VERDICT r3 #7: pins shapes and
    interfaces so only weight fidelity remains open). Mirrors
    lang_sam.py:84-121 driving gc_pipeline.py:148-157/223-234."""
    from gaussctrl_tpu.seg.dino import (
        DinoBoxProposer, DinoConfig, GroundingDINO, WordPieceTokenizer)
    from gaussctrl_tpu.seg.sam import SAM, SAMConfig

    cfg = DinoConfig.tiny()
    model = GroundingDINO(cfg)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "bear"] + \
        [f"tok{i}" for i in range(40)]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vp))
    cap = "bear."
    ids = np.zeros((1, cfg.max_text_len), np.int32)
    enc = tok.encode(cap)
    ids[0, :len(enc)] = enc
    from gaussctrl_tpu.seg.dino import phrase_masks
    attn, pos = phrase_masks(ids, tok.specials)
    attn = attn | np.eye(cfg.max_text_len, dtype=bool)
    tmask = np.zeros((1, cfg.max_text_len), bool)
    tmask[0, :len(enc)] = True
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
                        ids, pos.astype(np.int32), attn, tmask)["params"]

    prop = DinoBoxProposer(model, params, tok, box_threshold=0.0)
    masker = GroundedSAMMasker(SAM.create(SAMConfig.tiny()), prop)

    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 40, 48, 3))
    masks = masker(imgs, "bear")
    assert masks.shape == (2, 40, 48, 1)
    m = np.asarray(masks)
    assert ((m == 0) | (m == 1)).all() and np.isfinite(m).all()

    # compositing contract (gc_pipeline.py:223-234): edit under the mask,
    # unedited elsewhere — exactly what the pipeline does with this masker
    edited = jnp.ones_like(imgs)
    composite = masks * edited + (1 - masks) * imgs
    c = np.asarray(composite)
    np.testing.assert_allclose(c[m[..., 0] > 0.5], 1.0, atol=1e-6)
    sel = np.broadcast_to(m <= 0.5, c.shape)
    np.testing.assert_allclose(c[sel[..., 0]],
                               np.asarray(imgs)[sel[..., 0]], atol=1e-6)

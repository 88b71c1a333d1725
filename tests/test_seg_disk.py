"""SAM / GroundingDINO loaders against REAL .pth files written by the tests.

Completes the real-weight plumbing coverage for the segmentation stack
(VERDICT r1 #7): torch .pth on disk -> load_sam / load_dino -> running
forward pass. The converters' value-level correctness is pinned by the
in-memory roundtrip tests; this pins the torch unpickle + checkpoint-layout
handling (module. prefixes, {"model": sd} nesting, config detection).
"""

import jax
import numpy as np
import pytest


def _save_pth(path, sd, nest_model=False, module_prefix=False):
    import torch
    t = {("module." if module_prefix else "") + k:
         torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": t} if nest_model else t, path)


@pytest.mark.slow
def test_load_sam_from_disk(tmp_path):
    import jax
    from gaussctrl_tpu.seg.sam import SAM, SAMConfig
    from gaussctrl_tpu.seg.weights import load_sam
    from tests.test_sam import _fake_sam_sd

    cfg = SAMConfig.tiny()
    sam = SAM.create(cfg, key=jax.random.PRNGKey(0))
    p = tmp_path / "sam_tiny.pth"
    _save_pth(p, _fake_sam_sd(sam.params))
    loaded = load_sam(str(p), cfg=cfg)
    import jax.numpy as jnp
    img = jnp.asarray(np.random.default_rng(0).random(
        (1, cfg.img_size, cfg.img_size, 3), np.float32))
    boxes = jnp.asarray([[4.0, 4.0, cfg.img_size - 4.0, cfg.img_size - 4.0]])
    m1, iou1 = sam.predict_boxes(sam.encode(img), boxes)
    m2, iou2 = loaded.predict_boxes(loaded.encode(img), boxes)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou2), np.asarray(iou1), atol=1e-5)


@pytest.mark.slow
def test_load_dino_from_disk(tmp_path):
    import jax.numpy as jnp
    from gaussctrl_tpu.seg.dino_weights import load_dino
    from tests.test_dino import CFG, _fake_torch_sd, _text_inputs

    p = tmp_path / "groundingdino_tiny.pth"
    # the official ckpt nests under "model" with DDP "module." prefixes
    _save_pth(p, _fake_torch_sd(), nest_model=True, module_prefix=True)
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".",
                             "bear", "the"]) + "\n")
    model, params, tok = load_dino(str(p), str(vp), cfg=CFG)
    ids, pos, attn, mask = _text_inputs()
    im = jnp.zeros((1, CFG.img_size, CFG.img_size, 3))
    logits, boxes = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        im, ids, pos, attn, mask)
    assert np.isfinite(np.asarray(logits[:, :, :5])).all()
    assert boxes.shape[-1] == 4
    assert tok.encode("the bear.")[0] == 2      # [CLS]

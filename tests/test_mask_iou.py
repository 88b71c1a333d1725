"""Mask-quality floor for the offline grounding stack (VERDICT r2 weak #5).

Real CLIP/SAM weights are environment-blocked, so these tests isolate the
MACHINERY that turns a heatmap into the final composited mask — component
labeling, multi-box scoring/ordering, box→encoder-pixel scaling, SAM logit
thresholding, resize-back — with controlled inputs: an injected similarity
heatmap (bypassing the CLIP towers) and an oracle SAM whose logits are
positive exactly inside the prompted box. A bad box or a scale bug silently
becomes a bad edit via mask compositing; these pin a measurable IoU floor.
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.seg.grounding import (
    ClipBoxProposer, GroundedSAMMasker, LangSAM, _label_components,
    build_langsam_equivalent,
)

H, W, G = 96, 128, 16          # image size, heatmap grid
PX, PY = W / G, H / G          # pixels per patch


def _heatmap_two_blobs():
    """[G,G] map: blob A (hot, 1.0) at patches y 2:6 x 3:7; blob B (0.9) at
    y 10:14 x 9:13; background 0. rel_threshold .75 keeps both."""
    s = np.zeros((G, G), np.float32)
    s[2:6, 3:7] = 1.0
    s[10:14, 9:13] = 0.9
    return s


BOX_A = np.array([3 * PX, 2 * PY, 7 * PX, 6 * PY], np.float32)
BOX_B = np.array([9 * PX, 10 * PY, 13 * PX, 14 * PY], np.float32)


def _patched_proposer(heatmaps):
    """A ClipBoxProposer whose CLIP stage is replaced by fixed heatmaps."""
    p = build_langsam_equivalent().proposer
    p._sims = lambda images, prompt: np.broadcast_to(
        heatmaps, (images.shape[0],) + heatmaps.shape[-2:])
    return p


class _OracleSAM:
    """predict_boxes -> logits positive exactly inside each box (encoder px)."""

    def __init__(self, img_size=64):
        self.cfg = types.SimpleNamespace(img_size=img_size)

    def encode(self, images01):
        return jnp.zeros((images01.shape[0], 1, 1, 1))

    def predict_boxes(self, emb, boxes):
        s = self.cfg.img_size
        yy = jnp.arange(s, dtype=jnp.float32)[None, :, None] + 0.5
        xx = jnp.arange(s, dtype=jnp.float32)[None, None, :] + 0.5
        inside = ((xx >= boxes[:, None, None, 0])
                  & (xx < boxes[:, None, None, 2])
                  & (yy >= boxes[:, None, None, 1])
                  & (yy < boxes[:, None, None, 3]))
        return jnp.where(inside, 1.0, -1.0), jnp.ones((boxes.shape[0],))


def _box_iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def _mask_iou(mask, box):
    gt = np.zeros(mask.shape, bool)
    gt[int(round(box[1])):int(round(box[3])),
       int(round(box[0])):int(round(box[2]))] = True
    m = mask > 0.5
    return (m & gt).sum() / max((m | gt).sum(), 1)


def test_label_components():
    hot = np.zeros((6, 6), bool)
    hot[0:2, 0:2] = True
    hot[4:6, 3:6] = True
    hot[2, 5] = True               # diagonal from the second blob: separate
    comps = _label_components(hot)
    assert sorted(len(ys) for ys, _ in comps) == [1, 4, 6]


def test_proposer_multibox_recovers_blobs_ordered():
    p = _patched_proposer(_heatmap_two_blobs())
    img = np.zeros((H, W, 3), np.float32)
    boxes, scores, phrases = p.predict_boxes(img, "a bear")
    assert len(boxes) == 2 and phrases == ["a bear", "a bear"]
    assert scores[0] >= scores[1]                 # best-first ordering
    assert _box_iou(boxes[0], BOX_A) > 0.99       # patch-aligned: near-exact
    assert _box_iou(boxes[1], BOX_B) > 0.99
    # score calibration: cosine 1.0 -> 1.0, 0.9 -> 0.95
    np.testing.assert_allclose(scores, [1.0, 0.95], atol=1e-5)
    # box_threshold filters the weaker detection
    b2, s2, _ = p.predict_boxes(img, "a bear", box_threshold=0.97)
    assert len(b2) == 1 and _box_iou(b2[0], BOX_A) > 0.99


def test_single_box_call_picks_best_component():
    """__call__ (the pipeline masker path) must return the BEST component,
    not the bounding box of every hot patch (which would span both blobs)."""
    p = _patched_proposer(_heatmap_two_blobs())
    imgs = jnp.zeros((2, H, W, 3))
    boxes = p(imgs, "a bear")
    for b in boxes:
        assert _box_iou(b, BOX_A) > 0.99


def test_langsam_predict_multi_detection_mask_iou():
    p = _patched_proposer(_heatmap_two_blobs())
    ls = LangSAM(_OracleSAM(), p)
    img = np.zeros((H, W, 3), np.float32)
    masks, boxes, phrases, logits = ls.predict(img, "a bear")
    assert masks.shape == (2, H, W)
    for m, gt in zip(masks, (BOX_A, BOX_B)):
        assert _mask_iou(np.asarray(m), gt) > 0.85   # resize quantization
    assert len(phrases) == 2 and len(logits) == 2


def test_grounded_masker_end_to_end_iou_floor():
    """Proposer box -> encoder scaling -> SAM logits -> resize-back keeps
    IoU >= 0.85 against the known object region, per view."""
    p = _patched_proposer(_heatmap_two_blobs())
    masker = GroundedSAMMasker(_OracleSAM(), p, batch=2)
    imgs = jnp.zeros((3, H, W, 3))
    masks = np.asarray(masker(imgs, "a bear"))
    assert masks.shape == (3, H, W, 1)
    for i in range(3):
        assert _mask_iou(masks[i, ..., 0], BOX_A) > 0.85


def test_masker_no_detection_gives_zero_mask():
    p = _patched_proposer(np.full((G, G), -1.0, np.float32))
    p.min_score = 0.0              # heatmap max -1 < floor -> reject
    masker = GroundedSAMMasker(_OracleSAM(), p, batch=2)
    masks = np.asarray(masker(jnp.zeros((2, H, W, 3)), "a unicorn"))
    assert np.abs(masks).max() == 0.0

"""Text-prompted grounding: text -> boxes -> SAM masks (the Lang-SAM role).

The reference chains GroundingDINO SwinB (text->boxes) into SAM (boxes->masks)
(/root/reference/gaussctrl/lang_sam.py:84-121). The box-proposal stage here is
pluggable:

  * `ClipBoxProposer` — an open-vocabulary proposer built from the CLIP towers
    already in the framework: patch-token/text cosine-similarity heatmap,
    relative-threshold, box around the hot region. Weaker than GroundingDINO
    but fully offline-portable (CLIP weights only).
  * any callable `(images [V,H,W,3], text) -> boxes [V,4]` (xyxy, image
    pixels) can replace it — e.g. a GroundingDINO port once its weights are
    available.

`GroundedSAMMasker` implements the pipeline's MaskProvider contract
(`langsam_obj` path, gc_pipeline.py:148-152), including the reference's
box_threshold-style rejection: views where nothing matches get all-zero masks
(their edits are suppressed by the compositing, keeping the scene consistent).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.diffusion.clip import (
    CLIP_MEAN, CLIP_STD, CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
    CLIPVisionModel, load_tokenizer,
)
from gaussctrl_tpu.seg.sam import SAM


def _resize(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


def _label_components(hot: np.ndarray):
    """4-connected component labeling on a small boolean grid (host numpy —
    the grid is g×g ≈ 16×16 patches, a BFS is microseconds). Returns a list
    of (ys, xs) index arrays, one per component."""
    g_h, g_w = hot.shape
    seen = np.zeros_like(hot, bool)
    comps = []
    for sy, sx in zip(*np.nonzero(hot)):
        if seen[sy, sx]:
            continue
        stack = [(sy, sx)]
        seen[sy, sx] = True
        ys, xs = [], []
        while stack:
            y, x = stack.pop()
            ys.append(y)
            xs.append(x)
            for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                if 0 <= ny < g_h and 0 <= nx < g_w and hot[ny, nx] \
                        and not seen[ny, nx]:
                    seen[ny, nx] = True
                    stack.append((ny, nx))
        comps.append((np.asarray(ys), np.asarray(xs)))
    return comps


@dataclasses.dataclass
class ClipBoxProposer:
    """Text -> boxes via CLIP patch-similarity heatmap.

    Multi-detection: the thresholded heatmap is split into 4-connected
    components, one box per component, scored by the component's peak cosine
    similarity calibrated to [0,1] ((s+1)/2) and sorted descending — so
    detection [0] is the best match, matching the reference pipeline's
    `masks[0]` convention (gc_pipeline.py:151-152)."""
    vision: CLIPVisionModel
    text: CLIPTextModel
    params: dict                  # {"vision":…, "text":…, "visual_projection",
                                  #  "text_projection"}
    tokenizer: object
    rel_threshold: float = 0.75   # keep patches ≥ thresh · max-similarity
    min_score: float = 0.0        # absolute floor (cosine) to accept any box

    def __post_init__(self):
        def heatmap(params, x, ids):
            tokens = self.vision.apply({"params": params["vision"]}, x)
            patches = tokens[:, 1:] @ params["visual_projection"]
            patches = patches / jnp.linalg.norm(
                patches, axis=-1, keepdims=True).clip(1e-8)
            temb = self.text.apply({"params": params["text"]}, ids,
                                   params["text_projection"],
                                   method=CLIPTextModel.embed)[0]
            temb = temb / jnp.linalg.norm(temb).clip(1e-8)
            return patches @ temb

        self._heatmap = jax.jit(heatmap)

    def _sims(self, images: jnp.ndarray, prompt: str) -> np.ndarray:
        """Batched patch-similarity heatmaps [V, g, g] (one jit call)."""
        size = self.vision.cfg.image_size
        x = _resize(images, size)
        x = (x - CLIP_MEAN) / CLIP_STD
        ids = jnp.asarray(self.tokenizer.encode(prompt))[None]
        g = size // self.vision.cfg.patch_size
        return np.asarray(self._heatmap(self.params, x, ids)).reshape(
            images.shape[0], g, g)

    def _detections(self, s: np.ndarray, h: int, w: int):
        """One heatmap [g,g] -> (boxes [K,4] xyxy px, scores [K] in [0,1]),
        best first."""
        g = s.shape[0]
        if s.max() < self.min_score:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        hot = s >= s.min() + self.rel_threshold * (s.max() - s.min())
        boxes, scores = [], []
        for ys, xs in _label_components(hot):
            boxes.append([xs.min() / g * w, ys.min() / g * h,
                          (xs.max() + 1) / g * w, (ys.max() + 1) / g * h])
            scores.append((float(s[ys, xs].max()) + 1.0) / 2.0)
        if not boxes:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        order = np.argsort(scores)[::-1]
        return (np.asarray(boxes, np.float32)[order],
                np.asarray(scores, np.float32)[order])

    def __call__(self, images: jnp.ndarray, prompt: str) -> np.ndarray:
        """images [V,H,W,3] in [0,1] -> boxes [V,4] xyxy (−1s = no match).

        One box per view: the BEST-scoring connected component (not the
        bounding box of every hot patch — that merged disjoint matches into
        one inflated box)."""
        v, h, w, _ = images.shape
        sim = self._sims(images, prompt)
        boxes = np.full((v, 4), -1.0, np.float32)
        for i in range(v):
            det, _ = self._detections(sim[i], h, w)
            if len(det):
                boxes[i] = det[0]
        return boxes

    def predict_boxes(self, image: np.ndarray, prompt: str,
                      box_threshold: float = 0.3,
                      text_threshold: float = 0.25):
        """LangSAM multi-detection contract (lang_sam.py:95-100): one image
        [H,W,3] -> (boxes [K,4], logits [K], phrases [K]), score-filtered.
        Scores are calibrated cosines ((s+1)/2 ∈ [0,1]) — comparable to, if
        flatter than, GroundingDINO's sigmoid logits; text_threshold is
        accepted for signature parity (the CLIP proposer has one phrase)."""
        h, w, _ = image.shape
        sim = self._sims(jnp.asarray(image)[None], prompt)[0]
        boxes, scores = self._detections(sim, h, w)
        keep = scores >= box_threshold
        boxes, scores = boxes[keep], scores[keep]
        return boxes, scores, [prompt] * len(boxes)


class GroundedSAMMasker:
    """MaskProvider: text -> boxes (proposer) -> SAM masks, per view."""

    def __init__(self, sam: SAM,
                 proposer: Callable[[jnp.ndarray, str], np.ndarray],
                 batch: int = 4):
        self.sam = sam
        self.proposer = proposer
        self.batch = batch
        self._encode = jax.jit(self.sam.encode)
        self._predict = jax.jit(self.sam.predict_boxes)

    def __call__(self, images: jnp.ndarray, text: str) -> jnp.ndarray:
        v, h, w, _ = images.shape
        boxes = np.asarray(self.proposer(images, text))   # [V, 4] image px
        size = self.sam.cfg.img_size
        scale = np.array([size / w, size / h, size / w, size / h], np.float32)
        masks = []
        for lo in range(0, v, self.batch):
            hi = min(lo + self.batch, v)
            imgs = _resize(images[lo:hi], size)
            emb = self._encode(imgs)
            b = jnp.asarray(np.clip(boxes[lo:hi], 0, None) * scale)
            logits, _ = self._predict(emb, b)
            m = (logits > 0).astype(images.dtype)[..., None]
            m = jax.image.resize(m, (hi - lo, h, w, 1), method="nearest")
            # views with no box proposal get zero masks (nothing to edit)
            found = jnp.asarray((boxes[lo:hi, 0] >= 0).astype(images.dtype))
            masks.append(m * found[:, None, None, None])
        return jnp.concatenate(masks)


class LangSAM:
    """The reference's `LangSAM` API, verbatim (lang_sam.py:115-121):
    `predict(image, text_prompt, box_threshold, text_threshold)` returns
    (masks [K,H,W], boxes [K,4] xyxy, phrases [K], logits [K]) for ALL
    detections. `image` may be a PIL image or an [H,W,3] array in [0,1]."""

    def __init__(self, sam: SAM, proposer):
        self.sam = sam
        self.proposer = proposer
        self._encode = jax.jit(sam.encode)
        self._predict = jax.jit(sam.predict_boxes)

    def predict(self, image, text_prompt: str, box_threshold: float = 0.3,
                text_threshold: float = 0.25):
        if hasattr(image, "convert"):                  # PIL image
            image = np.asarray(image.convert("RGB"), np.float32) / 255.0
        image = np.asarray(image, np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        h, w, _ = image.shape
        if hasattr(self.proposer, "predict_boxes"):
            boxes, logits, phrases = self.proposer.predict_boxes(
                image, text_prompt, box_threshold, text_threshold)
        else:                                          # single-box proposers
            b = np.asarray(self.proposer(jnp.asarray(image)[None],
                                         text_prompt))[0]
            found = b[0] >= 0
            boxes = b[None] if found else np.zeros((0, 4), np.float32)
            logits = np.ones((1,), np.float32) if found else np.zeros((0,))
            phrases = [text_prompt] if found else []
        if len(boxes) == 0:
            return (np.zeros((0, h, w), np.float32), boxes, phrases, logits)
        size = self.sam.cfg.img_size
        k = len(boxes)
        # pad the box batch to a power of two: k varies per image/prompt and
        # each distinct k would otherwise recompile the jitted decoder
        kp = 1 << (k - 1).bit_length()
        im = jax.image.resize(jnp.asarray(image)[None], (1, size, size, 3),
                              "bilinear")
        emb = self._encode(im)
        emb = jnp.broadcast_to(emb, (kp,) + emb.shape[1:])
        scale = np.array([size / w, size / h, size / w, size / h], np.float32)
        bpad = np.zeros((kp, 4), np.float32)
        bpad[:k] = np.clip(boxes, 0, None) * scale
        mlogits, _ = self._predict(emb, jnp.asarray(bpad))
        masks = (mlogits[:k] > 0).astype(np.float32)
        masks = jax.image.resize(masks[..., None], (k, h, w, 1), "nearest")
        return np.asarray(masks)[..., 0], boxes, phrases, logits


def build_langsam_equivalent(
    sam_ckpt: Optional[str] = None,
    clip_dir: Optional[str] = None,
    sam: Optional[SAM] = None,
    dino_ckpt: Optional[str] = None,
    dino_vocab: Optional[str] = None,
) -> GroundedSAMMasker:
    """Assemble the full text->mask stack from local checkpoints.

    With `dino_ckpt` (+ BERT `dino_vocab` vocab.txt) the box stage is the
    GroundingDINO port — the reference's exact detector (lang_sam.py:84-88);
    otherwise the CLIP patch-similarity proposer. Falls back to random-init
    modules when paths are missing (shape-correct, for smoke tests only).
    """
    if sam is None:
        if sam_ckpt:
            from gaussctrl_tpu.seg.weights import load_sam
            sam = load_sam(sam_ckpt)
        else:
            from gaussctrl_tpu.seg.sam import SAMConfig
            sam = SAM.create(SAMConfig.tiny())

    if dino_ckpt:
        from gaussctrl_tpu.seg.dino import DinoBoxProposer
        from gaussctrl_tpu.seg.dino_weights import load_dino
        assert dino_vocab, "GroundingDINO needs a BERT vocab.txt path"
        model, params, tok = load_dino(dino_ckpt, dino_vocab)
        return GroundedSAMMasker(sam, DinoBoxProposer(model, params, tok))

    vcfg = CLIPVisionConfig.vit_l14() if clip_dir else CLIPVisionConfig.tiny()
    tcfg = CLIPTextConfig.sd15() if clip_dir else CLIPTextConfig.tiny()
    vision = CLIPVisionModel(vcfg)
    text = CLIPTextModel(tcfg)
    if clip_dir:
        from gaussctrl_tpu.diffusion.weights import load_clip_model
        params = load_clip_model(clip_dir)
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "vision": jax.jit(lambda k: vision.init(
                k, jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
            )["params"])(k1),
            "text": jax.jit(lambda k: text.init(
                k, jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32)
            )["params"])(k2),
            "visual_projection": jax.random.normal(
                jax.random.PRNGKey(3),
                (vcfg.hidden_size, vcfg.projection_dim)) * 0.05,
            "text_projection": jax.random.normal(
                jax.random.PRNGKey(4),
                (tcfg.hidden_size, vcfg.projection_dim)) * 0.05,
        }
    tokenizer = load_tokenizer(clip_dir, tcfg)
    proposer = ClipBoxProposer(vision, text, params, tokenizer)
    return GroundedSAMMasker(sam, proposer)

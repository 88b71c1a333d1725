"""Real-weight fidelity battery (VERDICT r2 next #7).

The four foreign ports (SD-1.5 UNet/VAE/CLIP + ControlNet-depth:
/root/reference/gaussctrl/gc_pipeline.py:97-102; SAM ViT-H + GroundingDINO:
lang_sam.py:16-18,84-88) cannot be validated end-to-end in a zero-egress
environment. This module packages every offline-provable invariant into one
battery so the FIRST environment that has the checkpoints can certify the
ports with a single command:

    python -m gaussctrl_tpu.cli.certify --diffusers-dir … --controlnet-dir … \
        [--sam-ckpt …] [--dino-ckpt … --dino-vocab …] [--image …] --out v.json

Each check returns {"ok": bool, ...detail}; the CLI writes one JSON verdict.
Checks are also importable individually (tests reuse the goldens here).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

# CLIP BPE golden token ids (HF CLIPTokenizer, openai/clip-vit-large-patch14 —
# the SD-1.5 text stack the reference loads via diffusers). Byte-exact.
TOKENIZER_GOLDENS = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
    "": [49406, 49407],
}

# published SD-1.5 scaled_linear schedule endpoints (diffusers
# DDIMScheduler(beta_start=8.5e-4, beta_end=0.012, steps=1000))
ALPHAS_CUMPROD_GOLDEN = {0: 0.99915, 999: 0.0046825}


def _psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12) / peak ** 2))


def check_tokenizer(sd_dir: str) -> Dict[str, Any]:
    """Golden token ids through the in-repo BPE against the real vocab."""
    from gaussctrl_tpu.diffusion.clip import CLIPTokenizer
    vocab = os.path.join(sd_dir, "tokenizer", "vocab.json")
    merges = os.path.join(sd_dir, "tokenizer", "merges.txt")
    tok = CLIPTokenizer(vocab, merges, max_length=77)
    bad = {}
    for text, golden in TOKENIZER_GOLDENS.items():
        ids = list(np.asarray(tok.encode(text)))
        got = ids[: len(golden)]
        if got != golden or any(i != tok.EOS for i in ids[len(golden):]):
            bad[text] = got
    return {"ok": not bad, "mismatches": bad}


def check_alpha_schedule() -> Dict[str, Any]:
    from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
    ac = np.asarray(DDIMSchedule.sd15().alphas_cumprod, np.float64)
    errs = {str(i): float(abs(ac[i] - v))
            for i, v in ALPHAS_CUMPROD_GOLDEN.items()}
    return {"ok": all(e < 5e-5 for e in errs.values()), "abs_err": errs}


def _load_image(path: Optional[str], size: int) -> np.ndarray:
    """[1, size, size, 3] float in [0,1]; deterministic structured synthetic
    fallback when no path is given (still exercises the nets end-to-end)."""
    if path:
        import cv2
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        return img[None].astype(np.float32) / 255.0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([0.5 + 0.4 * np.sin(6 * xx),
                    0.5 + 0.4 * np.cos(4 * yy),
                    0.3 + 0.3 * ((xx - 0.5) ** 2 + (yy - 0.5) ** 2)], -1)
    return img[None]


def check_sd_stack(sd_dir: str, controlnet_dir: str,
                   image_path: Optional[str] = None,
                   prompt: str = "a photo of a bear",
                   num_steps: int = 20, cfg=None,
                   dtype=None) -> Dict[str, Any]:
    """VAE round trip, ControlNet zero-conv + scale response, and the
    invert→denoise fixed-point round trip on one image.

    `cfg`/`dtype` exist so the battery's plumbing is testable on tiny
    synthetic checkpoints (tests/test_certify.py); the CLI always runs the
    production SDConfig.sd15() in bf16."""
    import jax
    import jax.numpy as jnp
    from gaussctrl_tpu.diffusion.clip import load_tokenizer
    from gaussctrl_tpu.diffusion.config import SDConfig
    from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
    from gaussctrl_tpu.diffusion.sample import (
        SDModels, denoise, encode_text, eps_model, invert, vae_decode,
        vae_encode)
    from gaussctrl_tpu.diffusion.weights import load_sd_params

    out: Dict[str, Any] = {}
    cfg = cfg or SDConfig.sd15()
    dtype = dtype or jnp.bfloat16
    models = SDModels.create(cfg, dtype=dtype)
    params = load_sd_params(sd_dir, controlnet_dir)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    tok = load_tokenizer(sd_dir, cfg.text)

    img = jnp.asarray(_load_image(image_path, cfg.sample_size * 8))
    z0 = jax.jit(lambda p, x: vae_encode(models, p, x))(params, img)
    rec = jax.jit(lambda p, z: vae_decode(models, p, z))(params, z0)
    vae_psnr = _psnr(np.clip(np.asarray(rec, np.float32), 0, 1),
                     np.asarray(img))
    out["vae_roundtrip"] = {"ok": vae_psnr >= 18.0, "psnr": round(vae_psnr, 2)}

    # zero convs of a TRAINED controlnet must be nonzero (a converter that
    # drops/misnames them silently zeroes the residuals = scale-0 behavior)
    zc = [np.abs(np.asarray(v, np.float32)).max()
          for k, v in _flat(params["controlnet"]).items()
          if "controlnet" in k.lower() or "zero" in k.lower()] or [
          np.abs(np.asarray(v, np.float32)).max()
          for k, v in _flat(params["controlnet"]).items()]
    out["controlnet_nonzero"] = {"ok": float(max(zc)) > 0.0,
                                 "max_abs": float(max(zc))}

    ids = jnp.asarray(tok.encode(prompt))[None]
    ctx = jax.jit(lambda p, i: encode_text(models, p, i))(params, ids)
    disp = jnp.broadcast_to(img.mean(-1, keepdims=True), img.shape)
    t = jnp.int32(201)
    e1 = jax.jit(lambda p: eps_model(models, p, z0, t, ctx, disp, 1.0))(params)
    e0 = jax.jit(lambda p: eps_model(models, p, z0, t, ctx, disp, 0.0))(params)
    diff = float(np.abs(np.asarray(e1 - e0, np.float32)).max())
    out["controlnet_scale_response"] = {
        "ok": bool(np.isfinite(np.asarray(e1, np.float32)).all()) and diff > 0,
        "eps_delta_maxabs": diff}

    sched = DDIMSchedule.sd15()
    zT = jax.jit(lambda p, z, c, d: invert(
        models, p, sched, z, c, d, num_steps))(params, z0, ctx, disp)
    z0p = jax.jit(lambda p, z, c, d: denoise(
        models, p, sched, z, c, c, d, guidance_scale=1.0,
        num_steps=num_steps))(params, zT, ctx, disp)
    lat_psnr = _psnr(np.asarray(z0p, np.float32), np.asarray(z0, np.float32),
                     peak=float(np.abs(np.asarray(z0, np.float32)).max()))
    rec2 = jax.jit(lambda p, z: vae_decode(models, p, z))(params, z0p)
    img_psnr = _psnr(np.clip(np.asarray(rec2, np.float32), 0, 1),
                     np.asarray(img))
    out["invert_denoise_roundtrip"] = {
        # 20-step DDIM inversion at guidance 1 is a near fixed point on real
        # weights; random weights land ~0-6 dB, real SD-1.5 typically >18
        "ok": lat_psnr >= 15.0 and img_psnr >= 14.0,
        "latent_psnr": round(lat_psnr, 2), "image_psnr": round(img_psnr, 2)}
    return out


def check_cross_view_edit(sd_dir: str, controlnet_dir: str,
                          image_path: Optional[str] = None,
                          edit_prompt: str = "a photo of a polar bear",
                          reverse_prompt: str = "a photo of a bear",
                          num_steps: int = 20, guidance: float = 5.0,
                          cfg=None, dtype=None) -> Dict[str, Any]:
    """Tiny two-view cross-view edit golden (VERDICT r4 #6): fidelity AND
    method correctness in one deterministic run (DDIM eta=0, no RNG).

    Builds two nearly-identical 'views' (the certify image and an 8px
    translation), inverts both with the reverse prompt, then edits both in
    one CFG batch twice: (a) with the cross-view processor (view 0 as the
    single reference — /root/reference/gaussctrl/utils.py:86-117 semantics)
    and (b) independently (no processor). The method's core claim is that
    (a) yields MORE consistent edits across views than (b):

        consistency_gain = L2(ind0, ind1) / L2(xv0, xv1)  >  1

    On real SD-1.5 + ControlNet weights the gain is expected well above 1;
    random weights land ~1.0 and correctly fail (calibration pinned in
    tests/test_certify.py on the fake-ckpt fixtures)."""
    import jax
    import jax.numpy as jnp
    from gaussctrl_tpu.diffusion.clip import load_tokenizer
    from gaussctrl_tpu.diffusion.config import SDConfig
    from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
    from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
    from gaussctrl_tpu.diffusion.sample import (
        SDModels, denoise, encode_text, invert, vae_decode, vae_encode)
    from gaussctrl_tpu.diffusion.weights import load_sd_params

    cfg = cfg or SDConfig.sd15()
    dtype = dtype or jnp.bfloat16
    models = SDModels.create(cfg, dtype=dtype)
    params = load_sd_params(sd_dir, controlnet_dir)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    tok = load_tokenizer(sd_dir, cfg.text)

    img0 = _load_image(image_path, cfg.sample_size * 8)
    img1 = np.roll(img0, 8, axis=2)               # second view: 8px shift
    imgs = jnp.asarray(np.concatenate([img0, img1]))
    z0 = jax.jit(lambda p, x: vae_encode(models, p, x))(params, imgs)
    disp = jnp.broadcast_to(imgs.mean(-1, keepdims=True), imgs.shape)

    def ctx(text):
        ids = jnp.asarray(tok.encode(text))[None]
        one = jax.jit(lambda p, i: encode_text(models, p, i))(params, ids)
        return jnp.concatenate([one, one])

    sched = DDIMSchedule.sd15()
    zT = jax.jit(lambda p, z, c, d: invert(
        models, p, sched, z, c, d, num_steps))(params, z0,
                                               ctx(reverse_prompt), disp)

    cp, cn = ctx(edit_prompt), ctx("")
    groups = 2 if guidance > 1.0 else 1
    run = jax.jit(lambda p, z, cp, cn, d, up, crp: denoise(
        models, p, sched, z, cp, cn, d, guidance_scale=guidance,
        num_steps=num_steps, unet_processor=up, controlnet_processor=crp),
        static_argnames=("up", "crp"))
    z_xv = run(params, zT, cp, cn, disp,
               CrossViewAttnProcessor(1, 0.6, groups),
               CrossViewAttnProcessor(1, 0.0, groups))
    z_ind = run(params, zT, cp, cn, disp, None, None)
    dec = jax.jit(lambda p, z: vae_decode(models, p, z))
    e_xv = np.clip(np.asarray(dec(params, z_xv), np.float32), 0, 1)
    e_ind = np.clip(np.asarray(dec(params, z_ind), np.float32), 0, 1)

    def l2(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    d_xv = l2(e_xv[0], e_xv[1])
    d_ind = l2(e_ind[0], e_ind[1])
    gain = d_ind / max(d_xv, 1e-9)
    finite = bool(np.isfinite(e_xv).all() and np.isfinite(e_ind).all())
    return {"ok": finite and gain > 1.0,
            "consistency_gain": round(gain, 4),
            "xv_view_l2": round(d_xv, 5), "ind_view_l2": round(d_ind, 5),
            "edit_changed_image": l2(e_xv[0],
                                     np.asarray(imgs[0], np.float32)) > 1e-3}


def check_sam(sam_ckpt: str, image_path: Optional[str] = None
              ) -> Dict[str, Any]:
    import jax.numpy as jnp
    from gaussctrl_tpu.seg.weights import load_sam
    sam = load_sam(sam_ckpt)
    s = sam.cfg.img_size
    img = jnp.asarray(_load_image(image_path, s))
    emb = sam.encode(img)
    box = jnp.asarray([[s * 0.25, s * 0.25, s * 0.75, s * 0.75]], jnp.float32)
    logits, iou = sam.predict_boxes(emb, box)
    m = np.asarray(logits, np.float32) > 0
    frac = float(m.mean())
    return {"ok": bool(np.isfinite(np.asarray(logits, np.float32)).all())
            and 0.0 < frac < 1.0,
            "mask_frac": round(frac, 4), "iou_pred": float(np.asarray(iou)[0])}


def check_dino(dino_ckpt: str, dino_vocab: str,
               image_path: Optional[str] = None,
               prompt: str = "bear") -> Dict[str, Any]:
    from gaussctrl_tpu.seg.dino import DinoBoxProposer
    from gaussctrl_tpu.seg.dino_weights import load_dino
    model, params, tok = load_dino(dino_ckpt, dino_vocab)
    proposer = DinoBoxProposer(model, params, tok)
    img = _load_image(image_path, 512)[0]
    boxes, logits, phrases = proposer.predict_boxes(img, prompt, 0.05, 0.05)
    # GroundingDINO box regressors can overshoot the frame slightly; accept
    # ordered corners within 10% slack (the downstream SAM stage clips)
    inb = all(b[0] <= b[2] and b[1] <= b[3]
              and -51.2 <= min(b) and max(b) <= 563.2
              for b in np.asarray(boxes))
    return {"ok": bool(inb and np.isfinite(np.asarray(logits)).all()),
            "num_boxes": int(len(boxes)),
            "top_score": float(logits[0]) if len(logits) else None}


def check_mask_iou(sam_ckpt: Optional[str] = None,
                   dino_ckpt: Optional[str] = None,
                   dino_vocab: Optional[str] = None,
                   image_path: Optional[str] = None,
                   prompt: str = "bear",
                   masker=None) -> Dict[str, Any]:
    """End-to-end text->box->mask spot check (VERDICT r3 #6): run the full
    LangSAM-role stack and verify the SAM mask spatially agrees with the
    box that prompted it — IoU(mask, box-rectangle) >= 0.25. On real
    weights a correct port puts most of the mask inside its box; random
    weights produce arbitrary masks that fail this. `masker` overrides the
    stack for plumbing tests (tests/test_certify.py)."""
    import jax.numpy as jnp

    if masker is None:
        from gaussctrl_tpu.seg.grounding import build_langsam_equivalent
        masker = build_langsam_equivalent(
            sam_ckpt=sam_ckpt, dino_ckpt=dino_ckpt, dino_vocab=dino_vocab)
    img = _load_image(image_path, 256)
    boxes = np.asarray(masker.proposer(jnp.asarray(img), prompt))
    if boxes[0, 0] < 0:  # bail before the expensive SAM mask prediction
        return {"ok": False, "reason": "no box proposed", "mask_iou": 0.0}
    mask = np.asarray(masker(jnp.asarray(img), prompt))[0, ..., 0] > 0.5
    h = w = img.shape[1]
    x0, y0, x1, y1 = np.clip(boxes[0], 0, [w, h, w, h]).astype(int)
    rect = np.zeros((h, w), bool)
    rect[y0:y1, x0:x1] = True
    inter = float((mask & rect).sum())
    union = float((mask | rect).sum())
    iou = inter / union if union else 0.0
    return {"ok": iou >= 0.25, "mask_iou": round(iou, 4),
            "box": [float(v) for v in boxes[0]],
            "mask_frac": round(float(mask.mean()), 4)}


def _flat(tree, prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = v
    return out


def run_battery(sd_dir: Optional[str] = None,
                controlnet_dir: Optional[str] = None,
                sam_ckpt: Optional[str] = None,
                dino_ckpt: Optional[str] = None,
                dino_vocab: Optional[str] = None,
                image: Optional[str] = None,
                prompt: str = "a photo of a bear",
                num_steps: int = 20) -> Dict[str, Any]:
    """Run every check whose inputs were supplied. Never raises: a crashed
    check records ok=False with the error, so one bad ckpt doesn't mask the
    other verdicts."""
    checks: Dict[str, Any] = {"alpha_schedule": check_alpha_schedule()}
    skipped = []

    def _run(name, fn, *a, **kw):
        try:
            res = fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 — verdict must always be written
            res = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if name == "_sd":
            checks.update(res)
        else:
            checks[name] = res

    if sd_dir:
        if os.path.exists(os.path.join(sd_dir, "tokenizer", "vocab.json")):
            _run("tokenizer_goldens", check_tokenizer, sd_dir)
        else:
            skipped.append("tokenizer_goldens (no tokenizer/vocab.json)")
        if controlnet_dir:
            _run("_sd", check_sd_stack, sd_dir, controlnet_dir, image,
                 prompt, num_steps)
            _run("cross_view_edit", check_cross_view_edit, sd_dir,
                 controlnet_dir, image, num_steps=num_steps)
        else:
            skipped.append("sd_stack (no --controlnet-dir)")
            skipped.append("cross_view_edit (no --controlnet-dir)")
    else:
        skipped += ["tokenizer_goldens", "sd_stack (no --diffusers-dir)",
                    "cross_view_edit (no --diffusers-dir)"]
    if sam_ckpt:
        _run("sam", check_sam, sam_ckpt, image)
        # full text->box->mask agreement, with the best proposer available
        _run("mask_iou", check_mask_iou, sam_ckpt, dino_ckpt, dino_vocab,
             image, prompt.replace("a photo of ", ""))
    else:
        skipped.append("sam (no --sam-ckpt)")
        skipped.append("mask_iou (no --sam-ckpt)")
    if dino_ckpt and dino_vocab:
        _run("dino", check_dino, dino_ckpt, dino_vocab, image, prompt)
    else:
        skipped.append("dino (no --dino-ckpt/--dino-vocab)")

    flat_ok = [v["ok"] for k, v in checks.items()
               if isinstance(v, dict) and "ok" in v]
    return {"checks": checks, "skipped": skipped,
            "all_ok": bool(flat_ok) and all(flat_ok)}

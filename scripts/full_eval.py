#!/usr/bin/env python3
"""Full-dataset pretrain-quality eval: PSNR/SSIM of a scene checkpoint over
EVERY view of a dataset (VERDICT r4 #4 — the 4-view convergence metric in
events.jsonl under-samples; the reference's quality claim is per-scene over
all views, /root/reference/README.md:100-113).

    python scripts/full_eval.py --ckpt <scene .npz | .fp16.npz> \
        --data /root/reference/data/bear [--out outputs/bear_r5/full_eval.md]

Renders each view at full training resolution with the production raster
config and prints a markdown table + summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--out", default=None, help="markdown table path")
    p.add_argument("--isect-divisor", type=int, default=4)
    p.add_argument("--large-divisor", type=int, default=32)
    args = p.parse_args(argv)

    from gaussctrl_tpu.core.mesh import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from gaussctrl_tpu.core.ckpt import load_scene_npz
    from gaussctrl_tpu.data.datamanager import DataManager, DataManagerConfig
    from gaussctrl_tpu.splat.losses import ssim
    from gaussctrl_tpu.splat.rasterize import RasterConfig, resolve_auto_blend
    from gaussctrl_tpu.splat.render import render_rgbd

    scene = load_scene_npz(args.ckpt)
    dcfg = DataManagerConfig(load_all=True)
    dcfg.dataparser.data = args.data
    dm = DataManager(dcfg)
    cams = dm.cameras
    images = dm.stacked_images()
    rc = resolve_auto_blend(RasterConfig(isect_divisor=args.isect_divisor,
                                         large_divisor=args.large_divisor))

    rows = []
    t0 = time.time()
    for i in range(len(cams)):
        c = cams[i]
        out = render_rgbd(scene, c.c2w, c.fx, c.fy, c.cx, c.cy,
                          cams.width, cams.height, jnp.zeros(3), 3, rc)
        rgb = jnp.clip(out["rgb"], 0.0, 1.0)
        gt = jnp.asarray(images[i])
        mse = float(jnp.mean((rgb - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        s = float(ssim(rgb, gt))
        rows.append((i, psnr, s))
        if i % 16 == 0:
            print(f"view {i}/{len(cams)}: psnr={psnr:.2f} ssim={s:.4f}",
                  flush=True)

    psnrs = np.array([r[1] for r in rows])
    ssims = np.array([r[2] for r in rows])
    summary = {
        "ckpt": args.ckpt,
        "data": args.data,
        "num_views": len(rows),
        "psnr_mean": round(float(psnrs.mean()), 3),
        "psnr_min": round(float(psnrs.min()), 3),
        "psnr_max": round(float(psnrs.max()), 3),
        "ssim_mean": round(float(ssims.mean()), 4),
        "ssim_min": round(float(ssims.min()), 4),
        "num_gaussians": int(scene.num_gaussians),
        "eval_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))

    if args.out:
        lines = [
            "# Full-dataset eval", "",
            f"Checkpoint: `{args.ckpt}`  ",
            f"Data: `{args.data}` ({len(rows)} views, "
            f"{cams.width}x{cams.height})  ",
            f"Gaussians: {scene.num_gaussians:,}", "",
            f"**PSNR mean {summary['psnr_mean']} "
            f"(min {summary['psnr_min']}, max {summary['psnr_max']}) — "
            f"SSIM mean {summary['ssim_mean']} "
            f"(min {summary['ssim_min']})**", "",
            "| view | PSNR | SSIM |", "|---|---|---|",
        ]
        lines += [f"| {i} | {p:.2f} | {s:.4f} |" for i, p, s in rows]
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

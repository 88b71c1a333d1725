#!/usr/bin/env python3
"""Write the pre-training eval table (VERDICT r4 item #1's deliverable).

Two parts into one markdown file:

  1. the convergence trajectory — `eval_psnr` rows from the run's
     events.jsonl (full-res 4-view PSNR every eval_every steps), plus the
     alive-gaussian count at the nearest logged step;
  2. (--final-eval) a full-resolution PSNR/SSIM sweep over every Nth train
     view rendered from a checkpoint — the table the reference produces
     with `ns-eval` after its 30k splatfacto run
     (/root/reference/README.md:100-113).

Usage:
  python scripts/make_eval_table.py outputs/bear_r4/splat/splat/<ts> \
      --out outputs/bear_r4/eval_table.md \
      [--final-eval ckpts/step-000030000.npz --data /root/reference/data/bear \
       --every 8]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def trajectory_rows(run_dir: Path):
    alive = {}
    rows = []
    for line in (run_dir / "events.jsonl").read_text().splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "n_alive" in ev:
            alive[ev["step"]] = ev["n_alive"]
        if "eval_psnr" in ev:
            rows.append(ev)
    for r in rows:
        near = [s for s in alive if s <= r["step"]]
        r["n_alive"] = alive[max(near)] if near else None
    return rows


def final_eval(ckpt: str, data: str, every: int):
    import jax.numpy as jnp
    import numpy as np

    from gaussctrl_tpu.core.ckpt import checkpoint_step, load_scene_npz
    from gaussctrl_tpu.data.datamanager import DataManager, DataManagerConfig
    from gaussctrl_tpu.splat.losses import ssim
    from gaussctrl_tpu.splat.rasterize import RasterConfig, resolve_auto_blend
    from gaussctrl_tpu.splat.render import render_rgbd

    dcfg = DataManagerConfig(load_all=True)
    dcfg.dataparser.data = data
    dm = DataManager(dcfg)
    scene, step = load_scene_npz(ckpt), checkpoint_step(ckpt)
    cams = dm.cameras
    imgs = dm.stacked_images()
    rc = resolve_auto_blend(RasterConfig(isect_divisor=4, large_divisor=32))
    rows = []
    t0 = time.time()
    for v in range(0, len(cams), every):
        out = render_rgbd(scene, cams.c2w[v], cams.fx[v], cams.fy[v],
                          cams.cx[v], cams.cy[v], cams.width, cams.height,
                          jnp.zeros(3), cfg=rc)
        mse = float(jnp.mean((out["rgb"] - imgs[v]) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-10))
        sv = float(ssim(out["rgb"], jnp.asarray(imgs[v])))
        rows.append({"view": v, "psnr": round(psnr, 3),
                     "ssim": round(sv, 4)})
    return {"ckpt": ckpt, "step": int(step), "n_views": len(rows),
            "every": every, "wall_s": round(time.time() - t0, 1),
            "num_gaussians": int(scene.num_gaussians),
            "width": int(cams.width), "height": int(cams.height),
            "psnr_mean": round(float(np.mean([r["psnr"] for r in rows])), 3),
            "ssim_mean": round(float(np.mean([r["ssim"] for r in rows])), 4),
            "rows": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--final-eval", default=None,
                    help="checkpoint for the full-res PSNR/SSIM sweep")
    ap.add_argument("--data", default=None)
    ap.add_argument("--every", type=int, default=8,
                    help="evaluate every Nth train view")
    args = ap.parse_args()

    md = ["# Pre-training eval table", "",
          f"Run: `{args.run_dir}`", "",
          "## Convergence trajectory (full-res 4-view PSNR)", "",
          "| step | eval PSNR | mean alpha | gaussians |",
          "|---|---|---|---|"]
    for r in trajectory_rows(args.run_dir):
        n = f"{int(r['n_alive']):,}" if r.get("n_alive") else "-"
        md.append(f"| {r['step']} | {r['eval_psnr']:.3f} "
                  f"| {r.get('eval_alpha', '-')} | {n} |")

    if args.final_eval:
        assert args.data, "--final-eval needs --data"
        fe = final_eval(args.final_eval, args.data, args.every)
        md += ["", f"## Final checkpoint: step {fe['step']} "
               f"({fe['num_gaussians']:,} gaussians)", "",
               f"Full-resolution ({fe['width']}x{fe['height']}) render vs "
               f"train image, every {fe['every']}th of the scene's views "
               f"({fe['n_views']} views, {fe['wall_s']} s).", "",
               f"**PSNR {fe['psnr_mean']} / SSIM {fe['ssim_mean']}**", "",
               "| view | PSNR | SSIM |", "|---|---|---|"]
        md += [f"| {r['view']} | {r['psnr']} | {r['ssim']} |"
               for r in fe["rows"]]
        (args.out.parent / "final_eval.json").write_text(
            json.dumps(fe, indent=2))

    args.out.write_text("\n".join(md) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

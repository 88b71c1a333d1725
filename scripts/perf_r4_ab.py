#!/usr/bin/env python3
"""Round-4 on-chip A/B: inversion-lane attention + edit-lane MFU levers.

Run on the REAL chip (after pre-training frees it):

    python scripts/perf_r4_ab.py [--quick] | tee outputs/perf_r4/ab.txt

Measures, with the full SD-1.5 architecture (bf16, random weights — FLOPs
don't depend on values):

  1. inversion scan, b=40 single shot: plain einsum (scores budget inf),
     q-blocked einsum at several budgets, and forced flash — vs the r3
     2 x b=20 baseline. The winner sets the production render_batch.
  2. edit scan (40 views, CFG-doubled b=80) with the same routing matrix —
     guards the 0.726 views/s headline against routing regressions.
  3. hint-hoisting delta: the r4 embed_hint change is exact-numerics; this
     quantifies the scan-time saving.

Each variant is its own subprocess so GAUSSCTRL_* env routing is clean and
an OOM kills one lane, not the sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

VARIANTS = [
    # (name, env, bench args)
    ("inv40_einsum_inf", {"GAUSSCTRL_SCORES_MB": "1000000"}, ["inv", "40"]),
    ("inv40_qblock_2048", {"GAUSSCTRL_SCORES_MB": "2048"}, ["inv", "40"]),
    ("inv40_qblock_1024", {"GAUSSCTRL_SCORES_MB": "1024"}, ["inv", "40"]),
    ("inv40_qblock_512", {"GAUSSCTRL_SCORES_MB": "512"}, ["inv", "40"]),
    ("inv40_flash", {"GAUSSCTRL_FLASH": "1"}, ["inv", "40"]),
    # transposed small-head_dim schedule: d on sublanes (pad 40->48, not
    # 40->128) — targets the 3.2x MXU flop waste that made flash lose to
    # einsum at 4096 tokens in the r3 A/B
    ("inv40_flash_t", {"GAUSSCTRL_FLASH": "1",
                       "GAUSSCTRL_FLASH_KERNEL": "full_t"}, ["inv", "40"]),
    ("inv20_flash_t", {"GAUSSCTRL_FLASH": "1",
                       "GAUSSCTRL_FLASH_KERNEL": "full_t"}, ["inv", "20"]),
    ("edit40_flash_t", {"GAUSSCTRL_FLASH": "1",
                        "GAUSSCTRL_FLASH_KERNEL": "full_t"}, ["edit", "40"]),
    ("inv20_einsum_inf", {"GAUSSCTRL_SCORES_MB": "1000000"}, ["inv", "20"]),
    ("inv20_qblock_2048", {"GAUSSCTRL_SCORES_MB": "2048"}, ["inv", "20"]),
    ("edit40_einsum_inf", {"GAUSSCTRL_SCORES_MB": "1000000"}, ["edit", "40"]),
    ("edit40_qblock_2048", {"GAUSSCTRL_SCORES_MB": "2048"}, ["edit", "40"]),
    ("edit40_qblock_4096", {"GAUSSCTRL_SCORES_MB": "4096"}, ["edit", "40"]),
    # hint-hoisting delta (r4 embed_hint change, exact numerics): =0 restores
    # the per-step CondEmbedding ladder the diffusers pipeline runs
    ("edit40_nohoist", {"GAUSSCTRL_SCORES_MB": "1000000",
                        "GAUSSCTRL_HOIST_HINT": "0"}, ["edit", "40"]),
    ("inv20_nohoist", {"GAUSSCTRL_SCORES_MB": "1000000",
                       "GAUSSCTRL_HOIST_HINT": "0"}, ["inv", "20"]),
    # branch isolation (run with --only iso): edit40_flash_t flips BOTH the
    # self branch and the grouped-ref branch to flash at once; these two
    # flip one at a time (GAUSSCTRL_REF_ATTN overrides only the processor's
    # ref gate) to locate where the edit lane's time actually goes.
    ("edit40_iso_selfflasht_refeinsum",
     {"GAUSSCTRL_FLASH": "1", "GAUSSCTRL_FLASH_KERNEL": "full_t",
      "GAUSSCTRL_REF_ATTN": "einsum",
      "GAUSSCTRL_SCORES_MB": "1000000"}, ["edit", "40"]),
    ("edit40_iso_selfeinsum_refflasht",
     {"GAUSSCTRL_FLASH": "0", "GAUSSCTRL_FLASH_KERNEL": "full_t",
      "GAUSSCTRL_REF_ATTN": "flash",
      "GAUSSCTRL_SCORES_MB": "1000000"}, ["edit", "40"]),
]

WORKER = r'''
import json, sys, time
import jax, jax.numpy as jnp
mode, b = sys.argv[1], int(sys.argv[2])
from gaussctrl_tpu.core.mesh import enable_persistent_cache
enable_persistent_cache()
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
from gaussctrl_tpu.diffusion.sample import SDModels, denoise, invert

cfg = SDConfig.sd15()
models = SDModels.create(cfg, dtype=jnp.bfloat16)
params = jax.jit(models.init_params)(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
sched = DDIMSchedule.sd15()
s = cfg.sample_size
steps, refs = 20, 4
lat = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 4), jnp.bfloat16)
ctx = jnp.zeros((b, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
disp = jnp.zeros((b, s * 8, s * 8, 3), jnp.bfloat16)

if mode == "inv":
    fn = jax.jit(lambda p, l, c, d: invert(models, p, sched, l, c, d, steps))
else:
    fn = jax.jit(lambda p, l, c, d: denoise(
        models, p, sched, l, c, c, d, guidance_scale=5.0, num_steps=steps,
        unet_processor=CrossViewAttnProcessor(refs, 0.6, 2),
        controlnet_processor=CrossViewAttnProcessor(refs, 0.0, 2)))

import numpy as np
def sync(o):
    return float(np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0]))

try:
    flops = 0.0
    try:
        ca = fn.lower(params, lat, ctx, disp).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    sync(fn(params, lat, ctx, disp))   # compile + warm
    t0 = time.perf_counter()
    n = 2
    for _ in range(n):
        sync(fn(params, lat, ctx, disp))
    dt = (time.perf_counter() - t0) / n
    mfu = steps * flops / dt / 197e12 if flops else None
    print(json.dumps({"ok": True, "t_scan_s": round(dt, 4),
                      "s_per_view": round(dt / b, 4),
                      "mfu": round(mfu, 4) if mfu else None}))
except Exception as e:
    print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"[:300]}))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the b=40 inversion variants")
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()
    results = {}
    for name, env, wargs in VARIANTS:
        if args.quick and not name.startswith("inv40"):
            continue
        if args.only and args.only not in name:
            continue
        e = dict(os.environ)
        e.update(env)
        r = subprocess.run([sys.executable, "-c", WORKER, *wargs],
                           env=e, capture_output=True, text=True,
                           timeout=2400)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"ok": False,
                             "error": (r.stderr or r.stdout)[-300:]}
        print(name, "->", json.dumps(results[name]), flush=True)
    print("\n== summary ==")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

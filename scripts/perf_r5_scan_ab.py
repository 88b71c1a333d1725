#!/usr/bin/env python3
"""Scan-level A/B for the fused cross-view kernel adoption (round 5).

The micro sweep (outputs/perf_r5/micro.json) picks per-level winners, but
per-call wins don't always compose at the whole-scan level (XLA fuses
across layers differently inside the 20-step `lax.scan`). This measures
the EXACT production edit scan (b=40 views CFG-doubled to 80, 20 DDIM
steps, UNet coeff 0.6 + ControlNet coeff 0.0 processors) under each
routing, in subprocesses so the env knob is picked up cleanly:

    python scripts/perf_r5_scan_ab.py

Writes outputs/perf_r5/scan_ab.json. The adoption rule: the default
routing (_XVIEW_FUSED_DEFAULT) ships only if it beats composed here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r'''
import json, time
import jax, jax.numpy as jnp
from gaussctrl_tpu.core.mesh import enable_persistent_cache
enable_persistent_cache()
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
from gaussctrl_tpu.diffusion.sample import SDModels, denoise

cfg = SDConfig.sd15()
models = SDModels.create(cfg, dtype=jnp.bfloat16)
params = jax.jit(models.init_params)(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
sched = DDIMSchedule.sd15()
s = cfg.sample_size
steps, refs, views = 20, 4, 40

lat = jax.random.normal(jax.random.PRNGKey(1), (views, s, s, 4), jnp.bfloat16)
ctx = jnp.zeros((views, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
disp = jnp.zeros((views, s * 8, s * 8, 3), jnp.bfloat16)

edit = jax.jit(lambda p, l, cp, cn, d: denoise(
    models, p, sched, l, cp, cn, d, guidance_scale=5.0, num_steps=steps,
    unet_processor=CrossViewAttnProcessor(refs, 0.6, 2),
    controlnet_processor=CrossViewAttnProcessor(refs, 0.0, 2)))

import numpy as np
def sync(o):
    return float(np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0]))

sync(edit(params, lat, ctx, ctx, disp))
t0 = time.perf_counter()
sync(edit(params, lat, ctx, ctx, disp))
dt = time.perf_counter() - t0
import os
print(json.dumps({"ok": True, "t_edit40_scan_s": round(dt, 3),
                  "fused_levels": os.environ.get(
                      "GAUSSCTRL_XVIEW_FUSED_LEVELS", "<default>")}))
'''

VARIANTS = {
    # "" disables the fused path entirely -> r4-winner composed routing
    "composed": "",
    "fused_default": None,          # ship default (_XVIEW_FUSED_DEFAULT)
    "fused_4096_1024": "4096,1024",
    "fused_1024_256": "1024,256",   # isolates the 4096 adoption
}

OUT = "outputs/perf_r5/scan_ab.json"


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for name, lv in VARIANTS.items():
        if only and only not in name:
            continue
        if results.get(name, {}).get("ok"):
            print(name, "-> (cached)", json.dumps(results[name]), flush=True)
            continue
        env = dict(os.environ)
        if lv is not None:
            env["GAUSSCTRL_XVIEW_FUSED_LEVELS"] = lv
        try:
            r = subprocess.run([sys.executable, "-c", WORKER], env=env,
                               capture_output=True, text=True, timeout=1800)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results[name] = json.loads(line)
            except json.JSONDecodeError:
                results[name] = {"ok": False,
                                 "error": (r.stderr or r.stdout)[-300:]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "error": "timeout"}
        print(name, "->", json.dumps(results[name]), flush=True)
        json.dump(results, open(OUT, "w"), indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Round-5 attention microbench at the exact edit-lane shapes.

Closes VERDICT r4 weak #5 / next #3: the r4 sweep committed block_q
variants and the grouped/segsum ref candidates but never ran them. This
sweep measures, per SD token level at the production CFG-doubled edit
batch (g=2 x f=40 views, heads=8):

  self branch   einsum (champion), full_t block_q sweep
  ref branch    bcast_einsum (champion), grouped_einsum, segsum_einsum
  xview         the WHOLE cross-view blend (0.6 self + 0.4 mean-of-4-ref,
                utils.py:117 semantics): "composed" = production routing
                (einsum self + bcast_einsum ref) vs the new fused Pallas
                kernel (ops/flash_attention.py cross_view_attention — all
                1+r panels per q-block, q fetched once) at several block_q
  xview0        the ControlNet lane (self_coeff=0, ref-only blend)

Per-step call counts (SD-1.5 UNet + ControlNet, both run per edit step):
level 4096 x7 (5 UNet + 2 CN), 1024 x7, 256 x7, 64 x2. The r4 baseline
step is 1.86 s; ref@4096 alone is 1.02 s of it (outputs/perf_r4/micro.json).

    python scripts/perf_r5_micro.py [--only substr] [--redo]

Each variant runs in its own subprocess (clean OOM isolation); results
accumulate in outputs/perf_r5/micro.json (the file of record).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEVELS = [  # (t, c) — SD-1.5 self-attn token ladder, heads=8
    (4096, 320),
    (1024, 640),
    (256, 1280),
    (64, 1280),
]
SELF_IMPLS = ["einsum", "full_t_bq512", "full_t_bq1024"]
REF_IMPLS = ["bcast_einsum", "grouped_einsum", "segsum_einsum"]
XVIEW_IMPLS = ["composed", "fused", "fused_bq512", "fused_bq1024",
               "fused_bq768", "fused_bf16exp_bq512"]
XVIEW0_IMPLS = ["composed", "fused", "fused_bq512"]

WORKER = r'''
import json, sys, time
import jax, jax.numpy as jnp
branch, impl, t, c = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
from gaussctrl_tpu.core.mesh import enable_persistent_cache
enable_persistent_cache()
from gaussctrl_tpu.diffusion.nn import attention_einsum
from gaussctrl_tpu.ops.flash_attention import (cross_view_attention,
                                               flash_attention)
import functools

heads, g, f, r = 8, 2, 40, 4
b = g * f
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (b, t, c), jnp.bfloat16)

block_q = 256
if "_bq" in impl:
    impl, bq_s = impl.rsplit("_bq", 1)
    block_q = int(bq_s)
exp_bf16 = "_bf16exp" in impl
impl = impl.replace("_bf16exp", "")


def bcast_ref(q, kg, vg):
    acc = 0.0
    for i in range(r):
        kr = jnp.broadcast_to(kg[:, i:i+1], (g, f, t, c)).reshape(b, t, c)
        vr = jnp.broadcast_to(vg[:, i:i+1], (g, f, t, c)).reshape(b, t, c)
        acc = acc + attention_einsum(q, kr, vr, heads)
    return acc


if branch == "self":
    k = v = q
    if impl == "einsum":
        fn = lambda q, k, v: attention_einsum(q, k, v, heads)
    else:
        fn = lambda q, k, v: flash_attention(q, k, v, heads, kernel=impl,
                                             block_q=block_q)
    args = (q, k, v)
    def call(q, k, v):
        return fn(q, k, v), k, v
elif branch == "ref":
    kg = jax.random.normal(key, (g, f, t, c), jnp.bfloat16)
    vg = kg
    if impl == "bcast_einsum":
        fn = bcast_ref
    elif impl == "grouped_einsum":
        # fold views into the query length; per-ref attention_einsum on the
        # UN-broadcast [g, t, c] ref K/V — b=g=2, tq=f*t, tk=t
        def fn(q, kg, vg):
            qg = q.reshape(g, f * t, c)
            acc = 0.0
            for i in range(r):
                acc = acc + attention_einsum(qg, kg[:, i], vg[:, i], heads)
            return acc.reshape(b, t, c)
    elif impl == "segsum_einsum":
        # ONE QK^T against the 4-ref concatenated K, per-ref segmented
        # softmax, ONE PV — sum_i attn_i with 4x fewer, larger matmuls
        d = c // heads
        def fn(q, kg, vg):
            qg = q.reshape(g, f * t, heads, d)
            kc = kg[:, :r].reshape(g, r * t, heads, d)
            vc = vg[:, :r].reshape(g, r * t, heads, d)
            s = jnp.einsum("gqhd,gkhd->ghqk", qg, kc,
                           preferred_element_type=jnp.float32)
            s = s * (1.0 / (d ** 0.5))
            s = s.reshape(g, heads, f * t, r, t)
            w = jax.nn.softmax(s.astype(jnp.float32), -1).astype(vc.dtype)
            w = w.reshape(g, heads, f * t, r * t)
            o = jnp.einsum("ghqk,gkhd->gqhd", w, vc,
                           preferred_element_type=jnp.float32)
            return o.reshape(b, t, c).astype(q.dtype)
    args = (q, kg, vg)
    def call(q, kg, vg):
        return fn(q, kg, vg), kg, vg
elif branch in ("xview", "xview0"):
    # the WHOLE per-layer cross-view output, production semantics
    coeff = 0.6 if branch == "xview" else 0.0
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, c), jnp.bfloat16)
    if impl == "composed":
        def fn(q, k, v):
            kg = k.reshape(g, f, t, c)
            vg = v.reshape(g, f, t, c)
            out = coeff * attention_einsum(q, k, v, heads) if coeff else 0.0
            return out + (1 - coeff) * bcast_ref(q, kg, vg) / r
    else:
        fn = lambda q, k, v: cross_view_attention(
            q, k, v, heads, num_refs=r, self_coeff=coeff, cfg_groups=g,
            block_q=block_q, exp_bf16=exp_bf16)
    args = (q, k, v)
    def call(q, k, v):
        return fn(q, k, v), k, v

N = 10
@jax.jit
def loop(q, *rest):
    def body(carry, _):
        out = call(carry, *rest)
        return out[0].astype(carry.dtype), 0.
    o, _ = jax.lax.scan(body, q, None, length=N)
    return o

import numpy as np
def sync(o):
    return float(np.asarray(o.ravel()[0]))

try:
    sync(loop(*args))
    t0 = time.perf_counter()
    sync(loop(*args))
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"ok": True, "t_call_ms": round(dt * 1e3, 3)}))
except Exception as e:
    print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}))
'''

RESULTS_PATH = "outputs/perf_r5/micro.json"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument("--redo", action="store_true")
    cli = ap.parse_args()
    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    results = {}
    if os.path.exists(RESULTS_PATH):
        results = json.load(open(RESULTS_PATH))
    jobs = []
    for t, c in LEVELS:
        for impl in SELF_IMPLS:
            jobs.append(("self", impl, t, c))
        for impl in REF_IMPLS:
            jobs.append(("ref", impl, t, c))
        for impl in XVIEW_IMPLS:
            jobs.append(("xview", impl, t, c))
        for impl in XVIEW0_IMPLS:
            jobs.append(("xview0", impl, t, c))
    for branch, impl, t, c in jobs:
        name = f"{branch}_{t}_{impl}"
        if cli.only and cli.only not in name:
            continue
        if not cli.redo and results.get(name, {}).get("ok"):
            print(name, "-> (cached)", json.dumps(results[name]), flush=True)
            continue
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, branch, impl, str(t), str(c)],
                env=dict(os.environ), capture_output=True, text=True,
                timeout=900)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results[name] = json.loads(line)
            except json.JSONDecodeError:
                results[name] = {"ok": False,
                                 "error": (r.stderr or r.stdout)[-200:]}
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "error": "timeout (tunnel hang?)"}
        print(name, "->", json.dumps(results[name]), flush=True)
        json.dump(results, open(RESULTS_PATH, "w"), indent=1)

    counts = {4096: 7, 1024: 7, 256: 7, 64: 2}
    print("\n== whole-layer (xview) best per level, s/step ==")
    total = 0.0
    for t, c in LEVELS:
        for branch, impls in (("xview", XVIEW_IMPLS), ("xview0",
                                                       XVIEW0_IMPLS)):
            ok = {i: results[f"{branch}_{t}_{i}"]["t_call_ms"]
                  for i in impls
                  if results.get(f"{branch}_{t}_{i}", {}).get("ok")}
            if not ok:
                continue
            best = min(ok, key=ok.get)
            print(f"{branch}@{t}: best={best} {ok[best]:.2f} ms   all={ok}")
            if branch == "xview":
                total += counts[t] * ok[best] / 1e3
    print(f"xview-best attention total: {total:.3f} s/step "
          f"(r4 composed baseline ~1.64 s/step of the 1.86 s step)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-call attention microbench at the EXACT edit-lane shapes (round 4).

The edit scan (40 views CFG-doubled, b=80) spends its time in the
cross-view processor's two branches at four token levels. The r4 iso A/B
(outputs/perf_r4/ab_iso.txt) flipped branches with GAUSSCTRL_FLASH=1, which
also forces flash onto the 77-token TEXT cross-attention — contaminating
the self-branch reading. This bench times each (branch, level, impl) in
isolation so the routing table can be built from uncontaminated numbers.

    python scripts/perf_r4_micro.py | tee outputs/perf_r4/micro.txt

Per-step call counts (SD-1.5 UNet 16 self-attn + ControlNet 7, both run
per edit step): level 4096 x7, 1024 x7, 256 x7, 64 x2 — so
   attention_s_per_step = sum(count * t_call)
and the residual vs the measured 1.86 s/step is the non-attention fat.

Each variant runs in its own subprocess (clean OOM isolation).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# (name, level args, impl)    b=80 = 2 CFG groups x 40 views, 4 refs
LEVELS = [  # (t, c) — SD-1.5 self-attn token ladder, heads=8
    (4096, 320),
    (1024, 640),
    (256, 1280),
    (64, 1280),
]
SELF_IMPLS = ["einsum", "full_t", "full", "stream", "einsum_bf16sm",
              # r4c: block_q sweep of the transposed schedule — per-grid-step
              # softmax/scheduling overhead is the suspected gap between
              # full_t's 49.8 ms and einsum's 39.4 ms at 4096/d40
              "full_t_bq512", "full_t_bq1024"]
REF_IMPLS = ["bcast_einsum", "grouped_full_t", "grouped_full",
             # r4b candidates for the 4096 monster (145.6 ms/call):
             # grouped_einsum  — attention_einsum(qg[g,f*t,c], kg[:,i]) per
             #                   ref, no broadcast materialization
             # segsum_einsum   — ONE QK^T against the concatenated 4-ref
             #                   K [g, r*t, c] + per-ref segmented softmax
             #                   + one PV matmul (4x fewer, larger matmuls)
             # bcast_bf16sm    — bcast einsum with bf16 softmax (VPU+HBM
             #                   relief on the 10.7G-element score tensor)
             "grouped_einsum", "segsum_einsum", "bcast_bf16sm",
             "grouped_full_t_bq512", "grouped_full_t_bq1024",
             "grouped_full_bq512"]
CROSS_IMPLS = ["einsum"]  # tk=77 text attention (sanity scale only)

WORKER = r'''
import json, sys, time
import jax, jax.numpy as jnp
branch, impl, t, c = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
from gaussctrl_tpu.core.mesh import enable_persistent_cache
enable_persistent_cache()
from gaussctrl_tpu.diffusion.nn import attention_einsum
from gaussctrl_tpu.ops.flash_attention import flash_attention
from gaussctrl_tpu.diffusion.processors import _grouped_ref_attention
import functools

heads, g, f, r = 8, 2, 40, 4
b = g * f
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (b, t, c), jnp.bfloat16)

# "<kern>_bqN" suffix -> block_q override for the flash kernels
block_q = 256
if "_bq" in impl:
    impl, bq_s = impl.rsplit("_bq", 1)
    block_q = int(bq_s)

import math
def einsum_attn(q, k, v, sm_dtype):
    # local mirror of nn.attention_einsum with a softmax-dtype knob
    bq, tq, cc = q.shape
    d = cc // heads
    qh = q.reshape(bq, tq, heads, d)
    kh = k.reshape(k.shape[0], k.shape[1], heads, d)
    vh = v.reshape(*kh.shape)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=sm_dtype) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(s.astype(sm_dtype), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(bq, tq, cc).astype(q.dtype)

if branch == "self":
    k = v = q
    if impl == "einsum":
        fn = lambda q, k, v: attention_einsum(q, k, v, heads)
    elif impl == "einsum_bf16sm":
        fn = lambda q, k, v: einsum_attn(q, k, v, jnp.bfloat16)
    else:
        fn = lambda q, k, v: flash_attention(q, k, v, heads, kernel=impl,
                                             block_q=block_q)
    args = (q, k, v)
    def call(q, k, v):
        return fn(q, k, v), k, v
elif branch == "ref":
    # FULL [g, f, t, c] K/V as in production — _grouped_ref_attention infers
    # the views-per-group f from kg.shape[1] (only the first r are attended)
    kg = jax.random.normal(key, (g, f, t, c), jnp.bfloat16)
    vg = kg
    if impl in ("bcast_einsum", "bcast_bf16sm"):
        sm = jnp.float32 if impl == "bcast_einsum" else jnp.bfloat16
        def fn(q, kg, vg):
            acc = 0.0
            for i in range(r):
                kr = jnp.broadcast_to(kg[:, i:i+1], (g, f, t, c)).reshape(b, t, c)
                vr = jnp.broadcast_to(vg[:, i:i+1], (g, f, t, c)).reshape(b, t, c)
                acc = acc + einsum_attn(q, kr, vr, sm)
            return acc
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
        # softmax, ONE PV — Σ_i attn_i with 4x fewer, larger matmuls
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
    else:
        kern = impl.replace("grouped_", "")
        ff = functools.partial(flash_attention, kernel=kern,
                               block_q=block_q)
        fn = lambda q, kg, vg: _grouped_ref_attention(q, kg, vg, r, heads,
                                                      flash_fn=ff)
    args = (q, kg, vg)
    def call(q, kg, vg):
        return fn(q, kg, vg), kg, vg
else:  # text cross-attention, tk=77
    k = jax.random.normal(key, (b, 77, c), jnp.bfloat16)
    fn = lambda q, k, v: attention_einsum(q, k, v, heads)
    args = (q, k, k)
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


RESULTS_PATH = "outputs/perf_r4/micro.json"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument("--redo", action="store_true",
                    help="re-measure even if present in micro.json")
    cli = ap.parse_args()
    results = {}
    if os.path.exists(RESULTS_PATH):
        results = json.load(open(RESULTS_PATH))
    jobs = []
    for t, c in LEVELS:
        for impl in SELF_IMPLS:
            jobs.append(("self", impl, t, c))
        for impl in REF_IMPLS:
            jobs.append(("ref", impl, t, c))
        for impl in CROSS_IMPLS:
            jobs.append(("cross", impl, t, c))
    for branch, impl, t, c in jobs:
        name = f"{branch}_{t}_{impl}"
        if cli.only and cli.only not in name:
            continue
        if not cli.redo and results.get(name, {}).get("ok"):
            print(name, "-> (cached)", json.dumps(results[name]), flush=True)
            continue
        try:
            # the remote-compile tunnel occasionally hangs (r4 run log);
            # a timeout marks the variant and the sweep moves on — rerun
            # the script to retry (cached entries are skipped)
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
    print("\n== best per (branch, level), attention s/step ==")
    total = 0.0
    for t, c in LEVELS:
        for branch, impls in (("self", SELF_IMPLS), ("ref", REF_IMPLS),
                              ("cross", CROSS_IMPLS)):
            ok = {i: results[f"{branch}_{t}_{i}"]["t_call_ms"]
                  for i in impls
                  if results.get(f"{branch}_{t}_{i}", {}).get("ok")}
            if not ok:
                continue
            best = min(ok, key=ok.get)
            contrib = counts[t] * ok[best] / 1e3
            total += contrib
            print(f"{branch}@{t}: best={best} {ok[best]:.2f} ms "
                  f"x{counts[t]} = {contrib*1e3:.0f} ms/step   all={ok}")
    print(f"best-routing attention total: {total:.3f} s/step "
          f"(measured edit step ~1.86 s)")


if __name__ == "__main__":
    main()

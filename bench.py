"""Benchmark: views edited/sec at 512x512 (the BASELINE.md north star).

Measures, on the real chip with the full SD-1.5 architecture (bf16, random
weights — weights don't change FLOPs), the production 40-view bear edit
exactly as the pipeline runs it — whole 20-step `lax.scan`s, not isolated
UNet evals (XLA schedules the fused scan ~3x faster per step than a
single-eval jit). Two modes:

  production (chunk_size=0, the sharded single-batch design): all 40 views
    edited in ONE CFG-doubled cross-view scan ([4 refs | 36 others], b=40),
    inversion in ONE b=40 scan under the transposed `full_t` flash schedule
    (r4 A/B, outputs/perf_r4/ab.txt: 8.99 s vs 17.9 s for the r3 2x b=20
    einsum split — the einsum b=40 lane OOMs on its 21.5 GB f32 scores).
    Output-identical to reference chunking (chunked == batched pinned by
    tests/test_pipeline.py).  views/s = 40 / (t_inv40 + t_edit40).

  reference mode (chunk_size=3, gc_pipeline.py:190): reported in detail as
    views_per_sec_chunk3 for like-for-like comparison.

Routing note (r3 .scratch/ab_attention_results.json; r4 outputs/perf_r4/):
routing is split by LANE — the CFG-doubled edit scan prefers einsum on both
the self and cross-view-ref branches (iso A/B: flash_t costs +4.5..7.8
s/scan at b=80), while the no-CFG inversion runs 2.0x faster under the
transposed flash schedule (processors.FlashSelfAttnProcessor). Einsum chunk
scaling carries the edit lane: per-view cost falls monotonically to the
full 40-view batch (2.11 -> 0.93 s/view with hint hoisting).

vs_baseline compares against the A5000 reference estimated from public SD-1.5
throughput (≈5 it/s UNet+ControlNet batch1 fp16 512px, ≈0.75 it/s at batch
14): inversion 40x20 steps singly ≈ 160 s, edit 12 chunks x 20 steps ≈ 320 s
-> ≈ 0.083 views/s over 40 views. The reference repo itself publishes no
numbers (BASELINE.json "published": {}).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_VIEWS_PER_SEC = 0.083  # derived A5000 estimate, see module docstring


def _sync(out):
    """Force completion via a host fetch of a data-dependent scalar.
    jax.block_until_ready can return before execution finishes on the
    tunneled TPU backend (measured: chained 34 ms kernels reported as
    0.2 ms) — a device->host readback is the only reliable barrier."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def _timeit(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def _device_or_die(timeout_s: float = 180.0):
    """Fail FAST with a diagnostic JSON line if the TPU tunnel is down —
    jax.devices() hangs indefinitely in make_c_api_client when the axon
    terminal is unreachable (observed round 2), which would eat the whole
    driver timeout instead of reporting."""
    import threading
    out = {}

    def probe():
        out["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "metric": "views edited/sec at 512x512", "value": 0.0,
            "unit": "views/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU device init timed out "
                                f"after {timeout_s}s (tunnel down)"}}))
        raise SystemExit(1)
    return out["devices"]


def main():
    _device_or_die()
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
    steps, refs, views = 20, 4, 40

    def batch(n):
        lat = jax.random.normal(jax.random.PRNGKey(1), (n, s, s, 4),
                                jnp.bfloat16)
        ctx = jnp.zeros((n, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
        disp = jnp.zeros((n, s * 8, s * 8, 3), jnp.bfloat16)
        return lat, ctx, disp

    def _flops(jitted, *args):
        """XLA's own FLOP count for the compiled scan (host-side analysis)."""
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001 - analysis is best-effort
            return 0.0

    PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16

    # Routing-drift guard (VERDICT r4 #5): the bench must measure the SAME
    # implementations the production lanes route to, and those must match
    # the recorded A/B winners (outputs/perf_r4/ab.txt: edit self = einsum
    # at 37.19 s/scan vs 48.06 q-blocked / 45.03 flash_t; inversion =
    # flash full_t at 8.99 s vs 17.9 einsum). If the default routing drifts
    # off the winner, fail loudly instead of silently benching a loser.
    import os
    from gaussctrl_tpu.diffusion.processors import resolve_self_attn_impl
    edit_self_attn = resolve_self_attn_impl(s * s, 320 // 8)
    if "GAUSSCTRL_EDIT_SELF_ATTN" not in os.environ \
            and edit_self_attn != "einsum":
        raise SystemExit(
            f"edit-lane self-attention routed to {edit_self_attn!r}, but the "
            "recorded A/B winner is einsum (outputs/perf_r4/ab.txt) — "
            "routing drifted; fix resolve_self_attn_impl or re-record the A/B")

    # inversion: 20-step scan, no CFG, ONE b=40 shot on the transposed
    # flash schedule — the r4 production routing (module docstring).
    # Pallas is TPU-only: off-TPU (CI smoke) fall back to the einsum lane
    # so the bench still runs end to end.
    from gaussctrl_tpu.diffusion.processors import (_XVIEW_FUSED_DEFAULT,
                                                    FlashSelfAttnProcessor)
    on_tpu = jax.default_backend() == "tpu"
    inv_proc = FlashSelfAttnProcessor(kernel="full_t") if on_tpu else None
    inversion_attn = "flash_full_t" if on_tpu else "einsum (off-TPU fallback)"
    b_inv = views
    lat, ctx, disp = batch(b_inv)
    inv = jax.jit(lambda p, l, c, d: invert(
        models, p, sched, l, c, d, steps,
        unet_processor=inv_proc, controlnet_processor=inv_proc))
    t_inv = _timeit(inv, params, lat, ctx, disp)
    f_inv = _flops(inv, params, lat, ctx, disp)

    def make_edit(chunk):
        b = refs + chunk
        lat, ctx, disp = batch(b)
        edit = jax.jit(lambda p, l, cp, cn, d: denoise(
            models, p, sched, l, cp, cn, d, guidance_scale=5.0,
            num_steps=steps,
            unet_processor=CrossViewAttnProcessor(refs, 0.6, 2),
            controlnet_processor=CrossViewAttnProcessor(refs, 0.0, 2)))
        return edit, (params, lat, ctx, ctx, disp)

    # production mode: ONE CFG-doubled cross-view scan over all 40 views
    edit40, args40 = make_edit(views - refs)
    t_edit40 = _timeit(edit40, *args40)
    f_edit40 = _flops(edit40, *args40)
    # reference mode (chunk 3) for like-for-like comparison
    edit3, args3 = make_edit(3)
    t_edit3 = _timeit(edit3, *args3)

    views_per_sec = views / (t_inv + t_edit40)
    vps_chunk3 = 1.0 / (t_inv / b_inv + t_edit3 / 3)

    print(json.dumps({
        "metric": "views edited/sec at 512x512",
        "value": round(views_per_sec, 4),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / BASELINE_VIEWS_PER_SEC, 3),
        "detail": {
            "mode": "chunk0 single-batch (output-identical to reference "
                    "chunking; tests/test_pipeline.py)",
            "t_invert_scan_s": round(t_inv, 4),
            "inversion_batch": b_inv,
            "inversion_attn": inversion_attn,
            # per-lane routing record, asserted above against the A/B winner
            "edit_self_attn": edit_self_attn,
            "t_edit40_scan_s": round(t_edit40, 4),
            "edit_batch_cfg_doubled": 2 * views,
            "t_edit_chunk3_scan_s": round(t_edit3, 4),
            "views_per_sec_chunk3": round(vps_chunk3, 4),
            "ddim_steps": steps,
            # single-chip MFU from XLA's compiled-module FLOP counts
            # against the v5e bf16 peak (197 TFLOP/s). cost_analysis counts
            # a lax.scan body ONCE (verified: identical flops for 1- and
            # 4-step scans), so scale by the DDIM step count.
            "mfu_invert": round(steps * f_inv / t_inv / PEAK_BF16, 4)
                          if f_inv else None,
            "mfu_edit": round(steps * f_edit40 / t_edit40 / PEAK_BF16, 4)
                        if f_edit40 else None,
            "device": str(jax.devices()[0]),
            # attention-routing knobs, so A/B runs are self-describing
            "flash_env": __import__("os").environ.get("GAUSSCTRL_FLASH",
                                                      "auto"),
            "flash_max_tk": __import__("os").environ.get(
                "GAUSSCTRL_FLASH_MAX_TK", "2048"),
            # r5: token levels whose whole cross-view layer runs the fused
            # Pallas kernel (outputs/perf_r5/micro.json + scan_ab.json)
            "xview_fused_levels": os.environ.get(
                "GAUSSCTRL_XVIEW_FUSED_LEVELS", _XVIEW_FUSED_DEFAULT)
            if on_tpu else "(off-TPU: composed)",
        },
    }))


if __name__ == "__main__":
    main()

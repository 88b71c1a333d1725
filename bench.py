"""Benchmark: views edited/sec at 512x512 (the BASELINE.md north star).

Measures, on the real chip with the full SD-1.5 architecture (bf16, random
weights — weights don't change FLOPs), the two hot steps of the GaussCtrl
edit at the reference operating point (chunk_size 3, 4 refs, 20+20 DDIM
steps, CFG; BASELINE.md):

  t_inv  — one inversion UNet+ControlNet eval, batch = `render_batch` views
  t_edit — one CFG cross-view UNet+ControlNet eval, batch = 2*(4+3)

and derives  views/sec = 1 / (20*t_inv/B_inv + 20*t_edit/3).

vs_baseline compares against the A5000 reference estimated from public SD-1.5
benchmark rates (A5000 ≈ 5 it/s for UNet+ControlNet batch1 fp16 512px,
≈ 0.75 it/s at batch 14): inversion 40 views x 20 steps singly ≈ 160 s, edit
12 chunks x 20 steps ≈ 320 s -> ≈ 0.083 views/s. The reference repo itself
publishes no numbers (BASELINE.json "published": {}).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_VIEWS_PER_SEC = 0.083  # derived A5000 estimate, see module docstring


def _timeit(fn, *args, warmup=2, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from gaussctrl_tpu.core.mesh import enable_persistent_cache
    enable_persistent_cache()
    from gaussctrl_tpu.diffusion.config import SDConfig
    from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
    from gaussctrl_tpu.diffusion.sample import SDModels, eps_model

    cfg = SDConfig.sd15()
    models = SDModels.create(cfg, dtype=jnp.bfloat16)
    params = jax.jit(models.init_params)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    s = cfg.sample_size
    t = jnp.asarray(501, jnp.int32)

    def make(batch, unet_proc, cn_proc):
        lat = jnp.zeros((batch, s, s, 4), jnp.bfloat16)
        ctx = jnp.zeros((batch, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
        disp = jnp.zeros((batch, s * 8, s * 8, 3), jnp.bfloat16)
        fn = jax.jit(lambda p, l, c, d: eps_model(
            models, p, l, t, c, d, 1.0, unet_proc, cn_proc))
        return fn, (params, lat, ctx, disp)

    # inversion eval: batch of independent views, plain attention, no CFG
    b_inv = 8
    fn_inv, args_inv = make(b_inv, None, None)
    t_inv = _timeit(fn_inv, *args_inv)

    # edit eval: 4 refs + 3 chunk views, CFG-doubled batch, cross-view attn
    refs, chunk = 4, 3
    b_edit = 2 * (refs + chunk)
    fn_edit, args_edit = make(
        b_edit,
        CrossViewAttnProcessor(refs, 0.6, 2),
        CrossViewAttnProcessor(refs, 0.0, 2))
    t_edit = _timeit(fn_edit, *args_edit)

    steps = 20
    per_view = steps * t_inv / b_inv + steps * t_edit / chunk
    views_per_sec = 1.0 / per_view

    print(json.dumps({
        "metric": "views edited/sec at 512x512",
        "value": round(views_per_sec, 4),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / BASELINE_VIEWS_PER_SEC, 3),
        "detail": {
            "t_inversion_eval_s": round(t_inv, 4),
            "inversion_batch": b_inv,
            "t_edit_eval_s": round(t_edit, 4),
            "edit_batch": b_edit,
            "ddim_steps": steps,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

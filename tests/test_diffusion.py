"""Diffusion stack numerics (tiny configs, CPU). SURVEY.md §4 strategy:
unit-test what the reference gets for free from diffusers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.diffusion.clip import CLIPTextModel, HashTokenizer
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.ddim import (
    DDIMSchedule, ddim_inverse_step, ddim_step, timestep_pairs,
)
from gaussctrl_tpu.diffusion.nn import attention
from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
from gaussctrl_tpu.diffusion.sample import (
    SDModels, denoise, eps_model, invert, vae_decode, vae_encode,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = SDConfig.tiny()
    models = SDModels.create(cfg)
    params = models.init_params(jax.random.PRNGKey(0))
    return cfg, models, params


def _ctx(cfg, b, key=1):
    return jax.random.normal(
        jax.random.PRNGKey(key),
        (b, cfg.text.max_position_embeddings, cfg.unet.cross_attention_dim))


def test_unet_shapes(tiny):
    cfg, models, params = tiny
    s = cfg.sample_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, s, s, 4))
    t = jnp.array([10, 900])
    out = models.unet.apply({"params": params["unet"]}, x, t, _ctx(cfg, 2))
    assert out.shape == (2, s, s, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_zero_init_residuals(tiny):
    """Zero convs -> at init the ControlNet must not perturb the UNet."""
    cfg, models, params = tiny
    s = cfg.sample_size
    x = jax.random.normal(jax.random.PRNGKey(2), (1, s, s, 4))
    t = jnp.array([100])
    ctx = _ctx(cfg, 1)
    hint = jax.random.uniform(jax.random.PRNGKey(3), (1, s * 8, s * 8, 3))
    down, mid = models.controlnet.apply(
        {"params": params["controlnet"]}, x, t, ctx, hint)
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    base = models.unet.apply({"params": params["unet"]}, x, t, ctx)
    with_cn = models.unet.apply({"params": params["unet"]}, x, t, ctx, None,
                                down, mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn), atol=1e-6)


def test_controlnet_residual_count_matches_unet_skips(tiny):
    cfg, models, params = tiny
    n_blocks = len(cfg.unet.block_out_channels)
    expect = 1 + n_blocks * cfg.unet.layers_per_block + (n_blocks - 1)
    s = cfg.sample_size
    down, _ = models.controlnet.apply(
        {"params": params["controlnet"]},
        jnp.zeros((1, s, s, 4)), jnp.array([0]), _ctx(cfg, 1),
        jnp.zeros((1, s * 8, s * 8, 3)))
    assert len(down) == expect


def test_vae_roundtrip_shapes(tiny):
    cfg, models, params = tiny
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3))
    z = vae_encode(models, params, img)
    down = 2 ** (len(cfg.vae.block_out_channels) - 1)
    assert z.shape == (2, 32 // down, 32 // down, cfg.vae.latent_channels)
    out = vae_decode(models, params, z)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_clip_causal(tiny):
    cfg, models, params = tiny
    tok = HashTokenizer(cfg.text.vocab_size, cfg.text.max_position_embeddings)
    ids = np.stack([tok.encode("a photo of a bear"),
                    tok.encode("a photo of a panda")])
    out = models.text.apply({"params": params["text"]}, jnp.asarray(ids))
    assert out.shape == (2, cfg.text.max_position_embeddings, cfg.text.hidden_size)
    # causality: ids agree on first 5 positions -> outputs agree there
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out[1, :5]),
                               atol=1e-5)
    assert np.abs(np.asarray(out[0, 5]) - np.asarray(out[1, 5])).max() > 1e-4


def test_timestep_pairs_leading_spacing():
    t, tp = timestep_pairs(20)
    assert t.shape == (20,)
    assert int(t[0]) == 951 and int(t[-1]) == 1
    np.testing.assert_array_equal(np.asarray(t) - np.asarray(tp), 50)


def test_ddim_exact_roundtrip():
    """invert -> denoise reconstructs exactly when eps depends only on t."""
    sched = DDIMSchedule.sd15()
    ts, ts_prev = timestep_pairs(20)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))

    def eps_of_t(t):
        return jax.random.normal(jax.random.PRNGKey(17), (1, 8, 8, 4)) * (
            t.astype(jnp.float32) / 1000.0)

    x = x0
    for t, tp in zip(ts[::-1], ts_prev[::-1]):       # invert (ascending)
        x = ddim_inverse_step(sched, x, eps_of_t(t), t, tp)
    for t, tp in zip(ts, ts_prev):                   # denoise (descending)
        x = ddim_step(sched, x, eps_of_t(t), t, tp)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_crossview_processor_matches_oracle():
    """Processor == c*self + (1-c)*mean_r attn(q, kv_ref[r]) computed naively."""
    key = jax.random.PRNGKey(5)
    g, f, t, c, heads, r = 2, 5, 6, 8, 2, 2
    b = g * f
    q, k, v = jax.random.normal(key, (3, b, t, c))
    proc = CrossViewAttnProcessor(num_refs=r, self_attn_coeff=0.6, cfg_groups=g)
    out = proc(q, k, v, heads)

    oracle = 0.6 * attention(q, k, v, heads)
    kg = k.reshape(g, f, t, c)
    vg = v.reshape(g, f, t, c)
    acc = 0.0
    for i in range(r):
        kr = jnp.repeat(kg[:, i:i + 1], f, axis=1).reshape(b, t, c)
        vr = jnp.repeat(vg[:, i:i + 1], f, axis=1).reshape(b, t, c)
        acc = acc + attention(q, kr, vr, heads)
    oracle = oracle + 0.4 * acc / r
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=1e-5)


def test_crossview_pure_ref_ignores_own_kv():
    """self_attn_coeff=0 (ControlNet mode): non-ref K/V must not matter."""
    key = jax.random.PRNGKey(6)
    b, t, c = 4, 5, 8
    q, k, v = jax.random.normal(key, (3, b, t, c))
    proc = CrossViewAttnProcessor(num_refs=1, self_attn_coeff=0.0, cfg_groups=1)
    out1 = proc(q, k, v, 2)
    k2 = k.at[2].set(jax.random.normal(jax.random.PRNGKey(7), (t, c)))
    out2 = proc(q, k2, v, 2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_grouped_ref_attention_matches_einsum():
    """The TPU grouped-flash ref branch (view axis folded into query length,
    one flash call per ref) must equal the broadcast-einsum reference —
    driven on CPU via the kernel's interpret mode."""
    import functools

    from gaussctrl_tpu.diffusion.nn import attention_einsum
    from gaussctrl_tpu.diffusion.processors import _grouped_ref_attention
    from gaussctrl_tpu.ops.flash_attention import flash_attention

    g, f, t, c, heads, r = 2, 3, 64, 32, 2, 2
    b = g * f
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, c))
    k = jax.random.normal(ks[1], (b, t, c))
    v = jax.random.normal(ks[2], (b, t, c))
    kg = k.reshape(g, f, t, c)
    vg = v.reshape(g, f, t, c)
    got = _grouped_ref_attention(
        q, kg, vg, r, heads,
        flash_fn=functools.partial(flash_attention, interpret=True))
    ref = 0.0
    for i in range(r):
        kr = jnp.broadcast_to(kg[:, i:i + 1], (g, f, t, c)).reshape(b, t, c)
        vr = jnp.broadcast_to(vg[:, i:i + 1], (g, f, t, c)).reshape(b, t, c)
        ref = ref + attention_einsum(q, kr, vr, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ref_attn_override_forces_einsum_branch(monkeypatch):
    """GAUSSCTRL_REF_ATTN=einsum pins the processor's ref branch to the
    broadcast-einsum path even when GAUSSCTRL_FLASH=1 would force the gate
    true — the A/B isolation knob (scripts/perf_r4_ab.py) must override the
    global force switch. self_attn_coeff=0 keeps the self branch (which
    would route to the TPU-only pallas kernel under FLASH=1) out of play."""
    monkeypatch.setenv("GAUSSCTRL_FLASH", "1")
    monkeypatch.setenv("GAUSSCTRL_REF_ATTN", "einsum")
    key = jax.random.PRNGKey(11)
    g, f, t, c, heads, r = 2, 3, 6, 8, 2, 2
    b = g * f
    q, k, v = jax.random.normal(key, (3, b, t, c))
    proc = CrossViewAttnProcessor(num_refs=r, self_attn_coeff=0.0,
                                  cfg_groups=g)
    out = proc(q, k, v, heads)
    from gaussctrl_tpu.diffusion.nn import attention_einsum
    kg = k.reshape(g, f, t, c)
    vg = v.reshape(g, f, t, c)
    acc = 0.0
    for i in range(r):
        kr = jnp.repeat(kg[:, i:i + 1], f, axis=1).reshape(b, t, c)
        vr = jnp.repeat(vg[:, i:i + 1], f, axis=1).reshape(b, t, c)
        acc = acc + attention_einsum(q, kr, vr, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(acc / r),
                               atol=1e-5)


def test_edit_self_attn_routing_default():
    """VERDICT r4 #5 guard: under the default env the edit lane's self
    branch must resolve to plain einsum at the 4096-token CFG-doubled level
    (the recorded A/B winner, outputs/perf_r4/ab.txt: 37.19 s/scan einsum vs
    48.06 q-blocked vs 45.03 flash_t) — and the auto policy must never pick
    the q-blocked budget fallback at any SD level. bench.py asserts the same
    at runtime; this pins it in CI."""
    import os

    from gaussctrl_tpu.diffusion.processors import resolve_self_attn_impl
    assert os.environ.get("GAUSSCTRL_EDIT_SELF_ATTN") is None
    assert resolve_self_attn_impl(4096, 40) == "einsum"
    for t, d in [(4096, 40), (1024, 80), (256, 160), (64, 160)]:
        assert resolve_self_attn_impl(t, d) in ("einsum", "flash")


def test_edit_self_attn_override_and_qblocked_equivalence(monkeypatch):
    """GAUSSCTRL_EDIT_SELF_ATTN is the A/B knob; qblocked must be
    bit-comparable to einsum (it is exact attention, just memory-bounded)."""
    from gaussctrl_tpu.diffusion.processors import resolve_self_attn_impl
    monkeypatch.setenv("GAUSSCTRL_EDIT_SELF_ATTN", "qblocked")
    assert resolve_self_attn_impl(4096, 40) == "qblocked"

    key = jax.random.PRNGKey(21)
    g, f, t, c, heads, r = 2, 3, 6, 8, 2, 2
    b = g * f
    q, k, v = jax.random.normal(key, (3, b, t, c))
    out_qb = CrossViewAttnProcessor(r, 0.6, g)(q, k, v, heads)
    monkeypatch.setenv("GAUSSCTRL_EDIT_SELF_ATTN", "einsum")
    out_es = CrossViewAttnProcessor(r, 0.6, g)(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out_qb), np.asarray(out_es),
                               atol=1e-6)


def test_easyinv_blend_only_at_high_t(tiny):
    """rho=0 is the exact reference path; rho>0 changes only the high-noise
    iterates (t >= easyinv_t_min), keeping shapes finite."""
    cfg, models, params = tiny
    sched = DDIMSchedule.sd15()
    s = cfg.sample_size
    lat = jax.random.normal(jax.random.PRNGKey(3), (2, s, s, 4)) * 0.1
    disp = jax.random.uniform(jax.random.PRNGKey(4), (2, s * 8, s * 8, 3))
    ctx = _ctx(cfg, 2)
    base = invert(models, params, sched, lat, ctx, disp, num_steps=4)
    same = invert(models, params, sched, lat, ctx, disp, num_steps=4,
                  easyinv_rho=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    blended = invert(models, params, sched, lat, ctx, disp, num_steps=4,
                     easyinv_rho=0.85, easyinv_t_min=400)
    assert np.isfinite(np.asarray(blended)).all()
    assert np.abs(np.asarray(blended) - np.asarray(base)).max() > 0
    # threshold above every timestep -> blend never fires -> exact match
    off = invert(models, params, sched, lat, ctx, disp, num_steps=4,
                 easyinv_rho=0.85, easyinv_t_min=10_000)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(base))


def test_invert_denoise_pipeline_smoke(tiny):
    """End-to-end tiny: invert 3 views, denoise with cross-view attention."""
    cfg, models, params = tiny
    sched = DDIMSchedule.sd15()
    s = cfg.sample_size
    nviews, nrefs = 2, 1
    b = nrefs + nviews
    lat = jax.random.normal(jax.random.PRNGKey(8), (b, s, s, 4)) * 0.1
    disp = jax.random.uniform(jax.random.PRNGKey(9), (b, s * 8, s * 8, 3))
    ctx = _ctx(cfg, b)
    zT = invert(models, params, sched, lat, ctx, disp, num_steps=3)
    assert zT.shape == lat.shape and np.isfinite(np.asarray(zT)).all()
    out = denoise(
        models, params, sched, zT, ctx, _ctx(cfg, b, key=2), disp,
        guidance_scale=5.0, num_steps=3,
        unet_processor=CrossViewAttnProcessor(nrefs, 0.6, cfg_groups=2),
        controlnet_processor=CrossViewAttnProcessor(nrefs, 0.0, cfg_groups=2))
    assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()


def test_invert_flash_processor_matches_default(tiny):
    """The production inversion routing (FlashSelfAttnProcessor full_t,
    outputs/perf_r4/ab.txt) must be numerically faithful to the default
    einsum path — interpret mode drives the Pallas schedule on CPU."""
    from gaussctrl_tpu.diffusion.processors import FlashSelfAttnProcessor
    cfg, models, params = tiny
    sched = DDIMSchedule.sd15()
    s = cfg.sample_size
    lat = jax.random.normal(jax.random.PRNGKey(18), (2, s, s, 4)) * 0.1
    disp = jax.random.uniform(jax.random.PRNGKey(19), (2, s * 8, s * 8, 3))
    ctx = _ctx(cfg, 2)
    base = invert(models, params, sched, lat, ctx, disp, num_steps=2)
    proc = FlashSelfAttnProcessor(kernel="full_t", interpret=True)
    flash = invert(models, params, sched, lat, ctx, disp, num_steps=2,
                   unet_processor=proc, controlnet_processor=proc)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


def test_nano_config_production_token_ladder():
    """SDConfig.nano() must keep sd15's TOPOLOGY (the attention token ladder
    4096/1024/256/64 at 64x64 latents) — it is the dryrun_multichip stage
    that certifies sharding at production attention geometry, and must not
    drift to a shape that no longer exercises the 4096-token routing split."""
    from gaussctrl_tpu.diffusion.config import SDConfig

    ncfg = SDConfig.nano()
    s = ncfg.sample_size
    assert s == 64  # 512px images -> 64x64 latents, as in production
    sd15 = SDConfig.sd15()
    assert ncfg.unet.down_block_attn == sd15.unet.down_block_attn
    assert len(ncfg.unet.block_out_channels) == \
        len(sd15.unet.block_out_channels)
    # token counts at each attention level (stride doubles per level)
    ladder = [(s // (2 ** i)) ** 2
              for i, a in enumerate(ncfg.unet.down_block_attn) if a]
    assert ladder == [4096, 1024, 256]

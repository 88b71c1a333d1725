"""Densification: static-capacity split/dup/cull semantics + short pretrain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.splat.densify import (
    DensifyConfig, init_state, refine, reset_opacities,
)
from gaussctrl_tpu.splat.scene import random_scene


def _padded(n=8, cap=20):
    scene = random_scene(jax.random.PRNGKey(0), n, sh_degree=1, extent=0.5)
    scene = scene.replace(opacities=jnp.full((n, 1), 2.0))  # clearly alive
    return init_state(scene, cap)


def test_init_state_pads_dead():
    scene, st = _padded()
    assert scene.num_gaussians == 20
    assert int(st.alive.sum()) == 8
    # dead slots must never rasterize: sigmoid(-15) ≈ 0
    assert float(jax.nn.sigmoid(scene.opacities[10, 0])) < 1e-5


def test_refine_split_grows_and_kills_parent():
    scene, st = _padded()
    # gaussian 0: huge accumulated gradient and large scale -> split
    st = st.replace(grad_accum=st.grad_accum.at[0].set(100.0),
                    grad_count=st.grad_count.at[0].set(1.0))
    scene = scene.replace(scales=scene.scales.at[0].set(jnp.log(0.5)))
    cfg = DensifyConfig(grad_thresh=1.0, densify_size_thresh=0.1,
                        cull_scale3d=10.0)
    scene2, st2, stats = refine(scene, st, jax.random.PRNGKey(1), cfg)
    assert int(stats["n_split"]) == 1
    assert int(stats["n_born"]) == 2
    assert not bool(st2.alive[0])            # parent dies
    assert int(st2.alive.sum()) == 8 - 1 + 2


def test_refine_duplicate_keeps_parent():
    scene, st = _padded()
    st = st.replace(grad_accum=st.grad_accum.at[3].set(100.0),
                    grad_count=st.grad_count.at[3].set(1.0))
    scene = scene.replace(scales=scene.scales.at[3].set(jnp.log(1e-4)))
    cfg = DensifyConfig(grad_thresh=1.0, densify_size_thresh=0.1,
                        cull_scale3d=10.0)
    alive_before = np.asarray(st.alive)          # refine() donates its inputs
    mean3_before = np.asarray(scene.means[3])
    scene2, st2, stats = refine(scene, st, jax.random.PRNGKey(1), cfg)
    assert int(stats["n_dup"]) == 1
    assert bool(st2.alive[3])
    assert int(st2.alive.sum()) == 9
    # duplicate is an exact copy at some free slot
    born = np.nonzero(np.asarray(st2.alive) & ~alive_before)[0]
    assert len(born) == 1
    np.testing.assert_allclose(np.asarray(scene2.means[born[0]]),
                               mean3_before, atol=1e-6)


def test_refine_culls_transparent():
    scene, st = _padded()
    scene = scene.replace(opacities=scene.opacities.at[5].set(-15.0))
    cfg = DensifyConfig(grad_thresh=1e9, cull_scale3d=10.0)
    _, st2, stats = refine(scene, st, jax.random.PRNGKey(1), cfg)
    assert int(stats["n_cull"]) == 1
    assert not bool(st2.alive[5])


def test_capacity_overflow_is_safe():
    scene, st = _padded(n=18, cap=20)  # only 2 free slots
    st = st.replace(grad_accum=st.grad_accum.at[:18].set(100.0),
                    grad_count=st.grad_count.at[:18].set(1.0))
    scene = scene.replace(scales=jnp.full_like(scene.scales, jnp.log(1e-4)))
    cfg = DensifyConfig(grad_thresh=1.0, densify_size_thresh=0.1,
                        cull_scale3d=10.0)
    scene2, st2, stats = refine(scene, st, jax.random.PRNGKey(1), cfg)
    assert int(st2.alive.sum()) == 20       # capped, no out-of-bounds writes
    assert int(stats["n_born"]) == 2


def test_full_buffer_split_keeps_parent():
    # zero free slots: a would-be split must be a no-op (parent alive,
    # un-shrunk) — not a childless kill (regression: saturated pre-training
    # buffers mass-killed the highest-gradient gaussians)
    scene, st = _padded(n=20, cap=20)
    st = st.replace(grad_accum=st.grad_accum.at[0].set(100.0),
                    grad_count=st.grad_count.at[0].set(1.0))
    scene = scene.replace(scales=scene.scales.at[0].set(jnp.log(0.5)))
    scale0_before = np.asarray(scene.scales[0])
    cfg = DensifyConfig(grad_thresh=1.0, densify_size_thresh=0.1,
                        cull_scale3d=10.0)
    scene2, st2, stats = refine(scene, st, jax.random.PRNGKey(1), cfg)
    assert int(stats["n_split"]) == 0
    assert bool(st2.alive[0])
    np.testing.assert_allclose(np.asarray(scene2.scales[0]), scale0_before)
    assert int(st2.alive.sum()) == 20


def test_grow_capacity_preserves_state():
    import optax
    from gaussctrl_tpu.splat.densify import grow_capacity
    from gaussctrl_tpu.splat.trainer import make_optimizer

    scene, st = _padded(n=8, cap=10)
    opt = make_optimizer()
    opt_state = opt.init(scene)
    # put nonzero Adam moments on row 3 to check they survive the re-pad
    opt_state = jax.tree_util.tree_map(
        lambda x: x.at[3].set(1.5) if hasattr(x, "ndim") and x.ndim >= 1
        and x.shape[0] == 10 else x, opt_state)
    scene2, st2, opt2 = grow_capacity(scene, st, opt_state, 24)
    assert scene2.num_gaussians == 24
    assert int(st2.alive.sum()) == 8 and not bool(st2.alive[15])
    np.testing.assert_allclose(np.asarray(scene2.means[:10]),
                               np.asarray(scene.means))
    # new slots are dead (never rasterize) and their moments are zero
    assert float(jax.nn.sigmoid(scene2.opacities[20, 0])) < 1e-5
    leaves = [x for x in jax.tree_util.tree_leaves(opt2)
              if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 24]
    assert leaves, "no per-gaussian optimizer rows found"
    for x in leaves:
        assert float(jnp.abs(x[3]).max()) == 1.5
        assert float(jnp.abs(x[12:]).max()) == 0.0
    # the grown buffers still train: one refine pass runs at the new cap
    scene3, st3, stats = refine(scene2, st2, jax.random.PRNGKey(0),
                                DensifyConfig(cull_scale3d=10.0))
    assert int(st3.alive.sum()) == 8


def test_reset_opacities_only_alive():
    scene, st = _padded()
    out = reset_opacities(scene, st.alive, value=0.01)
    alive_op = jax.nn.sigmoid(out.opacities[np.asarray(st.alive)])
    assert float(alive_op.max()) <= 0.0101
    assert float(out.opacities[10, 0]) == -15.0  # dead untouched


@pytest.mark.slow
def test_pretrain_short_loop_runs_and_improves():
    from gaussctrl_tpu.cameras.camera import make_cameras
    from gaussctrl_tpu.splat.densify import DensifyConfig
    from gaussctrl_tpu.splat.pretrain import PretrainConfig, pretrain
    from gaussctrl_tpu.splat.render import render_rgbd

    gt_scene = random_scene(jax.random.PRNGKey(5), 60, sh_degree=1, extent=0.4)
    c2ws = []
    for i in range(4):
        a = 2 * np.pi * i / 4
        pos = np.array([np.sin(a) * 2, 0.0, np.cos(a) * 2])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2ws.append(np.stack([right, up, -fwd, pos], axis=1))
    cams = make_cameras(np.asarray(c2ws, np.float32), 48, 48, 24, 24, 48, 48)
    gt = jnp.stack([render_rgbd(gt_scene, cams.c2w[i], cams.fx[i], cams.fy[i],
                                cams.cx[i], cams.cy[i], 48, 48, jnp.zeros(3),
                                1)["rgb"] for i in range(4)])
    pts = np.asarray(gt_scene.means[:30])
    cols = np.full((30, 3), 0.5, np.float32)
    cfg = PretrainConfig(
        num_steps=60, capacity_mult=2.0,
        densify=DensifyConfig(warmup=10, stop_at=50, refine_every=20,
                              reset_alpha_every=0, grad_thresh=1e-6),
        sh_degree_interval=10)
    scene, metrics = pretrain(cams, np.asarray(gt), pts, cols, cfg,
                              sh_degree=1)
    assert np.isfinite(float(metrics["loss"]))
    assert scene.num_gaussians > 0


def test_pretrain_resolution_ramp_and_fullres_pallas():
    """The resolution schedule must step 1/2^d -> ... -> full res, and the
    full-res phase must route through the Pallas blend (interpret mode on
    CPU) without diverging; isect_frac rides along in the train metrics."""
    from gaussctrl_tpu.cameras.camera import make_cameras
    from gaussctrl_tpu.splat.densify import DensifyConfig
    from gaussctrl_tpu.splat.pretrain import PretrainConfig, pretrain
    from gaussctrl_tpu.splat.render import render_rgbd

    gt_scene = random_scene(jax.random.PRNGKey(6), 40, sh_degree=1, extent=0.4)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 2.0
    cams = make_cameras(c2w[None], 32, 32, 16, 16, 32, 32)
    gt = render_rgbd(gt_scene, jnp.asarray(c2w), 32.0, 32.0, 16.0, 16.0,
                     32, 32, jnp.zeros(3), 1)["rgb"][None]
    pts = np.asarray(gt_scene.means[:20])
    cols = np.full((20, 3), 0.5, np.float32)
    logged = []
    cfg = PretrainConfig(
        num_steps=16, capacity_mult=1.5, eval_every=0,
        num_downscales=1, resolution_schedule=8, fullres_blend="pallas",
        densify=DensifyConfig(warmup=100, stop_at=100, reset_alpha_every=0),
        sh_degree_interval=8)
    scene, metrics = pretrain(cams, np.asarray(gt), pts, cols, cfg,
                              sh_degree=1,
                              log_fn=lambda s, m: logged.append((s, m)))
    assert np.isfinite(float(metrics["loss"]))
    assert "isect_frac" in metrics and float(metrics["isect_frac"]) <= 1.0
    assert scene.num_gaussians == 20            # densify disabled


@pytest.mark.slow
def test_pretrain_portrait_flat_background_no_divergence():
    """Face-scene regression (r4 post-mortem, outputs/face_r4/smoke.log):
    portrait intrinsics + large flat background made the default-precision
    SSIM variance terms cancel (computed SSIM hit 1.04 on a healthy render)
    and trip the divergence sentinel right after the first densify refine.
    With losses.ssim pinned to Precision.HIGHEST and floored variances
    (9e33787) this face-shaped short pretrain — tall aspect, flat-background
    GT, a refine + opacity-reset crossing — must run to completion."""
    from gaussctrl_tpu.cameras.camera import make_cameras
    from gaussctrl_tpu.splat.pretrain import PretrainConfig, pretrain
    from gaussctrl_tpu.splat.render import render_rgbd

    w, h = 32, 48                                    # portrait, face-style
    gt_scene = random_scene(jax.random.PRNGKey(9), 40, sh_degree=1,
                            extent=0.25)             # small subject,
    c2ws = []                                        # mostly background
    for i in range(3):
        a = 0.6 * (i - 1)
        pos = np.array([np.sin(a) * 2, 0.0, np.cos(a) * 2])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2ws.append(np.stack([right, up, -fwd, pos], axis=1))
    cams = make_cameras(np.asarray(c2ws, np.float32), 40, 40,
                        w / 2, h / 2, w, h)
    bg = jnp.zeros(3)
    gt = jnp.stack([render_rgbd(gt_scene, cams.c2w[i], cams.fx[i],
                                cams.fy[i], cams.cx[i], cams.cy[i],
                                w, h, bg, 1)["rgb"] for i in range(3)])
    # the pathological input class: >60% of pixels exactly-flat background
    assert float((gt.reshape(3, -1, 3).std(-1) < 1e-3).mean()) > 0.3
    pts = np.asarray(gt_scene.means[:20])
    cols = np.full((20, 3), 0.5, np.float32)
    cfg = PretrainConfig(
        num_steps=40, capacity_mult=2.0, eval_every=0,
        densify=DensifyConfig(warmup=5, stop_at=35, refine_every=10,
                              reset_alpha_every=30, grad_thresh=1e-6),
        sh_degree_interval=10)
    # must NOT raise FloatingPointError (the sentinel) on the refine steps
    scene, metrics = pretrain(cams, np.asarray(gt), pts, cols, cfg,
                              sh_degree=1)
    assert np.isfinite(float(metrics["loss"]))
    assert -1.0 <= float(metrics["ssim"]) <= 1.0

"""Re-optimization gate (SURVEY.md §7.2 step 3): a perturbed scene trains back."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.cameras.camera import make_cameras
from gaussctrl_tpu.splat.losses import splat_loss, ssim
from gaussctrl_tpu.splat.rasterize import RasterConfig
from gaussctrl_tpu.splat.render import render_rgbd
from gaussctrl_tpu.splat.scene import random_scene
from gaussctrl_tpu.splat.trainer import TrainConfig, reoptimize


def _orbit_cameras(n, radius=4.0, W=64, H=64, f=70.0):
    c2ws = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.array([radius * np.sin(th), 0.0, radius * np.cos(th)])
        fwd = -pos / np.linalg.norm(pos)          # look at origin
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        # OpenGL c2w: x right, y up, z backward
        c2w = np.stack([right, up, -fwd], axis=1)
        c2ws.append(np.concatenate([c2w, pos[:, None]], axis=1))
    return make_cameras(np.stack(c2ws).astype(np.float32), f, f, W / 2, H / 2, W, H)


def test_ssim_identical_is_one(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999


def test_ssim_convs_pin_highest_precision(rng):
    """Regression for the r4 face-scene 'divergence' (outputs/face_r5/):
    on TPU, f32 convs run one bf16 pass at DEFAULT precision and SSIM's
    E[x²]−μ² variances cancel catastrophically on flat windows — the face
    step-1000 state produced per-pixel SSIM in [-1255, +662] and a mean of
    1.0417, plus garbage gradients on ~5% of pixels. The conv precision
    must stay pinned to HIGHEST (the CPU test lane computes f32 either
    way, so pin the jaxpr, not the value)."""
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    jaxpr = str(jax.make_jaxpr(ssim)(img, img))
    n_hi = jaxpr.count("precision=(Precision.HIGHEST")
    assert n_hi >= 5, f"expected all 5 SSIM convs at HIGHEST, jaxpr has {n_hi}"


def test_ssim_bounded_on_flat_images(rng):
    """Mean SSIM of valid [0,1] images stays in [-1, 1] even on the
    adversarial case — large constant regions where the variance terms are
    pure cancellation (the face background that broke r4). Also pins the
    variance floor: a constant-vs-constant pair is exactly SSIM-friendly."""
    flat = jnp.full((64, 64, 3), 0.25)
    noisy = flat + jnp.asarray(
        rng.normal(0, 1e-4, (64, 64, 3)).astype(np.float32))
    for a, b in [(flat, flat), (flat, noisy), (noisy, noisy)]:
        s = float(ssim(a, b))
        assert -1.0 <= s <= 1.0 + 1e-5, s
    assert float(ssim(flat, flat)) > 0.999
    # gradients on the flat pair are finite and small (they were ±1e3
    # spikes under the bf16-conv cancellation)
    g = jax.grad(lambda p: splat_loss(p, flat)[0])(noisy)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() < 10.0


def test_ssim_finite_below_window_size(rng):
    """Images smaller than the 11x11 window must NOT produce NaN: the VALID
    conv output would be empty and mean([]) is silently NaN — hit at the
    1/4-res phase of the pretrain ramp on small portrait views (e.g. a
    32x48 camera training at 8x12). The window shrinks to fit instead."""
    for h, w in [(8, 12), (12, 8), (11, 11), (5, 40), (1, 1)]:
        a = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        s = float(ssim(a, b))
        assert np.isfinite(s) and -1.0 <= s <= 1.0 + 1e-5, (h, w, s)
        assert float(ssim(a, a)) > 0.999, (h, w)


def test_splat_loss_zero_for_identical(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    loss, m = splat_loss(img, img)
    assert float(loss) < 1e-4
    assert float(m["psnr"]) > 60


@pytest.mark.slow
def test_reoptimize_recovers_perturbed_scene():
    key = jax.random.PRNGKey(0)
    scene = random_scene(key, 150, sh_degree=1, extent=0.8)
    # blobs big enough to cover multiple pixels at this camera distance
    scene = scene.replace(scales=scene.scales + 1.5)
    cams = _orbit_cameras(6)
    cfg = RasterConfig(tile_capacity=256, tile_chunk=8)

    bg = jnp.zeros(3)
    targets = jnp.stack([
        render_rgbd(scene, cams.c2w[i], cams.fx[i], cams.fy[i], cams.cx[i],
                    cams.cy[i], cams.width, cams.height, bg, cfg=cfg)["rgb"]
        for i in range(len(cams))
    ])

    # perturb colors + opacities
    perturbed = scene.replace(
        features_dc=scene.features_dc + 0.8,
        opacities=scene.opacities - 1.0,
    )

    def mean_l1(s):
        total = 0.0
        for i in range(len(cams)):
            out = render_rgbd(s, cams.c2w[i], cams.fx[i], cams.fy[i], cams.cx[i],
                              cams.cy[i], cams.width, cams.height, bg, cfg=cfg)
            total += float(jnp.mean(jnp.abs(out["rgb"] - targets[i])))
        return total / len(cams)

    before = mean_l1(perturbed)
    trained, metrics = reoptimize(
        perturbed, cams, targets, num_steps=120, raster_cfg=cfg,
        train_cfg=TrainConfig(background="black"),
    )
    after = mean_l1(trained)
    assert before > 0.01
    assert after < before * 0.4, f"l1 {before:.4f} -> {after:.4f}"


def test_exp_so3_matches_scipy_free_reference():
    from gaussctrl_tpu.splat.trainer import exp_so3
    # small-angle: exp(phi) ~ I + [phi]_x
    phi = jnp.array([1e-5, -2e-5, 3e-5])
    R = np.asarray(exp_so3(phi))
    expect = np.eye(3) + np.array([[0, -3e-5, -2e-5],
                                   [3e-5, 0, -1e-5],
                                   [2e-5, 1e-5, 0]])
    np.testing.assert_allclose(R, expect, atol=1e-9)
    # 90 deg about z
    R = np.asarray(exp_so3(jnp.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


@pytest.mark.slow
def test_camera_opt_recovers_pose_perturbation():
    """camera_opt (SO3xR3 deltas, gc_config.py:84-86) must compensate a
    deliberately wrong camera pose instead of corrupting the scene."""
    from gaussctrl_tpu.splat.trainer import apply_camera_opt

    key = jax.random.PRNGKey(1)
    scene = random_scene(key, 150, sh_degree=1, extent=0.8)
    scene = scene.replace(scales=scene.scales + 1.5)
    cams = _orbit_cameras(4)
    cfg = RasterConfig(tile_capacity=256, tile_chunk=8)
    bg = jnp.zeros(3)
    targets = jnp.stack([
        render_rgbd(scene, cams.c2w[i], cams.fx[i], cams.fy[i], cams.cx[i],
                    cams.cy[i], cams.width, cams.height, bg, cfg=cfg)["rgb"]
        for i in range(len(cams))
    ])
    # perturb view 0's pose; freeze the scene by near-zero lrs so only the
    # camera_opt group can fix the mismatch
    bad = cams.replace(c2w=cams.c2w.at[0, :, 3].add(
        jnp.array([0.05, -0.04, 0.03])))
    # (the correct local-frame right-composition converges a little slower
    # on a world-frame translation than the old world-frame composition did
    # — more steps + lr, same 2x-improvement bar)
    tcfg = TrainConfig(background="black", use_camera_opt=True,
                       camera_opt_accum=4, lr_camera_opt=1e-2,
                       lr_means=1e-12, lr_features_dc=1e-12,
                       lr_features_rest=1e-12, lr_opacities=1e-12,
                       lr_scales=1e-12, lr_quats=1e-12)
    trained, metrics = reoptimize(scene, bad, targets, num_steps=240,
                                  raster_cfg=cfg, train_cfg=tcfg)
    deltas = metrics["camera_deltas"]
    c2w_fixed = apply_camera_opt(bad.c2w[0], deltas[0])
    err_before = float(jnp.abs(bad.c2w[0] - cams.c2w[0]).max())
    err_after = float(jnp.abs(c2w_fixed - cams.c2w[0]).max())
    assert err_after < err_before * 0.5, (err_before, err_after)

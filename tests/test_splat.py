"""Splat kernels vs NumPy oracles + gradient checks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.splat.project import project_gaussians, quat_to_rotmat
from gaussctrl_tpu.splat.rasterize import RasterConfig, rasterize
from gaussctrl_tpu.splat.sh import eval_sh, num_sh_bases
from tests.oracle import project_np, quat_to_rotmat_np, rasterize_np


def make_view(rng, n=40, W=64, H=48):
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    means[:, 2] += 4.0  # in front of the camera
    scales = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    viewmat = np.eye(4, dtype=np.float32)
    fx = fy = 60.0
    cx, cy = W / 2 + 1.3, H / 2 - 0.7
    return means, scales, quats, viewmat, fx, fy, cx, cy, W, H


def test_quat_to_rotmat_matches_oracle(rng):
    quats = rng.normal(size=(16, 4)).astype(np.float32)
    ours = np.asarray(quat_to_rotmat(jnp.asarray(quats)))
    for i in range(16):
        np.testing.assert_allclose(ours[i], quat_to_rotmat_np(quats[i]), atol=1e-5)


def test_project_matches_oracle(rng):
    means, scales, quats, viewmat, fx, fy, cx, cy, W, H = make_view(rng)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(viewmat), fx, fy, cx, cy, W, H,
    )
    oxys, odepths, oradii, oconics = project_np(
        means, scales, quats, viewmat, fx, fy, cx, cy, W, H
    )
    live = oradii > 0
    assert live.sum() > 10
    np.testing.assert_allclose(np.asarray(proj.xys)[live], oxys[live], atol=0.1)
    np.testing.assert_allclose(np.asarray(proj.depths)[live], odepths[live], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(proj.radii)[live], oradii[live], atol=1.0)
    np.testing.assert_allclose(np.asarray(proj.conics)[live], oconics[live], rtol=5e-3, atol=1e-3)


def test_sh_num_bases():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_sh_degree0_is_constant(rng):
    coeffs = rng.normal(size=(5, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(0, jnp.asarray(dirs), jnp.asarray(coeffs))
    np.testing.assert_allclose(
        np.asarray(out), 0.28209479177387814 * coeffs[:, 0, :], rtol=1e-5
    )


def test_clamped_tile_window_is_centered():
    """A gaussian bigger than the static tile window must keep coverage
    centered on it (a top-left-anchored window dropped right/bottom tiles)."""
    from gaussctrl_tpu.splat.rasterize import RasterConfig, rasterize

    cfg = RasterConfig(max_tiles_x=4, max_tiles_y=4)  # 64px window
    xys = jnp.array([[128.0, 128.0]])
    depths = jnp.array([1.0])
    radii = jnp.array([120.0])                         # footprint ≫ window
    conics = jnp.array([[1 / 900.0, 0.0, 1 / 900.0]])  # sigma 30px
    colors = jnp.array([[1.0, 1.0, 1.0]])
    opac = jnp.array([0.9])
    img, alpha = rasterize(xys, depths, radii, conics, colors, opac,
                           jnp.zeros(3), 256, 256, cfg)
    a = np.asarray(alpha)
    # symmetric coverage around the center, both axes
    assert a[128, 128] > 0.5
    np.testing.assert_allclose(a[128, 128 - 24], a[128, 128 + 24], atol=0.05)
    np.testing.assert_allclose(a[128 - 24, 128], a[128 + 24, 128], atol=0.05)
    assert a[128, 128 + 24] > 0.3


def test_sub_threshold_opacity_is_noop():
    """Gaussians with peak alpha below the blend threshold must not consume
    tile capacity nor change the image (exact prune)."""
    from gaussctrl_tpu.splat.rasterize import rasterize

    xys = jnp.array([[32.0, 32.0], [32.0, 32.0]])
    depths = jnp.array([1.0, 0.5])
    radii = jnp.array([20.0, 20.0])
    conics = jnp.tile(jnp.array([[1 / 64.0, 0.0, 1 / 64.0]]), (2, 1))
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opac = jnp.array([0.8, 1e-4])                      # 2nd is sub-threshold
    img2, _, stats2 = rasterize(xys, depths, radii, conics, colors, opac,
                                jnp.zeros(3), 64, 64, return_stats=True)
    img1, _, stats1 = rasterize(xys[:1], depths[:1], radii[:1], conics[:1],
                                colors[:1], opac[:1], jnp.zeros(3), 64, 64,
                                return_stats=True)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=1e-6)
    assert int(stats2["n_isect"]) == int(stats1["n_isect"])


def test_sh_basis_orthonormal():
    """The 16 basis functions are orthonormal over the sphere.

    Gauss-Legendre in cos(theta) x uniform in phi integrates the degree-<=6
    polynomial products exactly, so this pins every SH constant.
    """
    nodes, weights = np.polynomial.legendre.leggauss(16)  # cos(theta)
    phi = (np.arange(64) + 0.5) * (2 * np.pi / 64)
    ct, ph = np.meshgrid(nodes, phi, indexing="ij")
    st = np.sqrt(1 - ct ** 2)
    dirs = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1).reshape(-1, 3)
    w = np.broadcast_to(weights[:, None], ct.shape).reshape(-1) * (2 * np.pi / 64)

    m = dirs.shape[0]
    basis = np.zeros((m, 16))
    for k in range(16):
        coeffs = np.zeros((m, 16, 3), np.float64)
        coeffs[:, k, 0] = 1.0
        basis[:, k] = np.asarray(
            eval_sh(3, jnp.asarray(dirs, jnp.float64), jnp.asarray(coeffs))
        )[:, 0]
    gram = (basis * w[:, None]).T @ basis
    np.testing.assert_allclose(gram, np.eye(16), atol=5e-3)


@pytest.mark.parametrize("ch", [3, 4])
def test_rasterize_matches_oracle(rng, ch):
    means, scales, quats, viewmat, fx, fy, cx, cy, W, H = make_view(rng, n=60)
    oxys, odepths, oradii, oconics = project_np(
        means, scales, quats, viewmat, fx, fy, cx, cy, W, H
    )
    n = means.shape[0]
    colors = rng.uniform(0, 1, (n, ch)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    bg = rng.uniform(0, 1, (ch,)).astype(np.float32)

    cfg = RasterConfig(tile_capacity=128, tile_chunk=4, max_tiles_x=8, max_tiles_y=8)
    img, alpha = rasterize(
        jnp.asarray(oxys, jnp.float32), jnp.asarray(odepths, jnp.float32),
        jnp.asarray(oradii, jnp.float32), jnp.asarray(oconics, jnp.float32),
        jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(bg), H, W, cfg,
    )
    oimg, oalpha = rasterize_np(oxys, odepths, oradii, oconics, colors, opac, bg, H, W)
    np.testing.assert_allclose(np.asarray(img), oimg, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alpha), oalpha, atol=2e-4)


def test_rasterize_empty_scene_gives_background(rng):
    n, H, W = 8, 32, 32
    bg = jnp.asarray([0.2, 0.4, 0.6])
    img, alpha = rasterize(
        jnp.zeros((n, 2)), jnp.ones((n,)), jnp.zeros((n,)),  # radii 0 ⇒ all culled
        jnp.ones((n, 3)), jnp.ones((n, 3)), jnp.ones((n,)) * 0.5, bg, H, W,
        RasterConfig(tile_capacity=32, tile_chunk=2),
    )
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to(np.asarray(bg), (H, W, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_rasterize_gradients(rng):
    """Finite-difference check on blended values (SURVEY.md §4 gate)."""
    means, scales, quats, viewmat, fx, fy, cx, cy, W, H = make_view(rng, n=12, W=32, H=32)
    oxys, odepths, oradii, oconics = project_np(
        means, scales, quats, viewmat, fx, fy, cx, cy, W, H
    )
    n = means.shape[0]
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.7, (n,)).astype(np.float32)
    bg = np.zeros(3, np.float32)
    cfg = RasterConfig(tile_capacity=64, tile_chunk=2)

    def loss(colors_j, opac_j, xys_j):
        img, _ = rasterize(
            xys_j, jnp.asarray(odepths, jnp.float32), jnp.asarray(oradii, jnp.float32),
            jnp.asarray(oconics, jnp.float32), colors_j, opac_j, jnp.asarray(bg),
            H, W, cfg,
        )
        return jnp.sum(img ** 2)

    args = (jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(oxys, jnp.float32))
    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)

    # finite differences on a few color entries
    eps = 1e-3
    base = float(loss(*args))
    for i in [0, 3, 7]:
        pert = np.array(colors)
        pert[i, 0] += eps
        num = (float(loss(jnp.asarray(pert), args[1], args[2])) - base) / eps
        ana = float(np.asarray(g[0])[i, 0])
        np.testing.assert_allclose(num, ana, rtol=0.05, atol=1e-2)


def test_render_rgbd_shapes(rng):
    from gaussctrl_tpu.splat.render import render_rgbd
    from gaussctrl_tpu.splat.scene import random_scene

    scene = random_scene(jax.random.PRNGKey(0), 200)
    c2w = np.zeros((3, 4), np.float32)
    c2w[:3, :3] = np.diag([1.0, 1.0, -1.0]) @ np.diag([1.0, -1.0, -1.0])  # look +z after flip
    c2w[2, 3] = -4.0
    out = render_rgbd(
        scene, jnp.asarray(c2w), 60.0, 60.0, 32.0, 24.0, 64, 48,
        jnp.zeros(3), cfg=RasterConfig(tile_capacity=256, tile_chunk=4),
    )
    assert out["rgb"].shape == (48, 64, 3)
    assert out["depth"].shape == (48, 64, 1)
    assert out["accumulation"].shape == (48, 64, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_rasterize_few_large_gaussians_no_overflow():
    """Regression: 3 gaussians spanning many tiles each must all render.

    (The intersection buffer used to be cap_multiplier*N with no floor, so tiny
    scenes with large footprints silently dropped whole gaussians.)
    """
    xys = np.array([[32.0, 64.0], [64.0, 64.0], [96.0, 64.0]], np.float32)
    depths = np.array([4.0, 6.0, 4.0], np.float32)
    radii = np.array([25.0, 17.0, 25.0], np.float32)
    conics = np.tile(np.array([[0.02, 0.0, 0.02]], np.float32), (3, 1))
    colors = np.eye(3, dtype=np.float32)
    opac = np.full((3,), 0.98, np.float32)
    img, alpha, stats = rasterize(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
        jnp.asarray(conics), jnp.asarray(colors), jnp.asarray(opac),
        jnp.zeros(3), 128, 128, RasterConfig(tile_capacity=16, tile_chunk=8),
        return_stats=True,
    )
    out = np.asarray(img)
    assert out[64, 32, 0] > 0.9 and out[64, 64, 1] > 0.9 and out[64, 96, 2] > 0.9
    assert int(stats["n_isect"]) == 48


@pytest.mark.slow
@pytest.mark.parametrize("cap", [48, 4])
def test_blend_custom_vjp_matches_autodiff(rng, cap):
    """The manual blend backward (two-pass segmented replay) must match
    autodiff of a dense reference blend on all parameters. cap=4 forces
    every tile through MANY segments (the multi-segment suffix-sum path);
    cap=48 is the single-segment regime."""
    from gaussctrl_tpu.splat.rasterize import (
        ALPHA_THRESH, T_EPS, RasterConfig, _bin_and_sort, _blend_tiles_cv)

    n, H, W = 40, 64, 96
    xys = jnp.asarray(rng.uniform(-8, 104, (n, 2)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.5, 8.0, (n,)), jnp.float32)
    radii = jnp.asarray(rng.uniform(2.0, 40.0, (n,)), jnp.float32)
    L = jnp.asarray(rng.uniform(0.05, 0.4, (n, 2)), jnp.float32)
    # positive-definite conics only (projection guarantees det > 0; autodiff
    # of the reference blend NaNs on the masked exp-overflow branch otherwise)
    co = jnp.asarray(rng.uniform(-0.9, 0.9, (n,)), jnp.float32)
    conics = jnp.stack([L[:, 0], co * jnp.sqrt(L[:, 0] * L[:, 1]), L[:, 1]], -1)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 4)), jnp.float32)
    # low opacities in the multi-segment case keep transmittance above
    # T_EPS: the segmented blend stops at chunk saturation while the dense
    # reference keeps multiplying, so their T_fin (hence bg-grad) diverge by
    # up to T_EPS per pixel — a real, documented semantic difference
    hi = 0.95 if cap == 48 else 0.30
    opac = jnp.asarray(rng.uniform(0.1, hi, (n,)), jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 1, (4,)), jnp.float32)
    cfg = RasterConfig(tile_capacity=cap, tile_chunk=3,
                       max_tiles_x=8, max_tiles_y=8,
                       small_tiles_x=2, small_tiles_y=2, large_divisor=4)
    ntx, nty = (W + 15) // 16, (H + 15) // 16
    binned = _bin_and_sort(xys, depths, radii, ntx, nty, cfg)
    gt = jnp.asarray(rng.uniform(-1, 1, (ntx * nty, 256, 4)), jnp.float32)
    ga = jnp.asarray(rng.uniform(-1, 1, (ntx * nty, 256)), jnp.float32)

    def dense_blend(xys, conics, colors, opac, bg):
        """Reverse-differentiable reference: one pass over the FULL sorted
        buffer per tile (the production blend loops segments under a
        while_loop, which autodiff can't reverse)."""
        m_buf = binned.gauss_idx.shape[0]
        ts = cfg.tile_size
        pix = jnp.arange(ts, dtype=jnp.float32) + 0.5
        px_off = jnp.tile(pix, ts)
        py_off = jnp.repeat(pix, ts)
        tids = jnp.arange(ntx * nty, dtype=jnp.int32)
        tx = (tids % ntx).astype(jnp.float32) * ts
        ty = (tids // ntx).astype(jnp.float32) * ts
        start, end = binned.starts[tids], binned.ends[tids]
        k = jnp.arange(m_buf, dtype=jnp.int32)[None, :]
        take = jnp.minimum(start[:, None] + k, m_buf - 1)
        live = start[:, None] + k < end[:, None]
        gi = binned.gauss_idx[take]
        g_xy, g_conic = xys[gi], conics[gi]
        g_color, g_op = colors[gi], opac[gi]
        px = tx[:, None] + px_off[None, :]
        py = ty[:, None] + py_off[None, :]
        dx = g_xy[:, :, 0:1] - px[:, None, :]
        dy = g_xy[:, :, 1:2] - py[:, None, :]
        a, b, c = (g_conic[:, :, 0:1], g_conic[:, :, 1:2], g_conic[:, :, 2:3])
        sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = jnp.minimum(0.999, g_op[:, :, None] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0) & (alpha >= ALPHA_THRESH)
                          & live[:, :, None], alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha, axis=1)
        t_before = jnp.concatenate(
            [jnp.ones_like(trans[:, :1, :]), trans[:, :-1, :]], axis=1)
        w = alpha * t_before * (t_before > T_EPS)
        out = jnp.einsum("gcp,gck->gpk", w, g_color)
        t_fin = trans[:, -1, :]
        return out + t_fin[:, :, None] * bg[None, None, :], 1.0 - t_fin

    def loss_ref(xys, conics, colors, opac, bg):
        t, a = dense_blend(xys, conics, colors, opac, bg)
        return (t * gt).sum() + (a * ga).sum()

    def loss_cv(xys, conics, colors, opac, bg):
        t, a = _blend_tiles_cv(ntx, nty, cfg, binned, xys, conics, colors,
                               opac, bg)
        return (t * gt).sum() + (a * ga).sum()

    args = (xys, conics, colors, opac, bg)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    got = jax.grad(loss_cv, argnums=(0, 1, 2, 3, 4))(*args)
    for r, g, name in zip(ref, got, ["xys", "conics", "colors", "opac", "bg"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5, err_msg=name)


def test_blend_deep_tiles_not_truncated(rng):
    """Tiles holding far more gaussians than tile_capacity must render the
    whole sorted list (segments), not drop the back (regression: 60% of
    tiles overflowed on a 134k-gaussian scene, corrupting pre-training)."""
    from gaussctrl_tpu.splat.rasterize import RasterConfig, rasterize

    n = 120
    # all gaussians piled on one 16x16 tile, translucent so depth matters
    xys = jnp.asarray(rng.uniform(2, 14, (n, 2)), jnp.float32)
    depths = jnp.asarray(np.linspace(1.0, 5.0, n), jnp.float32)
    radii = jnp.full((n,), 4.0, jnp.float32)
    conics = jnp.tile(jnp.asarray([[0.3, 0.0, 0.3]], jnp.float32), (n, 1))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opac = jnp.full((n,), 0.02, jnp.float32)    # never saturates
    bg = jnp.zeros((3,), jnp.float32)

    small = RasterConfig(tile_capacity=16, tile_chunk=1,
                         max_tiles_x=4, max_tiles_y=4,
                         small_tiles_x=4, small_tiles_y=4)
    big = RasterConfig(tile_capacity=512, tile_chunk=1,
                       max_tiles_x=4, max_tiles_y=4,
                       small_tiles_x=4, small_tiles_y=4)
    img_s, a_s = rasterize(xys, depths, radii, conics, colors, opac, bg,
                           16, 16, small)
    img_b, a_b = rasterize(xys, depths, radii, conics, colors, opac, bg,
                           16, 16, big)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_b),
                               rtol=1e-5, atol=1e-6)
    assert float(a_b.max()) > 0.2               # real blended mass
    assert np.isfinite(np.asarray(img_s)).all()


@pytest.mark.parametrize("cap", [48, 4])
def test_blend_bwd_scatter_write_equals_loop(rng, cap):
    """bwd_write="scatter" (one unique-indices scatter per segment) must
    produce bit-identical gradients to the per-tile RMW dynamic-slice loop
    — same instance rows, different emission path. cap=4 exercises the
    multi-segment case."""
    from gaussctrl_tpu.splat.rasterize import (RasterConfig, _bin_and_sort,
                                               _blend_tiles_cv)

    n, H, W = 40, 64, 96
    xys = jnp.asarray(rng.uniform(-8, 104, (n, 2)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.5, 8.0, (n,)), jnp.float32)
    radii = jnp.asarray(rng.uniform(2.0, 40.0, (n,)), jnp.float32)
    L = jnp.asarray(rng.uniform(0.05, 0.4, (n, 2)), jnp.float32)
    co = jnp.asarray(rng.uniform(-0.9, 0.9, (n,)), jnp.float32)
    conics = jnp.stack([L[:, 0], co * jnp.sqrt(L[:, 0] * L[:, 1]), L[:, 1]], -1)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.9, (n,)), jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 1, (4,)), jnp.float32)
    base = RasterConfig(tile_capacity=cap, tile_chunk=3,
                        max_tiles_x=8, max_tiles_y=8,
                        small_tiles_x=2, small_tiles_y=2, large_divisor=4)
    ntx, nty = (W + 15) // 16, (H + 15) // 16
    binned = _bin_and_sort(xys, depths, radii, ntx, nty, base)
    gt = jnp.asarray(rng.uniform(-1, 1, (ntx * nty, 256, 4)), jnp.float32)
    ga = jnp.asarray(rng.uniform(-1, 1, (ntx * nty, 256)), jnp.float32)

    def loss(cfg):
        def f(xys, conics, colors, opac, bg):
            t, a = _blend_tiles_cv(ntx, nty, cfg, binned, xys, conics,
                                   colors, opac, bg)
            return (t * gt).sum() + (a * ga).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            xys, conics, colors, opac, bg)

    g_loop = loss(base.replace(bwd_write="loop"))
    g_scat = loss(base.replace(bwd_write="scatter"))
    for a, b, name in zip(g_loop, g_scat,
                          ["xys", "conics", "colors", "opac", "bg"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

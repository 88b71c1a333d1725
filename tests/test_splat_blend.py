"""Pallas tile-blend (ops/splat_blend.py) ≡ XLA segmented blend.

Runs in interpreter mode on CPU (tests/conftest.py pins the CPU backend);
the same code path compiles on the real chip. Forward AND the manual VJP
must match the XLA reference to float tolerance — this is the license for
routing RasterConfig.blend_impl="pallas" in training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.ops.splat_blend import blend_pallas
from gaussctrl_tpu.splat.rasterize import (
    RasterConfig, _bin_and_sort, _blend_tiles_cv)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _random_inputs(rng, n, H, W, ch=4):
    xys = jnp.asarray(rng.uniform(-8, max(H, W) + 8, (n, 2)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.5, 8.0, (n,)), jnp.float32)
    radii = jnp.asarray(rng.uniform(2.0, 40.0, (n,)), jnp.float32)
    L = jnp.asarray(rng.uniform(0.05, 0.4, (n, 2)), jnp.float32)
    co = jnp.asarray(rng.uniform(-0.9, 0.9, (n,)), jnp.float32)
    conics = jnp.stack([L[:, 0], co * jnp.sqrt(L[:, 0] * L[:, 1]), L[:, 1]], -1)
    colors = jnp.asarray(rng.uniform(0, 1, (n, ch)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.95, (n,)), jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 1, (ch,)), jnp.float32)
    return xys, depths, radii, conics, colors, opac, bg


def _both(rng, n=60, H=64, W=128, K=128):
    xys, depths, radii, conics, colors, opac, bg = _random_inputs(rng, n, H, W)
    cfg = RasterConfig(tile_capacity=64, tile_chunk=4)
    ntx, nty = (W + 15) // 16, (H + 15) // 16
    binned = _bin_and_sort(xys, depths, radii, ntx, nty, cfg)
    budget = binned.gauss_idx.shape[0]

    def xla_fn(x, c, col, o, b):
        return _blend_tiles_cv(ntx, nty, cfg, binned, x, c, col, o, b)

    def pallas_fn(x, c, col, o, b):
        return blend_pallas(ntx, nty, budget, K, 16, 256, binned,
                            x, c, col, o, b)

    args = (xys, conics, colors, opac, bg)
    return xla_fn, pallas_fn, args


def test_forward_matches_xla(rng):
    xla_fn, pallas_fn, args = _both(rng)
    ref_t, ref_a = xla_fn(*args)
    got_t, got_a = pallas_fn(*args)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               rtol=1e-5, atol=1e-5)
    assert float(ref_a.max()) > 0.2            # scene actually blended mass


def test_vjp_matches_xla(rng):
    xla_fn, pallas_fn, args = _both(rng)

    def loss(fn, x, c, col, o, b):
        t, a = fn(x, c, col, o, b)
        # exercise every cotangent path, unevenly
        return (t * jnp.linspace(0.5, 1.5, t.size).reshape(t.shape)).sum() \
            + 0.7 * (a * a).sum()

    g_ref = jax.grad(lambda *a: loss(xla_fn, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_got = jax.grad(lambda *a: loss(pallas_fn, *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xys", "conics", "colors", "opacities", "background"]
    for name, r, g in zip(names, g_ref, g_got):
        scale = max(1e-3, float(jnp.abs(r).max()))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=name)
        assert float(jnp.abs(r).max()) > 0, name   # non-degenerate test


def test_empty_and_dense_tiles(rng):
    """Tiles with zero instances render pure background; a deep tile
    (hundreds of overlapping gaussians across several K-segments) still
    matches the XLA reference."""
    n, H, W = 300, 32, 32
    xys = jnp.asarray(rng.uniform(4, 12, (n, 2)), jnp.float32)  # tile 0 only
    depths = jnp.asarray(rng.uniform(0.5, 8.0, (n,)), jnp.float32)
    radii = jnp.full((n,), 3.0, jnp.float32)
    conics = jnp.tile(jnp.asarray([[0.3, 0.0, 0.3]], jnp.float32), (n, 1))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 4)), jnp.float32)
    opac = jnp.full((n,), 0.3, jnp.float32)
    bg = jnp.asarray([0.1, 0.9, 0.2, 0.0], jnp.float32)
    cfg = RasterConfig(tile_capacity=64, tile_chunk=2)
    ntx = nty = 2
    binned = _bin_and_sort(xys, depths, radii, ntx, nty, cfg)
    budget = binned.gauss_idx.shape[0]
    ref_t, ref_a = _blend_tiles_cv(ntx, nty, cfg, binned, xys, conics,
                                   colors, opac, bg)
    got_t, got_a = blend_pallas(ntx, nty, budget, 128, 16, 256, binned,
                                xys, conics, colors, opac, bg)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               rtol=1e-4, atol=1e-5)
    # the tile with no gaussians must be exactly background
    empty_tiles = np.asarray(got_a).max(axis=1) == 0.0
    assert empty_tiles.any()
    for t in np.nonzero(empty_tiles)[0]:
        np.testing.assert_allclose(np.asarray(got_t)[t],
                                   np.tile(np.asarray(bg), (256, 1)))


def test_render_rgbd_routes_pallas(rng):
    """End-to-end render with blend_impl='pallas' matches the default."""
    from gaussctrl_tpu.splat.render import render_rgbd
    from gaussctrl_tpu.splat.scene import random_scene
    scene = random_scene(jax.random.PRNGKey(3), 200)
    c2w = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.], [0.], [2.5]])], 1)
    kw = dict(fx=60.0, fy=60.0, cx=32.0, cy=32.0, width=64, height=64,
              background=jnp.asarray([0.2, 0.3, 0.4]))
    ref = render_rgbd(scene, c2w, **kw)
    got = render_rgbd(scene, c2w, cfg=RasterConfig(blend_impl="pallas"), **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-3, atol=1e-3)


def test_plan_invariants(rng):
    """Property test: the packing plan covers every sorted instance exactly
    once, work items visit every block exactly once, and empty tiles get a
    single trash-block work item."""
    from gaussctrl_tpu.ops.splat_blend import _plan, plan_capacity

    T, K, budget = 13, 128, 1664
    lens = rng.integers(0, 250, T)
    lens[3] = 0
    lens[7] = 0
    while lens.sum() > budget:          # real bins never exceed the budget
        lens = lens // 2
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    ends = (starts + lens).astype(np.int32)
    B_cap, G, M_al = plan_capacity(budget, T, K)
    plan = _plan(jnp.asarray(starts), jnp.asarray(ends), budget, T, K)
    tile = np.asarray(plan["tile"])
    blk = np.asarray(plan["blk"])
    first = np.asarray(plan["first"])
    islast = np.asarray(plan["islast"])
    src = np.asarray(plan["src"])
    valid = np.asarray(plan["valid"])

    # every sorted position in [starts[t], ends[t]) appears exactly once
    covered = sorted(src[valid].tolist())
    expected = sorted(p for t in range(T)
                      for p in range(starts[t], ends[t]))
    assert covered == expected

    # valid slots of block b belong to exactly one tile, consecutive
    live_items = [(t, b) for t, b in zip(tile, blk) if t < T]
    real_blocks = [b for _, b in live_items if b < B_cap]
    assert len(real_blocks) == len(set(real_blocks))        # no block twice

    # per-tile first/last flags are each set exactly once for live tiles
    for t in range(T):
        items = [i for i, tt in enumerate(tile) if tt == t]
        assert items, t                                     # even empty tiles
        assert sum(first[i] for i in items) == 1
        assert sum(islast[i] for i in items) == 1
        # empty tiles route to the trash block
        if lens[t] == 0:
            assert all(blk[i] == B_cap for i in items)


def test_searchsorted_right_overflow():
    """Queries >= cum[-1] must return exactly m (never m+1): the helper's
    contract is result <= len(cum), and an unclamped caller indexing with
    the result must not read out of bounds (ADVICE r2)."""
    from gaussctrl_tpu.ops.splat_blend import _searchsorted_right

    cum = jnp.asarray([5.0])
    got = _searchsorted_right(cum, jnp.asarray([10.0, 5.0, 4.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(got), [1, 1, 0, 0])

    # property check vs np.searchsorted(side="right") incl. boundary queries
    cum2 = jnp.asarray(np.cumsum([3, 0, 7, 1, 4]).astype(np.float32))
    qs = np.asarray([0, 2, 3, 9, 10, 11, 14, 15, 16, 100], np.float32)
    got2 = _searchsorted_right(cum2, jnp.asarray(qs))
    np.testing.assert_array_equal(
        np.asarray(got2), np.searchsorted(np.asarray(cum2), qs, side="right"))

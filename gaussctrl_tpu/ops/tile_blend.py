"""Pallas tile-blend forward kernel (the rasterizer's hot inner loop).

The XLA fallback in splat/rasterize.py processes every tile's FULL static
capacity (1024 tiles x 768 slots x 256 px at 512px) because it cannot
early-exit: ~44 ms forward on v5e at 102k gaussians. This kernel walks each
tile's depth-sorted instances sequentially with the 256-pixel transmittance
vector resident in VMEM — exactly gsplat's CUDA inner loop, re-shaped for
the VPU ([2, 128] pixel registers instead of a 16x16 thread block) — and
stops as soon as every pixel is saturated (max T < eps), which for opaque
trained scenes cuts the visited instances by ~3-8x.

Layout contracts (built by the caller, see `blend_tiles_pallas`):
  inst  [T, 8, C]   instance params per (tile, slot): rows are
                    x, y, conic a, b, c, opacity, then colors appended as
                    [T, ch, C] — all gathered OUTSIDE the kernel (one XLA
                    gather; the kernel streams blocks, never random-access)
  count [T]         instances in tile t (ends - starts, capped at C)
  out   [T, ch, 256], alpha [T, 256]

The backward stays on the custom-VJP path in splat/rasterize.py (manual
replay + segmented reduction); this kernel is forward/inference-only and is
routed per-call via `use_pallas_blend`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_THRESH = 1.0 / 255.0
T_EPS = 1e-4
_CHECK_EVERY = 32   # early-exit poll cadence (cross-lane max is not free)


def _blend_kernel(count_ref, geom_ref, color_ref, out_ref, alpha_ref, *,
                  tile_size: int, n_tiles_x: int, ch: int):
    cap = geom_ref.shape[2]
    px_per_tile = tile_size * tile_size
    rows = px_per_tile // 128
    t = pl.program_id(0)
    tx = (t % n_tiles_x) * tile_size
    ty = (t // n_tiles_x) * tile_size
    # pixel coordinate registers [rows, 128] (global image coordinates)
    lin = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))
    pix_x = (tx + lin % tile_size).astype(jnp.float32) + 0.5
    pix_y = (ty + lin // tile_size).astype(jnp.float32) + 0.5

    n = count_ref[t]
    trans0 = jnp.ones((rows, 128), jnp.float32)
    acc0 = tuple(jnp.zeros((rows, 128), jnp.float32) for _ in range(ch))

    def instance(i, carry):
        trans, *acc = carry
        gx = geom_ref[0, 0, i]
        gy = geom_ref[0, 1, i]
        ca = geom_ref[0, 2, i]
        cb = geom_ref[0, 3, i]
        cc = geom_ref[0, 4, i]
        op = geom_ref[0, 5, i]
        dx = gx - pix_x
        dy = gy - pix_y
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(0.999, op * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0) & (alpha >= ALPHA_THRESH), alpha, 0.0)
        w = alpha * trans * (trans > T_EPS)
        acc = [a + w * color_ref[0, k, i] for k, a in enumerate(acc)]
        return (trans * (1.0 - alpha), *acc)

    def block(carry):
        i0, trans, *acc = carry
        end = jnp.minimum(i0 + _CHECK_EVERY, n)
        trans, *acc = jax.lax.fori_loop(i0, end, instance, (trans, *acc))
        return (i0 + _CHECK_EVERY, trans, *acc)

    def cond(carry):
        i0, trans = carry[0], carry[1]
        return (i0 < n) & (jnp.max(trans) > T_EPS)

    out = jax.lax.while_loop(cond, block, (0, trans0, *acc0))
    trans, acc = out[1], out[2:]
    for k in range(ch):
        out_ref[0, k] = acc[k]
    alpha_ref[0] = 1.0 - trans


@functools.partial(jax.jit,
                   static_argnames=("n_tiles_x", "tile_capacity", "tile_size", "interpret"))
def blend_tiles_pallas(
    gauss_idx: jnp.ndarray,   # [CAP] depth-sorted instance -> gaussian
    starts: jnp.ndarray,      # [T]
    ends: jnp.ndarray,        # [T]
    n_tiles_x: int,
    xys: jnp.ndarray,         # [N, 2]
    conics: jnp.ndarray,      # [N, 3]
    colors: jnp.ndarray,      # [N, ch]
    opacities: jnp.ndarray,   # [N]
    background: jnp.ndarray,  # [ch]
    tile_capacity: int,
    tile_size: int = 16,
    interpret: bool = False,
):
    """Forward-only tile blend. Returns (tiles [T, 256, ch], alpha [T, 256]).

    NOTE: truncates each tile at the front-most `tile_capacity` entries —
    the production `_blend_tiles` now loops capacity segments and renders
    lists of any length exactly, so this opt-in kernel is only equivalent
    when every tile fits in one segment. Background composited on the host
    side of the kernel for a cleaner accumulator.
    """
    n_tiles = starts.shape[0]
    ch = colors.shape[-1]
    cap = tile_capacity
    k = jnp.arange(cap, dtype=jnp.int32)[None, :]
    take = jnp.minimum(starts[:, None] + k, gauss_idx.shape[0] - 1)
    live = starts[:, None] + k < ends[:, None]
    gi = gauss_idx[take]                                   # [T, C]
    count = jnp.minimum(ends - starts, cap).astype(jnp.int32)

    geom = jnp.stack([
        xys[gi, 0], xys[gi, 1],
        conics[gi, 0], conics[gi, 1], conics[gi, 2],
        jnp.where(live, opacities[gi], 0.0),
    ], axis=1).astype(jnp.float32)                         # [T, 6, C]
    # pad the geometry sublane dim to 8 for clean tiling
    geom = jnp.pad(geom, ((0, 0), (0, 2), (0, 0)))
    cols = jnp.moveaxis(colors[gi], -1, 1).astype(jnp.float32)  # [T, ch, C]

    px = tile_size * tile_size
    rows = px // 128
    kernel = functools.partial(_blend_kernel, tile_size=tile_size,
                               n_tiles_x=n_tiles_x, ch=ch)
    out, alpha = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [T] count array
            # SMEM: the kernel reads per-instance scalars at dynamic
            # indices, which vector memory cannot serve
            pl.BlockSpec((1, 8, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ch, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ch, rows, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, ch, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, rows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(count, geom, cols)

    alpha = alpha.reshape(n_tiles, px)                     # [T, px]
    tiles = jnp.moveaxis(out.reshape(n_tiles, ch, px), 1, -1)  # [T, px, ch]
    tiles = tiles + (1.0 - alpha)[..., None] * background[None, None, :]
    return tiles, alpha

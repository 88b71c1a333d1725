"""Differentiable tile-binned gaussian rasterization — pure-XLA design.

TPU-native replacement for gsplat's CUDA `rasterize_gaussians`
(/root/reference/gaussctrl/gc_model.py:174-202). The CUDA design (dynamic
per-tile work queues, atomic counters, per-pixel early exit) does not map to
XLA, so this is a re-design around static shapes:

  1. BIN    Each gaussian emits up to KX*KY (tile, depth, index) keys into a
            fixed-capacity intersection buffer via a prefix-sum + scatter
            (compacted, so the sort only sees ~actual intersections, not the
            padded N*K grid).
  2. SORT   One `lax.sort` over (tile_id, depth) with the gaussian index as
            payload — the XLA analog of gsplat's radix sort.
  3. RANGE  Per-tile [start, end) ranges via vectorized `searchsorted`.
  4. BLEND  Per-tile front-to-back alpha compositing over a static per-tile
            capacity, vectorized across the 16x16=256 pixels of every tile
            (VPU-shaped: [tiles, cap, 256] elementwise + cumprod
            transmittance). Overflowing gaussians beyond the capacity are the
            *furthest* ones (sorted), i.e. the mostly-occluded tail.

Everything after SORT is autodiff-able; the integer binning quantities are
computed under `stop_gradient` while the blended values (xys, conics, colors,
opacities) carry gradients — matching the differentiability contract of
gsplat's custom backward. Multi-channel colors let RGB and depth render in a
single fused pass (the reference needs two rasterize calls,
gc_model.py:174-202).

A Pallas kernel with sequential early-exit blending is the planned fast path;
this module is the reference semantics + the fallback.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

ALPHA_THRESH = 1.0 / 255.0
T_EPS = 1e-4


@struct.dataclass
class RasterConfig:
    tile_size: int = struct.field(pytree_node=False, default=16)
    # static per-gaussian tile window (clamps giant gaussians' footprints;
    # the window is centered on the gaussian when clamped)
    max_tiles_x: int = struct.field(pytree_node=False, default=16)
    max_tiles_y: int = struct.field(pytree_node=False, default=16)
    # intersection buffer capacity = max(cap_multiplier * N, min_cap)
    cap_multiplier: int = struct.field(pytree_node=False, default=16)
    min_cap: int = struct.field(pytree_node=False, default=4096)
    # max gaussians blended per tile (front-most kept)
    tile_capacity: int = struct.field(pytree_node=False, default=768)
    # tiles processed per blending step (memory knob)
    tile_chunk: int = struct.field(pytree_node=False, default=128)


class _Binned(NamedTuple):
    gauss_idx: jnp.ndarray   # [CAP] sorted by (tile, depth); idx into N
    tile_ids: jnp.ndarray    # [CAP] sorted tile ids (sentinel = n_tiles)
    starts: jnp.ndarray      # [T]
    ends: jnp.ndarray        # [T]
    n_isect: jnp.ndarray     # [] total intersections requested (may exceed CAP)


def _bin_and_sort(xys, depths, radii, n_tiles_x, n_tiles_y, cfg: RasterConfig):
    """Build the depth-sorted per-tile work lists (non-differentiable)."""
    xys = jax.lax.stop_gradient(xys)
    depths = jax.lax.stop_gradient(depths)
    radii = jax.lax.stop_gradient(radii)

    n = xys.shape[0]
    ts = cfg.tile_size
    kx, ky = cfg.max_tiles_x, cfg.max_tiles_y
    k2 = kx * ky
    cap = max(cfg.cap_multiplier * n, cfg.min_cap)
    n_tiles = n_tiles_x * n_tiles_y

    alive = radii > 0
    tmin_x = jnp.clip(jnp.floor((xys[:, 0] - radii) / ts), 0, n_tiles_x - 1).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((xys[:, 1] - radii) / ts), 0, n_tiles_y - 1).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((xys[:, 0] + radii + 1) / ts), 1, n_tiles_x).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((xys[:, 1] + radii + 1) / ts), 1, n_tiles_y).astype(jnp.int32)
    span_x = jnp.where(alive, jnp.minimum(tmax_x - tmin_x, kx), 0)
    span_y = jnp.where(alive, jnp.minimum(tmax_y - tmin_y, ky), 0)
    # when the footprint exceeds the static window, CENTER the window on the
    # gaussian's center tile (a top-left-anchored window drops the right/
    # bottom tiles of large gaussians — visible tile-square dropouts)
    ctile_x = jnp.clip((xys[:, 0] / ts).astype(jnp.int32), 0, n_tiles_x - 1)
    ctile_y = jnp.clip((xys[:, 1] / ts).astype(jnp.int32), 0, n_tiles_y - 1)
    start_x = jnp.clip(ctile_x - span_x // 2, tmin_x, tmax_x - span_x)
    start_y = jnp.clip(ctile_y - span_y // 2, tmin_y, tmax_y - span_y)
    counts = span_x * span_y                             # [N]
    offsets = jnp.cumsum(counts) - counts                # exclusive prefix sum

    # slot grid: [N, K2] candidate (dy, dx) window offsets
    slot = jnp.arange(k2, dtype=jnp.int32)
    dy = (slot // kx)[None, :]
    dx = (slot % kx)[None, :]
    valid = (dy < span_y[:, None]) & (dx < span_x[:, None])
    tile_x = start_x[:, None] + dx
    tile_y = start_y[:, None] + dy
    tile_id = tile_y * n_tiles_x + tile_x                # [N, K2]
    # dense position within this gaussian's run
    pos_in_run = dy * span_x[:, None] + dx
    target = jnp.where(valid, offsets[:, None] + pos_in_run, cap)  # cap ⇒ dropped

    flat_target = target.reshape(-1)
    flat_tile = tile_id.reshape(-1).astype(jnp.int32)
    flat_depth = jnp.broadcast_to(depths[:, None], (n, k2)).reshape(-1)
    flat_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k2)
    ).reshape(-1)

    buf_tile = jnp.full((cap,), n_tiles, jnp.int32)
    buf_depth = jnp.full((cap,), jnp.inf, jnp.float32)
    buf_idx = jnp.zeros((cap,), jnp.int32)
    buf_tile = buf_tile.at[flat_target].set(flat_tile, mode="drop")
    buf_depth = buf_depth.at[flat_target].set(flat_depth.astype(jnp.float32), mode="drop")
    buf_idx = buf_idx.at[flat_target].set(flat_idx, mode="drop")

    s_tile, _, s_idx = jax.lax.sort((buf_tile, buf_depth, buf_idx), num_keys=2)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tids + 1, side="left").astype(jnp.int32)
    return _Binned(gauss_idx=s_idx, tile_ids=s_tile, starts=starts, ends=ends,
                   n_isect=counts.sum())


def _blend_tiles(binned: _Binned, xys, conics, colors, opacities, background,
                 n_tiles_x, n_tiles_y, cfg: RasterConfig):
    """Front-to-back alpha compositing for every tile. Differentiable."""
    ts = cfg.tile_size
    cap = cfg.tile_capacity
    n_tiles = n_tiles_x * n_tiles_y
    ch = colors.shape[-1]

    # per-tile pixel centers (offsets within a tile; origin added per tile)
    pix = jnp.arange(ts, dtype=jnp.float32) + 0.5
    pix_x = jnp.tile(pix, ts)                 # [256]
    pix_y = jnp.repeat(pix, ts)               # [256]

    def blend_chunk(tile_base):
        tids = tile_base + jnp.arange(cfg.tile_chunk, dtype=jnp.int32)  # [G]
        tx = (tids % n_tiles_x).astype(jnp.float32) * ts
        ty = (tids // n_tiles_x).astype(jnp.float32) * ts
        start = binned.starts[tids]                                     # [G]
        end = binned.ends[tids]
        k = jnp.arange(cap, dtype=jnp.int32)[None, :]                   # [1, C]
        take = jnp.minimum(start[:, None] + k, binned.gauss_idx.shape[0] - 1)
        live = start[:, None] + k < end[:, None]                        # [G, C]
        gi = binned.gauss_idx[take]                                     # [G, C]

        g_xy = xys[gi]                                                  # [G, C, 2]
        g_conic = conics[gi]                                            # [G, C, 3]
        g_color = colors[gi]                                            # [G, C, ch]
        g_op = opacities[gi]                                            # [G, C]

        px = tx[:, None] + pix_x[None, :]                               # [G, 256]
        py = ty[:, None] + pix_y[None, :]
        dx = g_xy[:, :, 0:1] - px[:, None, :]                           # [G, C, 256]
        dy = g_xy[:, :, 1:2] - py[:, None, :]
        a, b, c = (g_conic[:, :, 0:1], g_conic[:, :, 1:2], g_conic[:, :, 2:3])
        sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = jnp.minimum(0.999, g_op[:, :, None] * jnp.exp(-sigma))
        alpha = jnp.where(
            (sigma >= 0) & (alpha >= ALPHA_THRESH) & live[:, :, None], alpha, 0.0
        )                                                               # [G, C, 256]

        one_minus = 1.0 - alpha
        trans = jnp.cumprod(one_minus, axis=1)                          # inclusive
        t_before = jnp.concatenate(
            [jnp.ones_like(trans[:, :1, :]), trans[:, :-1, :]], axis=1
        )                                                               # exclusive
        w = alpha * t_before * (t_before > T_EPS)                       # [G, C, 256]
        out = jnp.einsum("gcp,gck->gpk", w, g_color)                    # [G, 256, ch]
        t_final = trans[:, -1, :]                                       # [G, 256]
        out = out + t_final[:, :, None] * background[None, None, :]
        return out, 1.0 - t_final

    n_chunks = (n_tiles + cfg.tile_chunk - 1) // cfg.tile_chunk
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * cfg.tile_chunk
    outs, alphas = jax.lax.map(jax.checkpoint(blend_chunk), bases)
    # [n_chunks, G, 256, ch] → [T, 256, ch]
    outs = outs.reshape(n_chunks * cfg.tile_chunk, ts * ts, ch)[:n_tiles]
    alphas = alphas.reshape(n_chunks * cfg.tile_chunk, ts * ts)[:n_tiles]
    return outs, alphas


def _tiles_to_image(tiles, n_tiles_x, n_tiles_y, height, width, ts, ch=None):
    """[T, ts*ts(, ch)] tile-major → [H, W(, ch)] row-major image."""
    if ch is None:
        x = tiles.reshape(n_tiles_y, n_tiles_x, ts, ts)
        x = x.transpose(0, 2, 1, 3).reshape(n_tiles_y * ts, n_tiles_x * ts)
        return x[:height, :width]
    x = tiles.reshape(n_tiles_y, n_tiles_x, ts, ts, ch)
    x = x.transpose(0, 2, 1, 3, 4).reshape(n_tiles_y * ts, n_tiles_x * ts, ch)
    return x[:height, :width]


@partial(jax.jit, static_argnames=("height", "width", "cfg", "return_stats"))
def rasterize(
    xys: jnp.ndarray,         # [N, 2]
    depths: jnp.ndarray,      # [N]
    radii: jnp.ndarray,       # [N] (0 ⇒ culled)
    conics: jnp.ndarray,      # [N, 3]
    colors: jnp.ndarray,      # [N, ch] per-gaussian channels (rgb, depth, …)
    opacities: jnp.ndarray,   # [N] post-sigmoid
    background: jnp.ndarray,  # [ch]
    height: int,
    width: int,
    cfg: RasterConfig = RasterConfig(),
    return_stats: bool = False,
):
    """Composite gaussians into an image. Returns (image [H,W,ch], alpha [H,W]).

    With return_stats=True also returns {"n_isect": total intersections} so
    callers can detect intersection-buffer overflow (n_isect > cap ⇒ some
    gaussians were dropped; raise cfg.cap_multiplier).
    """
    ts = cfg.tile_size
    n_tiles_x = (width + ts - 1) // ts
    n_tiles_y = (height + ts - 1) // ts
    # exact no-op prune: peak alpha = opacity (at the gaussian center), so
    # anything below the blend threshold can never contribute — keeping such
    # gaussians only burns tile capacity (they caused visible tile dropouts
    # on dense low-opacity scenes)
    radii = jnp.where(
        jax.lax.stop_gradient(opacities) >= ALPHA_THRESH, radii, 0)
    binned = _bin_and_sort(xys, depths, radii, n_tiles_x, n_tiles_y, cfg)
    tiles, tile_alpha = _blend_tiles(
        binned, xys, conics, colors, opacities, background, n_tiles_x, n_tiles_y, cfg
    )
    img = _tiles_to_image(tiles, n_tiles_x, n_tiles_y, height, width, ts, colors.shape[-1])
    alpha = _tiles_to_image(tile_alpha, n_tiles_x, n_tiles_y, height, width, ts)
    if return_stats:
        return img, alpha, {
            "n_isect": binned.n_isect,
            # > cfg.tile_capacity ⇒ the furthest gaussians of some tiles were
            # truncated (raise tile_capacity if it shows visually)
            "max_tile_count": (binned.ends - binned.starts).max(),
        }
    return img, alpha

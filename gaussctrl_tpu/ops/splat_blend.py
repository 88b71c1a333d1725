"""Pallas tile alpha-blend — exact forward + backward (the gsplat kernel role).

TPU-native replacement for the rasterizer's hot loop (the CUDA kernels behind
/root/reference/gaussctrl/gc_model.py:174-202). The XLA segmented blend in
splat/rasterize.py is the reference semantics; this kernel computes the SAME
function (equal up to float reassociation) with the per-tile running state
held in VMEM instead of HBM round-trips:

  layout    Per-tile sorted instance lists are re-packed K-aligned: tile t
            owns ceil(len_t/K) consecutive K-blocks of a [16, M_al] buffer
            (rows: x, y, conic a/b/c, ch colors, opacity, zero padding; a
            block DMA is [16, K] with K on lanes). Padded slots carry
            opacity 0, making them exact no-ops in the blend — the kernel
            needs no length bookkeeping at all.
  worklist  One grid step per (tile, segment) pair, flattened and bounded
            statically (B_cap + T + 1). Scalar-prefetched arrays give each
            step its tile row and instance block; Pallas keeps the output
            block resident in VMEM while consecutive steps share a tile and
            writes it back exactly once (block-revision semantics). Empty
            tiles get one step against an all-padding trash block, which
            renders them background-only for free.
  compute   [P=ts*ts sublanes, K lanes]: alpha gating exactly as the XLA
            path (sigma >= 0, alpha >= 1/255, clamp 0.999); transmittance
            via an exact multiplicative lane-axis prefix scan; running
            T carried in VMEM scratch across a tile's segments and
            checkpointed per segment for the backward.
  backward  single REVERSE sweep per tile (the XLA path needs two forward
            replays): the suffix S_i = sum_{j>i} (g.c_j) w_j accumulates in
            scratch while T_before is reconstructed from the forward
            checkpoints. Per-instance gradients reduce over pixels
            (sublanes) into a [16, M_al] buffer; reduce_by_slot then turns
            instance grads into per-gaussian grads with one scatter + one
            windowed reshape-sum (no re-sort — the candidate-slot identity
            carried through the bin sort makes the inverse permutation a
            scatter of arange).

Semantics pinned by tests/test_splat_blend.py: forward and VJP match the XLA
segmented blend to float tolerance on random scenes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_THRESH = 1.0 / 255.0
T_EPS = 1e-4
D_PAD = 16          # instance rows, padded to a clean sublane tile
K_DEF = 256         # instances per segment block (lane-dim multiple of 128)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _excl_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), x.dtype), c[:-1]]), c


def _searchsorted_right(cum, queries):
    """Index of the first cum[i] > q (vectorized binary search)."""
    m = cum.shape[0]
    iters = max(1, (m + 1).bit_length())
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, m, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        # lo < hi guard: once the bracket converges the iterate must be a
        # fixed point, otherwise queries >= cum[-1] overshoot to m+1 (the
        # fori_loop runs a static iteration count past convergence)
        pred = (lo < hi) & (cum[jnp.minimum(mid, m - 1)] <= queries)
        return jnp.where(pred, mid + 1, lo), jnp.where(pred, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def plan_capacity(budget: int, n_tiles: int, K: int = K_DEF):
    """(B_cap, G, M_al): block capacity, work items, aligned buffer length."""
    B_cap = budget // K + n_tiles
    G = B_cap + n_tiles + 1
    M_al = (B_cap + 1) * K
    return B_cap, G, M_al


def _plan(starts, ends, budget: int, n_tiles: int, K: int):
    """Static-shape packing plan: work list + aligned-buffer slot maps.

      tile    [G] out row per work item (n_tiles = trash row for dead items)
      blk     [G] instance block per item (B_cap = all-padding trash block)
      first   [G] item is its tile's first segment (forward T reset)
      islast  [G] item is its tile's last segment (backward S reset, after
              reversal)
      src     [M_al] sorted-buffer position feeding each aligned slot
      valid   [M_al] aligned slot holds a real instance
    """
    B_cap, G, M_al = plan_capacity(budget, n_tiles, K)
    lens = ends - starts
    nblk = (lens + K - 1) // K                      # 0 for empty tiles
    nwork = jnp.maximum(nblk, 1)                    # empty tiles still flush

    work_ofs, work_cum = _excl_cumsum(nwork)
    blk_ofs, blk_cum = _excl_cumsum(nblk)
    total_work = work_cum[-1]
    total_blk = blk_cum[-1]

    g = jnp.arange(G, dtype=jnp.int32)
    t_of_g = jnp.minimum(_searchsorted_right(work_cum, g), n_tiles - 1)
    s_local = g - work_ofs[t_of_g]
    live_g = g < total_work
    real_seg = live_g & (s_local < nblk[t_of_g])
    tile = jnp.where(live_g, t_of_g, n_tiles).astype(jnp.int32)
    blk = jnp.where(real_seg, blk_ofs[t_of_g] + s_local, B_cap).astype(jnp.int32)
    first = (live_g & (s_local == 0)).astype(jnp.int32)
    islast = (live_g & (s_local == nwork[t_of_g] - 1)).astype(jnp.int32)
    skip = jnp.logical_not(live_g).astype(jnp.int32)    # dead padding items

    # per-BLOCK construction (B_cap + 1 searches), expanded to slots by pure
    # broadcasting — a per-slot binary search over M_al was 283 ms/step
    b = jnp.arange(B_cap + 1, dtype=jnp.int32)
    t_of_b = jnp.minimum(_searchsorted_right(blk_cum, b), n_tiles - 1)
    src_base = starts[t_of_b] + (b - blk_ofs[t_of_b]) * K      # [B_cap+1]
    k = jnp.arange(K, dtype=jnp.int32)
    src = (src_base[:, None] + k[None, :])                     # [B_cap+1, K]
    valid = (b[:, None] < total_blk) & (src < ends[t_of_b][:, None])
    return dict(tile=tile, blk=blk, first=first, islast=islast, skip=skip,
                src=jnp.where(valid, src, 0).reshape(-1),
                valid=valid.reshape(-1))


def _pack_instances(plan, gauss_idx, xys, conics, colors, opacities):
    """([D_PAD, M_al] instance buffer, [M_al] gaussian index per slot).

    ONE row-gather of a pre-concatenated [N, 16] matrix (64-byte rows),
    then a single transpose — 11 separate scalar gathers over M_al slots
    measured 400 ms/step."""
    m = gauss_idx.shape[0]
    gi = gauss_idx[jnp.minimum(plan["src"], m - 1)]
    ch = colors.shape[-1]
    d = 5 + ch + 1
    data = jnp.concatenate(
        [xys.astype(jnp.float32), conics.astype(jnp.float32),
         colors.astype(jnp.float32),
         opacities.astype(jnp.float32)[:, None],
         jnp.zeros((xys.shape[0], D_PAD - d), jnp.float32)], axis=1)
    inst = data[gi]                                     # [M_al, 16]
    inst = jnp.where(plan["valid"][:, None], inst, 0.0)
    return inst.T, gi


def _cumsum_lanes(x, K: int):
    """Inclusive prefix sum along the lane axis via log-shift rolls."""
    P = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
    sh = 1
    while sh < K:
        r = pltpu.roll(x, sh, axis=1)
        x = x + jnp.where(col >= sh, r, 0.0)
        sh *= 2
    return x


def _cumprod_excl_lanes(x, K: int):
    """EXCLUSIVE prefix product along lanes (first lane = 1), exact
    multiplicative scan — log-space accumulation drifts ~3e-3 vs the XLA
    cumprod over deep tiles, which is visible against the equivalence
    tolerance, so multiply directly."""
    P = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
    x = jnp.where(col >= 1, pltpu.roll(x, 1, axis=1), 1.0)  # shift right
    sh = 1
    while sh < K:
        r = pltpu.roll(x, sh, axis=1)
        x = x * jnp.where(col >= sh, r, 1.0)
        sh *= 2
    return x


def _alpha_block(inst, px, py, ch: int):
    """Gated alphas for one block. inst [D_PAD, K]; px, py [P, 1] global
    pixel centers. Returns (alpha [P, K], aux)."""
    x = inst[0:1, :]
    y = inst[1:2, :]
    a = inst[2:3, :]
    b = inst[3:4, :]
    c = inst[4:5, :]
    op = inst[5 + ch:6 + ch, :]
    dx = x - px                                         # [P, K]
    dy = y - py
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    e_sig = jnp.exp(-sigma)
    araw = op * e_sig
    alpha_c = jnp.minimum(0.999, araw)
    cond = (sigma >= 0.0) & (alpha_c >= ALPHA_THRESH)
    alpha = jnp.where(cond, alpha_c, 0.0)
    return alpha, dict(dx=dx, dy=dy, a=a, b=b, c=c, e_sig=e_sig,
                       araw=araw, cond=cond)


def _pix_centers(ts: int, tid, n_tiles_x: int):
    """Global pixel-center coordinates [P, 1] for tile `tid`."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (ts * ts, 1), 0)
    tx = jnp.float32(ts) * (tid % n_tiles_x)
    ty = jnp.float32(ts) * (tid // n_tiles_x)
    px = (lin % ts).astype(jnp.float32) + 0.5 + tx
    py = (lin // ts).astype(jnp.float32) + 0.5 + ty
    return px, py


def _make_fwd_kernel(ts: int, ch: int, K: int, n_tiles_x: int):
    def kernel(tile_ref, blk_ref, first_ref, skip_ref, inst_ref, out_ref,
               tfin_ref, ckpt_ref, t_scr):
        g = pl.program_id(0)
        first = first_ref[g] == 1
        dead = skip_ref[g] == 1

        @pl.when(first)
        def _():
            t_scr[:] = jnp.ones_like(t_scr)

        ckpt_ref[0] = t_scr[:]                          # T entering segment

        # early exit, per tile (the CUDA rasterizer's per-pixel termination,
        # the XLA path's per-chunk while_loop): once every pixel saturates,
        # the remaining segments contribute exactly 0 (w carries a
        # t_before > T_EPS factor), so skip their compute outright. The
        # resident out/tfin blocks keep their last written values. Dead
        # padding items (static work-list bound) are skipped the same way.
        @pl.when(jnp.logical_not(dead)
                 & (first | (jnp.max(t_scr[:]) > T_EPS)))
        def _():
            px, py = _pix_centers(ts, tile_ref[g], n_tiles_x)
            t_in = t_scr[:, 0:1]                        # [P, 1]
            inst = inst_ref[:]                          # [D_PAD, K]
            alpha, _ = _alpha_block(inst, px, py, ch)
            one_minus = 1.0 - alpha
            excl = _cumprod_excl_lanes(one_minus, K)    # exclusive prefix
            t_before = t_in * excl
            w = alpha * t_before * (t_before > T_EPS).astype(jnp.float32)

            acc = jnp.where(first, 0.0, out_ref[0])     # [P, ch]
            cols = [jnp.sum(w * inst[5 + c:6 + c, :], axis=1, keepdims=True)
                    for c in range(ch)]
            out_ref[0] = acc + jnp.concatenate(cols, axis=1)

            t_new = t_in * (excl[:, K - 1:K] * one_minus[:, K - 1:K])
            t_scr[:] = t_new
            tfin_ref[0] = t_new

    return kernel


def _make_bwd_kernel(ts: int, ch: int, K: int, n_tiles_x: int):
    def kernel(tile_ref, blk_ref, last_ref, gsel_ref, skip_ref, inst_ref,
               go_ref, gterm_ref, ckpt_ref, ginst_ref, s_scr):
        g = pl.program_id(0)
        dead = skip_ref[g] == 1

        @pl.when(last_ref[g] == 1)
        def _():
            s_scr[:] = jnp.zeros_like(s_scr)

        t_in = ckpt_ref[0]                               # [P, 1]
        live = (jnp.max(t_in) > T_EPS) & jnp.logical_not(dead)

        @pl.when(live)
        def _():
            px, py = _pix_centers(ts, tile_ref[g], n_tiles_x)
            inst = inst_ref[:]
            alpha, aux = _alpha_block(inst, px, py, ch)
            one_minus = 1.0 - alpha
            t_before = t_in * _cumprod_excl_lanes(one_minus, K)   # [P, K]
            m = (t_before > T_EPS).astype(jnp.float32)
            w = alpha * t_before * m

            go = go_ref[0]                               # [P, ch]
            gc = jnp.zeros_like(alpha)
            for c in range(ch):
                gc = gc + go[:, c:c + 1] * inst[5 + c:6 + c, :]
            q = gc * w
            qcum = _cumsum_lanes(q, K)                   # inclusive
            qtot = qcum[:, K - 1:K]                      # [P, 1]
            s_after = s_scr[:] + (qtot - qcum)           # suffix within block
            ga = gc * t_before * m - (s_after + gterm_ref[0]) / one_minus
            gate = aux["cond"] & (aux["araw"] < 0.999)
            ga = jnp.where(gate, ga, 0.0)

            dx, dy = aux["dx"], aux["dy"]
            g_sigma = -ga * alpha
            rows = [
                jnp.sum(g_sigma * (aux["a"] * dx + aux["b"] * dy), axis=0,
                        keepdims=True),
                jnp.sum(g_sigma * (aux["c"] * dy + aux["b"] * dx), axis=0,
                        keepdims=True),
                jnp.sum(g_sigma * 0.5 * dx * dx, axis=0, keepdims=True),
                jnp.sum(g_sigma * dx * dy, axis=0, keepdims=True),
                jnp.sum(g_sigma * 0.5 * dy * dy, axis=0, keepdims=True),
            ]
            rows += [jnp.sum(w * go[:, c:c + 1], axis=0, keepdims=True)
                     for c in range(ch)]
            rows.append(jnp.sum(ga * aux["e_sig"], axis=0, keepdims=True))
            out = jnp.concatenate(rows, axis=0)          # [5+ch+1, K]
            ginst_ref[:] = jnp.concatenate(
                [out, jnp.zeros((D_PAD - out.shape[0], K), jnp.float32)],
                axis=0)
            s_scr[:] = s_scr[:] + qtot

        @pl.when(jnp.logical_not(live) & jnp.logical_not(dead))
        def _():
            # saturated segments contribute exactly zero gradient, but the
            # buffer block must not be left as garbage for the reduce
            # (dead items' trash block is masked there instead)
            ginst_ref[:] = jnp.zeros_like(ginst_ref)

    return kernel


@partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles", "ts", "ch", "K"))
def _forward_call(tile, blk, first, skip, inst_buf, n_tiles_x: int,
                  n_tiles: int, ts: int, ch: int, K: int):
    P = ts * ts
    G = tile.shape[0]
    kernel = _make_fwd_kernel(ts, ch, K, n_tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((D_PAD, K),
                         lambda g, tile, blk, first, skip: (0, blk[g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, ch),
                         lambda g, tile, blk, first, skip: (tile[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1),
                         lambda g, tile, blk, first, skip: (tile[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1),
                         lambda g, tile, blk, first, skip: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles + 1, P, ch), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, P, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(tile, blk, first, skip, inst_buf)


@partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles", "ts", "ch", "K"))
def _backward_call(tile_r, blk_r, last_r, gsel_r, skip_r, inst_buf, go,
                   gterm, ckpt, n_tiles_x: int, n_tiles: int, ts: int,
                   ch: int, K: int):
    P = ts * ts
    G = tile_r.shape[0]
    M_al = inst_buf.shape[1]
    kernel = _make_bwd_kernel(ts, ch, K, n_tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((D_PAD, K),
                         lambda g, tile, blk, last, gsel, skip: (0, blk[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, ch),
                         lambda g, tile, blk, last, gsel, skip:
                         (tile[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1),
                         lambda g, tile, blk, last, gsel, skip:
                         (tile[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1),
                         lambda g, tile, blk, last, gsel, skip:
                         (gsel[g], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (D_PAD, K), lambda g, tile, blk, last, gsel, skip: (0, blk[g]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D_PAD, M_al), jnp.float32),
        interpret=_interpret(),
    )(tile_r, blk_r, last_r, gsel_r, skip_r, inst_buf, go, gterm, ckpt)


# ---------------------------------------------------------------------------
# Differentiable entry point (same contract as rasterize._blend_tiles_cv)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def blend_pallas(n_tiles_x, n_tiles_y, budget, K, k2s, k2L, binned, xys,
                 conics, colors, opacities, background):
    """Front-to-back alpha blend of the sorted bins — Pallas fwd+bwd.

    Returns (tiles [T, ts*ts, ch], tile_alpha [T, ts*ts]) exactly like
    rasterize._blend_tiles. `binned` is a rasterize._Binned; `budget` its
    gauss_idx length (static)."""
    out, _ = _blend_fwd_impl(n_tiles_x, n_tiles_y, budget, K, binned, xys,
                             conics, colors, opacities, background)
    return out


def _blend_fwd_impl(n_tiles_x, n_tiles_y, budget, K, binned, xys, conics,
                    colors, opacities, background):
    ts = 16
    n_tiles = n_tiles_x * n_tiles_y
    ch = colors.shape[-1]
    plan = _plan(binned.starts, binned.ends, budget, n_tiles, K)
    inst_buf, _ = _pack_instances(plan, binned.gauss_idx, xys, conics,
                                  colors, opacities)
    out3, tfin3, ckpt3 = _forward_call(plan["tile"], plan["blk"],
                                       plan["first"], plan["skip"], inst_buf,
                                       n_tiles_x, n_tiles, ts, ch, K)
    tfin = tfin3[:n_tiles, :, 0]                       # [T, P]
    tiles = out3[:n_tiles] + tfin[:, :, None] * background[None, None, :]
    alpha = 1.0 - tfin
    res = (plan, inst_buf, tfin, ckpt3, binned, xys, conics, colors,
           opacities, background)
    return (tiles, alpha), res


def _blend_fwd(n_tiles_x, n_tiles_y, budget, K, k2s, k2L, binned, xys,
               conics, colors, opacities, background):
    return _blend_fwd_impl(n_tiles_x, n_tiles_y, budget, K, binned, xys,
                           conics, colors, opacities, background)


def _blend_bwd(n_tiles_x, n_tiles_y, budget, K, k2s, k2L, res, ct):
    (plan, inst_buf, tfin, ckpt3, binned, xys, conics, colors,
     opacities, background) = res
    g_tiles, g_alpha = ct
    ts = 16
    n_tiles = n_tiles_x * n_tiles_y
    ch = colors.shape[-1]
    n = xys.shape[0]

    go = jnp.pad(g_tiles.astype(jnp.float32), ((0, 1), (0, 0), (0, 0)))
    gA = jnp.pad(g_alpha.astype(jnp.float32), ((0, 1), (0, 0)))
    tfin_p = jnp.pad(tfin, ((0, 1), (0, 0)))
    # d(out)/dT = background, d(alpha)/dT = -1: fold both into the per-pixel
    # suffix constant (rasterize._blend_bwd_instance_grads's gbg - gA term)
    gbg = jnp.einsum("tpk,k->tp", go, background.astype(jnp.float32))
    gterm = ((gbg - gA) * tfin_p)[:, :, None]            # [T+1, P, 1]

    rev = slice(None, None, -1)
    gsel_r = jnp.arange(plan["tile"].shape[0], dtype=jnp.int32)[rev]
    ginst = _backward_call(plan["tile"][rev], plan["blk"][rev],
                           plan["islast"][rev], gsel_r, plan["skip"][rev],
                           inst_buf, go, gterm, ckpt3, n_tiles_x, n_tiles,
                           ts, ch, K)

    from gaussctrl_tpu.splat.rasterize import reduce_by_slot
    d = 5 + ch + 1
    budget2 = binned.slot_idx.shape[0]
    slot_al = binned.slot_idx[jnp.minimum(plan["src"], budget2 - 1)]
    g = reduce_by_slot(ginst[:d].T, slot_al, plan["valid"], binned, n,
                       k2s, k2L)
    g = g.astype(xys.dtype)
    g_bg = jnp.einsum("tp,tpk->k", tfin, g_tiles.astype(jnp.float32))
    g_binned = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), binned)
    return (g_binned, g[:, 0:2], g[:, 2:5], g[:, 5:5 + ch],
            g[:, 5 + ch].astype(opacities.dtype), g_bg.astype(background.dtype))


blend_pallas.defvjp(_blend_fwd, _blend_bwd)

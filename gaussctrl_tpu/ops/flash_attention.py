"""Flash attention (Pallas, TPU) — the UNet/VAE/SAM attention fast path.

The einsum attention in diffusion/nn.py materializes [B, h, Tq, Tk] score
tensors in HBM (several GB of traffic per 4096-token UNet layer at the
reference edit batch); these kernels keep scores in VMEM. Two schedules,
auto-selected by VMEM footprint:

  * single-shot (`_attn_kernel_full`): the whole [bq, Tk] score panel lives
    in VMEM — one QK^T, one softmax, one full-depth PV matmul. Optimal at
    the SD shapes (Tk ≤ 4096, head_dim ≤ 160), where K/V fit VMEM anyway
    and the online-softmax rescale chain is pure overhead.
  * streaming (`_flash_kernel`): online softmax over K/V blocks — the
    standard flash-attention scheme, for K/V too long to hold scores.

Both run as a Pallas grid over (batch·heads, query blocks).

Inference-only (the editing pipeline never differentiates through the UNet —
re-optimization differentiates the splat renderer instead, SURVEY.md §3.1);
`attention()` in diffusion/nn.py falls back to the einsum path off-TPU or for
unsupported shapes.

fp32 accumulation, bf16-friendly inputs; head_dim is zero-padded to the
128-lane width (softmax scale uses the true dim), K/V tail blocks are masked
with -inf scores.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, tk_real: int,
                  scale: float):
    """One (batch·head, q-block) cell: online softmax over K/V blocks.

    Refs carry a leading block dim of 1: q/o [1, bq, d], k/v [1, Tk_pad, d].
    """
    bq, d = q_ref.shape[1], q_ref.shape[2]
    tk_pad = k_ref.shape[1]
    n_blocks = tk_pad // block_k

    # keep the matmul INPUTS in the model dtype (bf16 MXU runs at 4x the
    # f32 rate on v5e) and accumulate in f32; the softmax running state
    # stays f32. Scale applies to the f32 scores, not the bf16 operands.
    q = q_ref[0]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [bq, block_k]
        kpos = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(kpos < tk_real, s, _NEG_INF)           # mask padded tail
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_kernel_full(q_ref, k_ref, v_ref, o_ref, *, tk_real: int,
                      scale: float):
    """Single-shot in-VMEM softmax: scores [bq, Tk_pad] never leave VMEM.

    For the SD operating shapes (Tk ≤ 4096, head_dim ≤ 160) the WHOLE K/V
    block already fits in VMEM, so the online-softmax block loop only adds
    per-block rescale traffic (acc·alpha chains) and short-depth MXU calls;
    one full score panel + one max/exp/sum + one depth-Tk PV matmul is
    strictly less work. Selected by flash_attention when the score panel
    fits the VMEM budget; the streaming kernel remains for longer K/V."""
    tk_pad = k_ref.shape[1]
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [bq, tk_pad]
    kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < tk_real, s, _NEG_INF)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_kernel_full_t(q_ref, k_ref, v_ref, o_ref, *, tk_real: int,
                        scale: float):
    """Transposed single-shot schedule for SMALL head_dim (SD-1.5's 40/80).

    The standard layouts put head_dim on the 128-lane axis, so d=40 pads to
    128 and BOTH matmuls run at 40/128 = 31% MXU utilization — which is why
    the r3 A/B measured the flash lane ~15% BEHIND the score-materializing
    einsum at 4096 tokens. Here every ref keeps d on the SUBLANE axis
    (bf16 tile: 16 sublanes -> d=40 pads to 48, a 1.2x overhead instead of
    3.2x): q/k/v/o arrive as [1, d_pad, T], QK^T contracts the sublane
    axis, softmax reduces over Tk-as-sublanes, and PV contracts Tk. Scores
    still never leave VMEM.
    """
    s = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [tk_pad, bq]
    kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < tk_real, s, _NEG_INF)
    m = s.max(axis=0, keepdims=True)                         # [1, bq]
    p = jnp.exp(s - m)
    l = p.sum(axis=0, keepdims=True)
    o = jax.lax.dot_general(
        v_ref[0], p.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [d_pad, bq]
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "interpret"))
def flash_attention_t(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      heads: int, block_q: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """Transposed-layout single-shot attention (see _attn_kernel_full_t).

    Same contract as flash_attention. The host-side relayout to [B·h, d, T]
    is an O(B·T·C) HBM transpose — negligible next to the score traffic the
    kernel saves. Wins on SQUARE self-attention shapes at every SD head_dim
    (40/80/160, r4 micro sweep) and loses on tall-skinny tq >> tk;
    flash_attention auto-dispatches here (kernel=\"auto\") for square
    shapes with Tq ≤ 4096."""
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // heads
    d_pad = _round_up(d, 16)
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _round_up(tq, 128))
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)

    def split_t(x, t, t_pad):
        x = x.reshape(b, t, heads, d).transpose(0, 2, 3, 1)  # [b, h, d, t]
        x = x.reshape(b * heads, d, t)
        return jnp.pad(x, ((0, 0), (0, d_pad - d), (0, t_pad - t)))

    qh = split_t(q, tq, tq_pad)
    kh = split_t(k, tk, tk_pad)
    vh = split_t(v, tk, tk_pad)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_full_t, tk_real=tk, scale=scale),
        grid=(b * heads, tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, d_pad, bq), lambda bb, i: (bb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, tk_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, tk_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad, bq), lambda bb, i: (bb, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * heads, d_pad, tq_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * tq_pad * tk_pad * d_pad,
            bytes_accessed=(b * heads * (tq_pad + 2 * tk_pad) * d_pad
                            * q.dtype.itemsize),
            transcendentals=b * heads * tq_pad * tk_pad,
        ),
    )(qh, kh, vh)

    out = out[:, :d, :tq].reshape(b, heads, d, tq).transpose(0, 3, 1, 2)
    return out.reshape(b, tq, c)


def _cross_view_kernel(q_ref, kr_ref, vr_ref, *rest, t_real: int,
                       scale: float, r: int, self_coeff: float,
                       exp_bf16: bool = False):
    """One (group, head, view, q-block) cell of the fused cross-view blend.

    Computes  self_coeff * attn(q, k_self, v_self)
            + (1 - self_coeff)/r * Σ_i attn(q, k_ref_i, v_ref_i)
    with q fetched from HBM ONCE for all 1+r score panels (vs 1+r separate
    attention calls — the r4-best composition re-reads q and re-writes o per
    panel and pays pallas grid overhead 5x). Transposed small-head_dim
    layout throughout (see _attn_kernel_full_t): d on sublanes (40 -> 48
    pad), tokens on lanes, scores [t_pad, bq] never leave VMEM.

    Refs: q [1,1,1,d_pad,bq]; kr/vr [1,1,r,d_pad,t_pad]; when self_coeff!=0
    two further INPUT refs ks/vs [1,1,1,d_pad,t_pad] precede the output
    (pallas passes inputs before outputs). o like q.
    """
    if self_coeff != 0.0:
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[0, 0, 0]                                       # [d_pad, bq]

    def panel(k, v):
        s = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [t_pad, bq]
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(kpos < t_real, s, _NEG_INF)
        m = s.max(axis=0, keepdims=True)
        if exp_bf16:
            # A/B knob: transcendental in bf16 (2x VPU rate); max-subtracted
            # scores are <= 0 so exp lands in [0,1] where bf16's 8-bit
            # mantissa costs ~0.4% relative — acceptable for inference,
            # gated behind the sweep-measured routing only
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = p.astype(jnp.float32).sum(axis=0, keepdims=True)
        else:
            p = jnp.exp(s - m)
            l = p.sum(axis=0, keepdims=True)
        o = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [d_pad, bq]
        return o / jnp.maximum(l, 1e-30)

    acc = 0.0
    for i in range(r):
        acc = acc + panel(kr_ref[0, 0, i], vr_ref[0, 0, i])
    acc = acc * ((1.0 - self_coeff) / r)
    if self_coeff != 0.0:
        acc = acc + self_coeff * panel(ks_ref[0, 0, 0], vs_ref[0, 0, 0])
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "num_refs", "self_coeff",
                                    "cfg_groups", "block_q", "interpret",
                                    "exp_bf16"))
def cross_view_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         heads: int, num_refs: int = 4,
                         self_coeff: float = 0.6, cfg_groups: int = 2,
                         block_q: int = 256,
                         interpret: bool = False,
                         exp_bf16: bool = False) -> jnp.ndarray:
    """Whole cross-view attention (self + ref blend) as ONE Pallas call.

    Drop-in for the body of CrossViewAttnProcessor (reference semantics:
    /root/reference/gaussctrl/utils.py:86-117 — 0.6·self + 0.4·mean of r
    per-ref attentions, per-ref softmax). q/k/v [B,T,C] with B = G·F (G CFG
    groups, F views per group, first num_refs of each group are the refs).

    Why fused: the edit scan's 4096-token level spends ~55% of the step in
    the composed einsum ref branch (r4 micro: 145.6 ms/call x7 + 39.4 self);
    one kernel computes all 1+r panels per q-block with q loaded once, the
    blend in VMEM, and one output write. Grid ordered (G, heads, F, q-blocks)
    so the per-(group,head) ref K/V block stays resident across all views'
    q-blocks. Inference-only, like the other schedules here.
    """
    b, t, c = q.shape
    g, r = cfg_groups, num_refs
    f = b // g
    d = c // heads
    d_pad = _round_up(d, 16)
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _round_up(t, 128))
    t_pad = _round_up(t, max(bq, 128))

    def split_t(x):
        # [B,T,C] -> [g, f, h, d_pad, t_pad] (d on sublanes, tokens on lanes)
        x = x.reshape(g, f, t, heads, d).transpose(0, 1, 3, 4, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d),
                           (0, t_pad - t)))

    qh = split_t(q)
    kh = split_t(k)
    vh = split_t(v)
    # refs live once per (group, head): [g, h, r, d_pad, t_pad]
    kr = kh[:, :r].transpose(0, 2, 1, 3, 4)
    vr = vh[:, :r].transpose(0, 2, 1, 3, 4)

    grid = (g, heads, f, t_pad // bq)
    qspec = pl.BlockSpec((1, 1, 1, d_pad, bq),
                         lambda gi, hi, fi, qi: (gi, fi, hi, 0, qi),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, 1, d_pad, t_pad),
                         lambda gi, hi, fi, qi: (gi, fi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, 1, r, d_pad, t_pad),
                         lambda gi, hi, fi, qi: (gi, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    operands = [qh, kr, vr]
    in_specs = [qspec, rspec, rspec]
    if self_coeff != 0.0:
        operands += [kh, vh]
        in_specs += [sspec, sspec]

    out = pl.pallas_call(
        functools.partial(_cross_view_kernel, t_real=t, scale=scale, r=r,
                          self_coeff=self_coeff, exp_bf16=exp_bf16),
        grid=grid,
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((g, f, heads, d_pad, t_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * t_pad * t_pad * d_pad
                  * (r + (1 if self_coeff != 0.0 else 0)),
            bytes_accessed=(b * heads * 4 * t_pad * d_pad * q.dtype.itemsize),
            transcendentals=b * heads * t_pad * t_pad
                            * (r + (1 if self_coeff != 0.0 else 0)),
        ),
    )(*operands)

    out = out[:, :, :, :d, :t]                    # [g, f, h, d, t]
    return out.transpose(0, 1, 4, 2, 3).reshape(b, t, c)


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_q", "block_k",
                                    "interpret", "kernel", "is_self"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    heads: int, block_q: int = 256, block_k: int = 512,
                    interpret: bool = False,
                    kernel: str = "auto",
                    is_self: bool | None = None) -> jnp.ndarray:
    """Drop-in for diffusion.nn.attention: q [B,Tq,C], k/v [B,Tk,C] -> [B,Tq,C].

    kernel: "full" = single-shot in-VMEM softmax, "stream" = online-softmax
    K/V block loop, "full_t" = transposed small-head_dim single shot
    (flash_attention_t), "auto" = full when the score panel fits the VMEM
    budget.

    is_self: hint for the auto dispatch — the transposed schedule was
    measured on SELF-attention access patterns; callers that know the shape
    is NOT self-attention (e.g. the grouped-ref branch at f=1, which is
    coincidentally square) pass False to keep the standard-layout schedule.
    None preserves the square-shape proxy for callers without the hint.
    """
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // heads
    # auto → transposed schedule for SQUARE self-attention at EVERY SD
    # head_dim (r4 micro sweep, outputs/perf_r4/micro.json, b=80: full_t
    # beats full 49.8 vs 54.8 ms at 4096 tokens/d=40, 7.0 vs 8.3 at
    # 1024/d=80, 3.2 vs 4.6 at 256/d=160). It LOSES on the tall-skinny
    # grouped-ref shape tq=f·t >> tk — 20.2 vs 15.2 ms at 1024 — so the
    # dispatch keys on squareness (plus the is_self hint when given).
    if kernel == "full_t" or (kernel == "auto" and tq == tk
                              and tq <= 4096 and is_self is not False):
        return flash_attention_t(q, k, v, heads, block_q=block_q,
                                 interpret=interpret)
    d_pad = _round_up(d, 128)
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _round_up(tq, 8))
    bk = min(block_k, _round_up(tk, 128))
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, bk)

    def split(x, t, t_pad):
        x = x.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
        x = x.reshape(b * heads, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    qh = split(q, tq, tq_pad)
    kh = split(k, tk, tk_pad)
    vh = split(v, tk, tk_pad)

    # single-shot kernel when the f32 score panel fits comfortably in VMEM
    # alongside q/k/v blocks (~16MB scoped budget); else stream K/V blocks
    vmem_bytes = (bq * tk_pad * 4                      # score panel (f32)
                  + (bq + 2 * tk_pad) * d_pad * q.dtype.itemsize)
    if kernel == "full" or (kernel == "auto"
                            and vmem_bytes <= 8 * 1024 * 1024):
        body = functools.partial(_attn_kernel_full, tk_real=tk, scale=scale)
    else:
        body = functools.partial(_flash_kernel, block_k=bk, tk_real=tk,
                                 scale=scale)
    out = pl.pallas_call(
        body,
        grid=(b * heads, tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * heads, tq_pad, d_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * tq_pad * tk_pad * d_pad,
            bytes_accessed=(b * heads * (tq_pad + 2 * tk_pad) * d_pad
                            * q.dtype.itemsize),
            transcendentals=b * heads * tq_pad * tk_pad,
        ),
    )(qh, kh, vh)

    out = out[:, :tq, :d].reshape(b, heads, tq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, tq, c)

"""Fused cross-view attention (Pallas, TPU).

The cross-view processor computes 1 self-attention plus R reference
attentions per layer (out = c·self + (1−c)/R·Σ ref_r). Done naively, each
ref branch broadcasts that ref's K/V across all F views in the batch — at
the reference operating point that is 5× the attention traffic plus
HBM-materialized [B,h,T,T] scores, and it dominates the edit step.

Kernel layout: grid (batch·head row, branch) with the branch axis minor.
The full 4096-token query row and the fp32 output accumulator stay in VMEM
across branches (fetched once per row); each branch streams exactly one K/V
buffer — the view's own, or reference r's, which is stored ONCE per CFG
group and never broadcast. Inside the kernel a q-chunk × kv-block double
loop runs the online softmax, and the blended result is written once at the
last branch.

bf16-friendly, fp32 softmax state; falls back to the unfused path off-TPU
(see processors.py routing).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fused_kernel(q_ref, kv_self_ref, kv_ref_ref, o_ref, acc_ref, *,
                  num_refs: int, self_coeff: float, block_q: int,
                  block_k: int, tk_real: int, scale: float):
    br = pl.program_id(1)
    tq, d = q_ref.shape[1], q_ref.shape[2]
    tk_pad = kv_self_ref.shape[1]
    nq = tq // block_q
    nk = tk_pad // block_k

    @pl.when(br == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    is_self = br == 0
    weight = jnp.where(is_self, self_coeff, (1.0 - self_coeff) / num_refs)
    # ControlNet mode (self_coeff = 0): the self branch is dead — skip it
    run = jnp.logical_or(jnp.logical_not(is_self), self_coeff != 0.0)

    @pl.when(run)
    def _():
        def q_chunk(iq, _):
            q = q_ref[0, pl.ds(iq * block_q, block_q), :].astype(
                jnp.float32) * scale

            def body(i, carry):
                m_prev, l_prev, acc = carry
                kv = jax.lax.cond(
                    is_self,
                    lambda: kv_self_ref[0, pl.ds(i * block_k, block_k), :],
                    lambda: kv_ref_ref[0, 0, pl.ds(i * block_k, block_k), :])
                k = kv[:, :d].astype(jnp.float32)
                v = kv[:, d:].astype(jnp.float32)
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                kpos = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                s = jnp.where(kpos < tk_real, s, _NEG_INF)
                m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc

            m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
            l0 = jnp.zeros((block_q, 1), jnp.float32)
            a0 = jnp.zeros((block_q, d), jnp.float32)
            _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
            sl = pl.ds(iq * block_q, block_q)
            acc_ref[sl, :] = acc_ref[sl, :] + weight * (
                acc / jnp.maximum(l, 1e-30))
            return 0

        jax.lax.fori_loop(0, nq, q_chunk, 0)

    @pl.when(br == num_refs)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=(
    "num_refs", "self_coeff", "cfg_groups", "heads", "block_q", "block_k",
    "interpret"))
def crossview_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_refs: int, self_coeff: float, cfg_groups: int, heads: int,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
) -> jnp.ndarray:
    """Fused c·selfattn + (1−c)·mean_r refattn. q/k/v [B,T,C], B = G·F with
    the first `num_refs` rows of each group being the reference views."""
    b, t, c = q.shape
    g, r = cfg_groups, num_refs
    f = b // g
    d = c // heads
    d_pad = _round_up(d, 128)
    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _round_up(t, 8))
    bk = min(block_k, _round_up(t, 128))
    t_padq = _round_up(t, bq)
    t_padk = _round_up(t, bk)

    def heads_major(x):  # [B,T,C] -> [H*B, T, d] (h major: row = h*B + b)
        x = x.reshape(b, t, heads, d).transpose(2, 0, 1, 3)
        return x.reshape(heads * b, t, d)

    qh = jnp.pad(heads_major(q), ((0, 0), (0, t_padq - t), (0, d_pad - d)))
    kh_p = jnp.pad(heads_major(k), ((0, 0), (0, t_padk - t), (0, d_pad - d)))
    vh_p = jnp.pad(heads_major(v), ((0, 0), (0, t_padk - t), (0, d_pad - d)))
    kv_self = jnp.concatenate([kh_p, vh_p], axis=-1)       # [HB, Tk, 2d]

    # reference K/V once per (head, group): [H*G, R, Tk, 2d]
    kg = kh_p.reshape(heads, g, f, t_padk, d_pad)[:, :, :r]
    vg = vh_p.reshape(heads, g, f, t_padk, d_pad)[:, :, :r]
    kv_refs = jnp.concatenate([kg, vg], axis=-1)           # [H, G, R, Tk, 2d]
    kv_refs = kv_refs.reshape(heads * g, r, t_padk, 2 * d_pad)

    kernel = functools.partial(_fused_kernel, num_refs=r,
                               self_coeff=self_coeff, block_q=bq, block_k=bk,
                               tk_real=t, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(heads * b, r + 1),
        in_specs=[
            pl.BlockSpec((1, t_padq, d_pad), lambda bb, br: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_padk, 2 * d_pad), lambda bb, br: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            # row bb = h*B + b_idx -> ref bank row h*G + b_idx//f;
            # constant for f consecutive rows, so fetches amortize
            pl.BlockSpec(
                (1, 1, t_padk, 2 * d_pad),
                lambda bb, br: ((bb // b) * g + (bb % b) // f,
                                jnp.maximum(br - 1, 0), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_padq, d_pad), lambda bb, br: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((heads * b, t_padq, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((t_padq, d_pad), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(qh, kv_self, kv_refs)

    out = out[:, :t, :d].reshape(heads, b, t, d).transpose(1, 2, 0, 3)
    return out.reshape(b, t, c)

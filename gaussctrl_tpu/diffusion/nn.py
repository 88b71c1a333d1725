"""Shared diffusion building blocks (flax.linen, NHWC, bf16-friendly).

Replaces the diffusers layer zoo the reference leans on
(ResnetBlock2D / Transformer2DModel / Attention with pluggable processors;
attention-override call sites at /root/reference/gaussctrl/gc_pipeline.py:162-168).
The attention-processor hook is a *function argument* threaded through the
module tree rather than runtime monkeypatching — the TPU-idiomatic equivalent
of diffusers `set_attn_processor`: the processor is static under jit, so each
(processor, shapes) combination compiles once.

Layout: NHWC (TPU conv-native). Softmax runs in fp32 regardless of compute
dtype; matmuls declare fp32 accumulation for the MXU.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# An attention processor maps (q, k, v, heads) -> attention output [B, Tq, C].
# q/k/v are post-projection, pre-head-split. Only *self*-attention layers see
# the processor; text cross-attention always uses the default path
# (the reference's processor is likewise a no-op on cross layers, utils.py:76-83).
AttnProcessor = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


def _use_flash(tq: int, tk: int, head_dim: int = 128) -> bool:
    """Flash-kernel routing: GAUSSCTRL_FLASH=1 forces, =0 disables, default
    auto — on for TPU backends at sequence lengths where streaming K/V wins.
    Wide heads (VAE's single 512-d head) stay on einsum: the whole-K/V-in-VMEM
    kernel would exceed the 16MB scoped VMEM budget. At 4096 tokens the SD
    head_dim of 40 makes einsum faster (measured 9.0 vs 11.6 ms at B=14 on
    v5e: the QK^T contraction depth dominates, and the kernel's exp/rescale
    VPU work exceeds the HBM savings), so auto caps at 2048."""
    flag = os.environ.get("GAUSSCTRL_FLASH", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # Measured on v5e (r3 .scratch/ab_attention_results.json; r4
    # outputs/perf_r4/ab.txt + ab_iso.txt): at 4096 tokens the CFG-doubled
    # edit lane prefers einsum on BOTH the self and ref branches (iso A/B:
    # +4.5 s/scan self-flash, +6.7 s ref-flash at b=80), while the no-CFG
    # b=40 inversion runs 2.0x faster under the transposed `full_t` flash
    # schedule. Routing is therefore split by LANE, not by shape alone:
    # this auto rule keeps the ≤2048 levels on flash (r1 measurement) and
    # 4096 on einsum, and the inversion lane opts into flash explicitly
    # via processors.FlashSelfAttnProcessor.
    max_tk = int(os.environ.get("GAUSSCTRL_FLASH_MAX_TK", "2048"))
    return (jax.default_backend() == "tpu" and tq >= 256 and tk >= 256
            and tk <= max_tk and head_dim <= 128)


def _scores_mb(b: int, heads: int, tq: int, tk: int) -> float:
    """HBM footprint (MB) of the f32 score tensor the einsum path implies."""
    return b * heads * tq * tk * 4 / 2**20


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Multi-head scaled dot-product attention. q [B,Tq,C], k/v [B,Tk,C]."""
    b, tq, c = q.shape
    tk = k.shape[1]
    if _use_flash(tq, tk, c // heads):
        from gaussctrl_tpu.ops.flash_attention import flash_attention
        # GAUSSCTRL_FLASH_KERNEL overrides the schedule (A/B knob:
        # "full_t" = transposed small-head_dim single shot)
        kern = os.environ.get("GAUSSCTRL_FLASH_KERNEL", "auto")
        return flash_attention(q, k, v, heads, kernel=kern)
    budget = float(os.environ.get("GAUSSCTRL_SCORES_MB", "2048"))
    if _scores_mb(b, heads, tq, tk) > budget:
        return attention_einsum_qblocked(q, k, v, heads, budget_mb=budget)
    return attention_einsum(q, k, v, heads)


def attention_einsum(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     heads: int) -> jnp.ndarray:
    """The XLA einsum attention path (fp32 softmax). Used directly by the
    cross-view processor — measured faster than per-branch flash there."""
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // heads
    q = q.reshape(b, tq, heads, d)
    k = k.reshape(b, tk, heads, d)
    v = v.reshape(b, tk, heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return out.reshape(b, tq, c).astype(q.dtype)


def attention_einsum_qblocked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              heads: int, budget_mb: float = 2048.0,
                              q_block: int | None = None) -> jnp.ndarray:
    """EXACT attention with the query axis processed in blocks.

    Memory-bounded form of `attention_einsum` for big batches at 4096
    tokens: the full-batch inversion scan (b=40, no CFG) OOMs when the
    f32 score tensor [B,h,Tq,Tk] = 21.5 GB lands in HBM at once
    (bench.py docstring, measured round 3; reference hot loop
    /root/reference/gaussctrl/gc_pipeline.py:141-145). Each lax.map
    iteration computes full softmax rows — every query block still sees
    ALL of K — so this is bit-identical exact attention (no online
    max/denominator rescaling like flash), just with peak score memory
    capped at ~budget_mb. All matmuls stay large and batched for the MXU.
    """
    b, tq, c = q.shape
    tk = k.shape[1]
    if q_block is None:
        # largest 128-multiple block whose scores fit the budget
        q_block = int(budget_mb * 2**20 / (b * heads * tk * 4))
        q_block = max(128, min(tq, q_block // 128 * 128))
    if q_block >= tq:
        return attention_einsum(q, k, v, heads)
    nb = -(-tq // q_block)
    pad = nb * q_block - tq
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
    # [nb, B, q_block, C]: padded rows attend normally and are sliced off —
    # softmax rows are independent, so real rows are unaffected
    qb = qp.reshape(b, nb, q_block, c).transpose(1, 0, 2, 3)
    out = jax.lax.map(lambda qi: attention_einsum(qi, k, v, heads), qb)
    out = out.transpose(1, 0, 2, 3).reshape(b, nb * q_block, c)
    return out[:, :tq]


def timestep_embedding(t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding. t [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal embedding to the time channel."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


class Attention(nn.Module):
    """QKV attention with an optional processor override for self-attention."""
    query_dim: int
    heads: int
    context_dim: Optional[int] = None  # None = self-attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, processor: Optional[AttnProcessor] = None):
        is_self = self.context_dim is None
        ctx = x if context is None else context
        q = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if is_self and processor is not None:
            out = processor(q, k, v, self.heads)
        else:
            out = attention(q, k, v, self.heads)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """self-attn -> text cross-attn -> geglu MLP, pre-LN residuals."""
    dim: int
    heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, processor=None):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, dtype=self.dtype, name="attn1")(
            h, processor=processor)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.dim, self.heads, context_dim=self.context_dim,
                          dtype=self.dtype, name="attn2")(h, context=context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """GroupNorm -> 1x1 in-proj -> transformer blocks over HW tokens -> 1x1 out."""
    channels: int
    heads: int
    context_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, processor=None):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        # SD-1.5 uses 1x1-conv projections; on NHWC that is a Dense over channels
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.channels, self.heads, self.context_dim,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(x, context, processor)
        x = x.reshape(b, h, w, c)
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(x)
        return x + residual


class ResnetBlock(nn.Module):
    """GN-silu-conv ×2 with additive time embedding and learned shortcut."""
    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.norm_eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.norm_eps,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)

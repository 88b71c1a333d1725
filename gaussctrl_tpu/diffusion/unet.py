"""SD-1.5 conditional UNet (flax.linen, NHWC).

TPU-native re-implementation of the `UNet2DConditionModel` the reference drives
through diffusers (/root/reference/gaussctrl/gc_pipeline.py:100-102, 209-219):
4 down blocks (3 cross-attn + 1 plain), cross-attn mid block, 4 up blocks with
skip concats, timestep MLP conditioning. Accepts ControlNet additive residuals
on every skip connection and the mid block, and threads the pluggable
self-attention processor (the cross-view hook) through every transformer.

Module names mirror the HF checkpoint layout (`down_blocks_0/resnets_1/...`)
so the weight port in `weights.py` is a mechanical rename + transpose.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gaussctrl_tpu.diffusion.config import UNetConfig
from gaussctrl_tpu.diffusion.nn import (
    Attention, Downsample, ResnetBlock, TimestepEmbedding, Transformer2D,
    Upsample, timestep_embedding,
)


class DownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, processor=None):
        cfg = self.cfg
        res_samples = []
        for j in range(cfg.layers_per_block):
            x = ResnetBlock(self.out_channels, cfg.norm_num_groups, cfg.norm_eps,
                            dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, cfg.num_heads,
                                  cfg.cross_attention_dim, cfg.transformer_layers,
                                  cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"attentions_{j}")(x, context, processor)
            res_samples.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            res_samples.append(x)
        return x, res_samples


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, processor=None):
        cfg = self.cfg
        x = ResnetBlock(self.channels, cfg.norm_num_groups, cfg.norm_eps,
                        dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2D(self.channels, cfg.num_heads, cfg.cross_attention_dim,
                          cfg.transformer_layers, cfg.norm_num_groups,
                          dtype=self.dtype, name="attentions_0")(x, context, processor)
        x = ResnetBlock(self.channels, cfg.norm_num_groups, cfg.norm_eps,
                        dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips: Sequence[jnp.ndarray], temb, context, processor=None):
        cfg = self.cfg
        for j in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips[-(j + 1)]], axis=-1)
            x = ResnetBlock(self.out_channels, cfg.norm_num_groups, cfg.norm_eps,
                            dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, cfg.num_heads,
                                  cfg.cross_attention_dim, cfg.transformer_layers,
                                  cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"attentions_{j}")(x, context, processor)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNetEncoder(nn.Module):
    """conv_in + time embedding + down blocks (shared by UNet and ControlNet)."""
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, context, processor=None, extra_in=None):
        cfg = self.cfg
        c0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, c0, cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(c0 * 4, dtype=self.dtype,
                                 name="time_embedding")(temb.astype(self.dtype))
        x = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        if extra_in is not None:  # ControlNet conditioning embedding
            x = x + extra_in
        res_samples = [x]
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            x, res = DownBlock(cfg, ch, cfg.down_block_attn[i], add_downsample=i < n - 1,
                               dtype=self.dtype, name=f"down_blocks_{i}")(
                x, temb, context, processor)
            res_samples.extend(res)
        x = MidBlock(cfg, cfg.block_out_channels[-1], dtype=self.dtype,
                     name="mid_block")(x, temb, context, processor)
        return x, res_samples, temb


class UNet(nn.Module):
    """The full noise-prediction UNet: eps = UNet(z_t, t, text)."""
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,           # [B, H, W, in_channels]
        timesteps: jnp.ndarray,        # [B]
        context: jnp.ndarray,          # [B, T_text, cross_attention_dim]
        processor=None,
        down_block_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        sample = sample.astype(self.dtype)
        context = context.astype(self.dtype)
        x, res_samples, temb = UNetEncoder(cfg, dtype=self.dtype, name="encoder")(
            sample, timesteps, context, processor)
        if down_block_residuals is not None:
            res_samples = [r + c for r, c in zip(res_samples, down_block_residuals)]
        if mid_block_residual is not None:
            x = x + mid_block_residual

        n = len(cfg.block_out_channels)
        rev_channels = tuple(reversed(cfg.block_out_channels))
        per_block = cfg.layers_per_block + 1
        for i in range(n):
            skips, res_samples = res_samples[-per_block:], res_samples[:-per_block]
            x = UpBlock(cfg, rev_channels[i], cfg.up_block_attn[i],
                        add_upsample=i < n - 1, dtype=self.dtype,
                        name=f"up_blocks_{i}")(x, skips, temb, context, processor)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)

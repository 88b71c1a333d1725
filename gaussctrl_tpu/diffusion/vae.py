"""AutoencoderKL (SD-1.5 VAE) in flax.linen, NHWC.

Replaces the diffusers VAE the reference uses to move between image and latent
space (encode at /root/reference/gaussctrl/gc_pipeline.py:239-246, ×0.18215;
decode inside the ControlNet pipeline). Encoding is deterministic — the
reference takes `latent_dist.mean`, so only the mean channels are used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gaussctrl_tpu.diffusion.config import VAEConfig
from gaussctrl_tpu.diffusion.nn import Attention, ResnetBlock, Upsample


class VAEAttnBlock(nn.Module):
    """Single-head self-attention over HW tokens (VAE mid block)."""
    channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        x = Attention(self.channels, heads=1, dtype=self.dtype, name="attn")(x)
        return x.reshape(b, h, w, c) + residual


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.norm_num_groups, norm_eps=1e-6,
                        dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttnBlock(self.channels, self.norm_num_groups, dtype=self.dtype,
                         name="attentions_0")(x)
        return ResnetBlock(self.channels, self.norm_num_groups, norm_eps=1e-6,
                           dtype=self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_num_groups, norm_eps=1e-6,
                                dtype=self.dtype,
                                name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                # SD VAE downsample: asymmetric (0,1) pad then stride-2 valid conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_blocks_{i}_downsample")(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        dtype=self.dtype, name="mid_block")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = VAEMidBlock(rev[0], cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block")(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups, norm_eps=1e-6,
                                dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class VAE(nn.Module):
    """encode(images in [-1,1]) -> scaled latent mean; decode(latent) -> image."""
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B,H,W,3] in [-1,1] -> latents [B,H/8,W/8,4] (mean × scale)."""
        moments = self.quant_conv(self.encoder(images.astype(self.dtype)))
        mean = moments[..., : self.cfg.latent_channels]
        return mean * self.cfg.scaling_factor

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (scaled) -> images [B,H,W,3] in [-1,1]."""
        z = self.post_quant_conv(latents.astype(self.dtype) / self.cfg.scaling_factor)
        return self.decoder(z)

    def __call__(self, images):
        return self.decode(self.encode(images))

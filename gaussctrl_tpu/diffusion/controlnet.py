"""Depth ControlNet (flax.linen, NHWC).

TPU-native `lllyasviel/sd-controlnet-depth` equivalent
(/root/reference/gaussctrl/gc_pipeline.py:100): a trained copy of the UNet
encoder plus a conv ladder embedding the 3-channel disparity hint
(512px -> latent resolution), emitting zero-conv residuals for every UNet skip
connection and the mid block. The reference installs a *pure-reference*
cross-view processor on it (`self_attn_coeff=0`, gc_pipeline.py:166-168);
here that is just a different processor argument.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gaussctrl_tpu.diffusion.config import ControlNetConfig
from gaussctrl_tpu.diffusion.unet import UNetEncoder

_zero_init = nn.initializers.zeros_init()


class CondEmbedding(nn.Module):
    """Hint image -> conv_in-resolution feature map (stride-2 ladder)."""
    cfg: ControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        chans = self.cfg.cond_embed_channels
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(chans) - 1):
            x = nn.Conv(chans[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(chans[i + 1], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.cfg.unet.block_out_channels[0], (3, 3), padding=1,
                       kernel_init=_zero_init, dtype=self.dtype, name="conv_out")(x)


class ControlNet(nn.Module):
    cfg: ControlNetConfig = ControlNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,        # [B, h, w, 4] latent
        timesteps: jnp.ndarray,     # [B]
        context: jnp.ndarray,       # [B, T_text, D]
        cond_image: jnp.ndarray = None,  # [B, H, W, 3] disparity hint in [0,1]
        conditioning_scale: float = 1.0,
        processor=None,
        hint: jnp.ndarray = None,   # precomputed CondEmbedding output
    ):
        """`hint` (from `embed_hint`) bypasses the CondEmbedding ladder: the
        hint is timestep-independent, so the 20-step DDIM scans compute it
        ONCE outside the scan instead of re-running the 512px conv ladder
        every step on the CFG-doubled batch (exact same numerics)."""
        ucfg = self.cfg.unet
        sample = sample.astype(self.dtype)
        context = context.astype(self.dtype)
        if hint is None:
            hint = CondEmbedding(self.cfg, dtype=self.dtype,
                                 name="cond_embedding")(
                cond_image.astype(self.dtype))
        else:
            hint = hint.astype(self.dtype)
        mid, res_samples, _ = UNetEncoder(ucfg, dtype=self.dtype, name="encoder")(
            sample, timesteps, context, processor, extra_in=hint)

        down_res = tuple(
            nn.Conv(r.shape[-1], (1, 1), kernel_init=_zero_init, dtype=self.dtype,
                    name=f"controlnet_down_blocks_{i}")(r) * conditioning_scale
            for i, r in enumerate(res_samples)
        )
        mid_res = nn.Conv(mid.shape[-1], (1, 1), kernel_init=_zero_init,
                          dtype=self.dtype, name="controlnet_mid_block")(mid)
        return down_res, mid_res * conditioning_scale

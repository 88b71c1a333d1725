"""Latent diffusion stack: SD-1.5 UNet + depth ControlNet + VAE + CLIP text.

TPU-native replacement for the reference's diffusers dependency
(/root/reference/gaussctrl/gc_pipeline.py:92-102): flax.linen models in NHWC
layout, bf16 compute, pure-function DDIM forward/inverse steps scanned under
jit, and a pluggable attention-processor hook carrying the cross-view
reference attention (/root/reference/gaussctrl/utils.py:44-133).
"""

from gaussctrl_tpu.diffusion.config import (
    UNetConfig, ControlNetConfig, VAEConfig, CLIPTextConfig, SDConfig,
)
from gaussctrl_tpu.diffusion.ddim import DDIMSchedule, ddim_step, ddim_inverse_step
from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor

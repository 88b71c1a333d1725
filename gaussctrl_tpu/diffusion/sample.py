"""Inference loops: ControlNet-guided DDIM denoise and DDIM inversion.

Functional replacement for the reference's `StableDiffusionControlNetPipeline`
calls (/root/reference/gaussctrl/gc_pipeline.py:141-145 inversion, 209-219
edit denoise): the 20-step loop is a `lax.scan` over precomputed timestep
pairs, CFG is an explicit doubled batch ([uncond | cond], the layout the
cross-view processor's `cfg_groups=2` expects), and the ControlNet + UNet
evaluation is one fused jit region per step.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gaussctrl_tpu.diffusion.clip import CLIPTextModel
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.controlnet import ControlNet
from gaussctrl_tpu.diffusion.ddim import (
    DDIMSchedule, ddim_inverse_step, ddim_step, timestep_pairs,
)
from gaussctrl_tpu.diffusion.unet import UNet
from gaussctrl_tpu.diffusion.vae import VAE


@dataclasses.dataclass(frozen=True)
class SDModels:
    """Static module bundle (params travel separately as a pytree)."""
    cfg: SDConfig
    unet: UNet
    controlnet: ControlNet
    vae: VAE
    text: CLIPTextModel

    @classmethod
    def create(cls, cfg: SDConfig, dtype=jnp.float32) -> "SDModels":
        return cls(
            cfg=cfg,
            unet=UNet(cfg.unet, dtype=dtype),
            controlnet=ControlNet(cfg.controlnet, dtype=dtype),
            vae=VAE(cfg.vae, dtype=dtype),
            text=CLIPTextModel(cfg.text, dtype=dtype),
        )

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        """Random init (tests / shape reference for the weight port)."""
        cfg = self.cfg
        s = cfg.sample_size
        ku, kc, kv, kt = jax.random.split(key, 4)
        lat = jnp.zeros((1, s, s, cfg.unet.in_channels))
        ctx = jnp.zeros((1, cfg.text.max_position_embeddings,
                         cfg.unet.cross_attention_dim))
        t = jnp.zeros((1,), jnp.int32)
        img = jnp.zeros((1, s * 8, s * 8, 3))
        return {
            "unet": self.unet.init(ku, lat, t, ctx)["params"],
            "controlnet": self.controlnet.init(kc, lat, t, ctx, img)["params"],
            "vae": self.vae.init(kv, img)["params"],
            "text": self.text.init(
                kt, jnp.zeros((1, cfg.text.max_position_embeddings), jnp.int32)
            )["params"],
        }


def encode_text(models: SDModels, params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return models.text.apply({"params": params["text"]}, input_ids)


def vae_encode(models: SDModels, params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B,H,W,3] in [0,1] -> scaled latents (gc_pipeline.py:239-246)."""
    return models.vae.apply({"params": params["vae"]}, images * 2.0 - 1.0,
                            method=VAE.encode)


def vae_decode(models: SDModels, params, latents: jnp.ndarray) -> jnp.ndarray:
    """scaled latents -> images [B,H,W,3] in [0,1]."""
    img = models.vae.apply({"params": params["vae"]}, latents, method=VAE.decode)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


def embed_hint(models: SDModels, params, cond_image: jnp.ndarray) -> jnp.ndarray:
    """Run the ControlNet's CondEmbedding ladder alone. The hint is
    timestep-independent, so the DDIM scans call this ONCE and thread the
    result through every step (the diffusers pipeline re-embeds the 512px
    hint at each of the 20 steps on the CFG-doubled batch)."""
    from gaussctrl_tpu.diffusion.controlnet import CondEmbedding
    emb = CondEmbedding(models.cfg.controlnet, dtype=models.controlnet.dtype)
    return emb.apply(
        {"params": params["controlnet"]["cond_embedding"]},
        cond_image.astype(models.controlnet.dtype))


def eps_model(
    models: SDModels, params,
    latents: jnp.ndarray,          # [B, h, w, 4]
    t: jnp.ndarray,                # scalar timestep
    context: jnp.ndarray,          # [B, T, D]
    cond_image: jnp.ndarray = None,  # [B, H, W, 3]
    conditioning_scale: float = 1.0,
    unet_processor=None,
    controlnet_processor=None,
    hint: jnp.ndarray = None,      # precomputed embed_hint output
) -> jnp.ndarray:
    """ControlNet residuals + UNet epsilon prediction for one timestep."""
    tb = jnp.broadcast_to(t, (latents.shape[0],))
    down_res, mid_res = models.controlnet.apply(
        {"params": params["controlnet"]}, latents, tb, context, cond_image,
        conditioning_scale, controlnet_processor, hint)
    return models.unet.apply(
        {"params": params["unet"]}, latents, tb, context,
        unet_processor, down_res, mid_res)


def invert(
    models: SDModels, params, sched: DDIMSchedule,
    latents: jnp.ndarray,          # [B, h, w, 4] z_0 (VAE-encoded renders)
    context: jnp.ndarray,          # [B, T, D] reverse-prompt embedding
    cond_image: jnp.ndarray,       # [B, H, W, 3] disparity
    num_steps: int = 20,
    conditioning_scale: float = 1.0,
    easyinv_rho: float = 0.0,
    easyinv_t_min: int = 400,
    unet_processor=None,
    controlnet_processor=None,
) -> jnp.ndarray:
    """DDIM inversion z_0 -> z_T, guidance 0 (single conditional pass;
    gc_pipeline.py:141-145). The default processors are the auto-routed
    einsum path; production passes `FlashSelfAttnProcessor("full_t")` for
    both — the no-CFG inversion scan is where the transposed flash
    schedule wins (outputs/perf_r4/ab.txt; the CFG edit lane prefers
    einsum, see processors.py).

    `easyinv_rho` > 0 enables the EasyInv refinement (arXiv 2408.05159,
    PAPERS.md): at high-noise timesteps (t >= easyinv_t_min) the new iterate
    is blended with the previous one, x <- rho*x_new + (1-rho)*x_prev, which
    damps the inversion's fixed-point error without extra model evals.
    rho = 0 is the exact reference behavior."""
    ts, ts_prev = timestep_pairs(num_steps)
    # hint hoisting: embed the (timestep-independent) hint ONCE outside the
    # scan. GAUSSCTRL_HOIST_HINT=0 restores the per-step embedding for A/B
    # (scripts/perf_r4_ab.py) — numerics are identical either way.
    hoist = os.environ.get("GAUSSCTRL_HOIST_HINT", "1") != "0"
    hint = embed_hint(models, params, cond_image) if hoist else None
    cimg = None if hoist else cond_image

    def step(x, tp):
        t, t_prev = tp
        eps = eps_model(models, params, x, t, context, cimg,
                        conditioning_scale, unet_processor,
                        controlnet_processor, hint=hint)
        x_new = ddim_inverse_step(sched, x, eps.astype(x.dtype), t, t_prev)
        if easyinv_rho > 0.0:
            x_new = jnp.where(t >= easyinv_t_min,
                              easyinv_rho * x_new + (1 - easyinv_rho) * x,
                              x_new)
        return x_new, None

    # inversion walks the denoise pairs in reverse (ascending t)
    x, _ = jax.lax.scan(step, latents, (ts[::-1], ts_prev[::-1]))
    return x


def denoise(
    models: SDModels, params, sched: DDIMSchedule,
    latents: jnp.ndarray,          # [B, h, w, 4] z_T (inverted)
    context_pos: jnp.ndarray,      # [B, T, D] edit prompt
    context_neg: jnp.ndarray,      # [B, T, D] negative prompt
    cond_image: jnp.ndarray,       # [B, H, W, 3] disparity
    guidance_scale: float = 5.0,
    num_steps: int = 20,
    conditioning_scale: float = 1.0,
    unet_processor=None,
    controlnet_processor=None,
) -> jnp.ndarray:
    """CFG DDIM denoise z_T -> z_0' (eta=0). Batch doubles to [uncond | cond]
    inside each step, matching the cross-view processor's group layout."""
    ts, ts_prev = timestep_pairs(num_steps)
    guided = guidance_scale > 1.0
    context = jnp.concatenate([context_neg, context_pos]) if guided else context_pos
    # hint embedding: once (not per scan step), on the UNDOUBLED batch (both
    # CFG halves share the hint — the reference embeds the doubled batch).
    # GAUSSCTRL_HOIST_HINT=0 restores per-step embedding for A/B.
    hoist = os.environ.get("GAUSSCTRL_HOIST_HINT", "1") != "0"
    if hoist:
        hint1 = embed_hint(models, params, cond_image)
        hint = jnp.concatenate([hint1, hint1]) if guided else hint1
        cimg = None
    else:
        hint = None
        cimg = jnp.concatenate([cond_image, cond_image]) if guided \
            else cond_image

    def step(x, tp):
        t, t_prev = tp
        xin = jnp.concatenate([x, x]) if guided else x
        eps = eps_model(models, params, xin, t, context, cimg,
                        conditioning_scale, unet_processor,
                        controlnet_processor, hint=hint)
        if guided:
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        return ddim_step(sched, x, eps.astype(x.dtype), t, t_prev), None

    x, _ = jax.lax.scan(step, latents, (ts, ts_prev))
    return x

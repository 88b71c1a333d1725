"""DDIM forward / inverse steps as pure functions.

Replaces diffusers' DDIMScheduler / DDIMInverseScheduler, which the reference
hot-swaps on one pipeline object (/root/reference/gaussctrl/gc_pipeline.py:
97-98, 141, 162). Here both directions are stateless functions over a shared
alpha table, driven by precomputed (t, t_prev) index pairs — scan-friendly and
exactly mutually inverse: `invert` then `denoise` with the same epsilon model
reproduces the input latent when eps depends only on t (property-tested).

Semantics pinned to the SD-1.5 scheduler config: scaled_linear betas
8.5e-4 → 1.2e-2, 1000 train steps, steps_offset=1, "leading" spacing, eta=0
(gc_pipeline.py:119: eta=0), epsilon prediction, clip_sample off,
set_alpha_to_one off (final alpha = alphas_cumprod[0]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DDIMSchedule:
    alphas_cumprod: jnp.ndarray      # [num_train_timesteps]
    final_alpha_cumprod: jnp.ndarray  # scalar; used when t_prev < 0

    @classmethod
    def sd15(cls, num_train_timesteps: int = 1000, beta_start: float = 0.00085,
             beta_end: float = 0.012) -> "DDIMSchedule":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        return cls(alphas_cumprod=jnp.asarray(ac, jnp.float32),
                   final_alpha_cumprod=jnp.asarray(ac[0], jnp.float32))

    def alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t], falling back to the final alpha for t < 0."""
        safe = jnp.clip(t, 0, self.alphas_cumprod.shape[0] - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe], self.final_alpha_cumprod)


def timestep_pairs(num_inference_steps: int, num_train_timesteps: int = 1000,
                   steps_offset: int = 1):
    """(t, t_prev) pairs in *denoise* order (descending t), "leading" spacing.

    num_inference_steps=20 -> t = [951, 901, ..., 1], t_prev = t - 50
    (the last t_prev is negative -> final alpha). Inversion iterates the same
    pairs reversed: from state at t_prev, produce state at t.
    """
    ratio = num_train_timesteps // num_inference_steps
    t = (np.arange(num_inference_steps) * ratio).round().astype(np.int32)[::-1]
    t = t + steps_offset
    return jnp.asarray(t.copy()), jnp.asarray(t - ratio)


def pred_x0(sched: DDIMSchedule, x, eps, t):
    """Epsilon-parameterized clean-sample estimate at timestep t."""
    a = sched.alpha(t).astype(x.dtype)
    return (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)


def ddim_step(sched: DDIMSchedule, x, eps, t, t_prev):
    """One deterministic (eta=0) denoise step: state at t -> state at t_prev."""
    a_prev = sched.alpha(t_prev).astype(x.dtype)
    x0 = pred_x0(sched, x, eps, t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def ddim_inverse_step(sched: DDIMSchedule, x, eps, t, t_prev):
    """One inversion step: state at t_prev -> state at t.

    eps is the model output evaluated at (x, t) — matching the reference
    pipeline, which feeds the *target* timestep from the inverse scheduler's
    ascending list to the UNet.
    """
    a_t = sched.alpha(t).astype(x.dtype)
    x0 = pred_x0(sched, x, eps, t_prev)
    return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * eps

"""Image losses for 3DGS re-optimization.

splatfacto's inherited loss (SURVEY.md §2.2 SplatfactoModel row): total =
(1 - λ)·L1 + λ·(1 - SSIM) with λ = 0.2. SSIM is the standard 11×11 gaussian
window (σ=1.5) variant, implemented as depthwise convolutions that XLA fuses
onto the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SSIM_LAMBDA = 0.2


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D filter. img [H,W,C], kernel [k,k].

    precision=HIGHEST is load-bearing: on TPU, f32 convs run one bf16 pass
    under the DEFAULT precision, and SSIM's variance terms E[x²]−μ² then
    cancel catastrophically on low-variance windows — on the face scene the
    computed s00+s11 dipped to −1.5e-3 (beyond c2=9e-4), sending per-pixel
    SSIM ratios to ±1000, the mean to 1.0417 (the r4 step-1000 "divergence",
    outputs/face_r5/), and garbage gradients into 5% of the pixels every
    step. The 11×11 depthwise conv is bandwidth-trivial next to
    rasterization, so the 6-pass f32 emulation costs nothing measurable."""
    c = img.shape[-1]
    k = kernel.shape[0]
    lhs = img[None].transpose(0, 3, 1, 2)                  # [1,C,H,W]
    rhs = jnp.broadcast_to(kernel, (c, 1, k, k))           # [C,1,k,k]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return out[0].transpose(1, 2, 0)


def ssim(img0: jnp.ndarray, img1: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an [H,W,C] image pair.

    The 11×11 window shrinks (to the next odd size ≤ min(H, W)) when the
    image is smaller than the window: the VALID conv would otherwise produce
    an EMPTY output and `mean` of zero elements is silently NaN — hit by the
    pretrain resolution ramp on small portrait views (a 32×48 view trains at
    8×12 during the 1/4-res phase), where the NaN reached the loss and
    tripped the divergence sentinel at step 0."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    k = min(11, img0.shape[0], img0.shape[1])
    kernel = _gaussian_kernel(k - (1 - k % 2))
    mu0 = _filter2d(img0, kernel)
    mu1 = _filter2d(img1, kernel)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    # variances are non-negative analytically; the floor discards the last
    # float-roundoff excursions so the denominator factor stays ≥ c2 > 0
    # (belt-and-braces on top of the HIGHEST-precision convs)
    s00 = jnp.maximum(_filter2d(img0 * img0, kernel) - mu00, 0.0)
    s11 = jnp.maximum(_filter2d(img1 * img1, kernel) - mu11, 0.0)
    s01 = _filter2d(img0 * img1, kernel) - mu01
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


def splat_loss(pred: jnp.ndarray, gt: jnp.ndarray,
               ssim_lambda: float = SSIM_LAMBDA):
    """(loss, metrics) for one view pair [H,W,3]."""
    l1 = jnp.mean(jnp.abs(gt - pred))
    sim = ssim(pred, gt)
    loss = (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - sim)
    psnr = -10.0 * jnp.log10(jnp.mean((gt - pred) ** 2) + 1e-10)
    return loss, {"l1": l1, "ssim": sim, "psnr": psnr, "loss": loss}

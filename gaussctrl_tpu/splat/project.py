"""EWA gaussian projection — pure-XLA, fully differentiable.

TPU-native replacement for gsplat's CUDA `project_gaussians`
(/root/reference/gaussctrl/gc_model.py:140-154). All N gaussians are
transformed in one batched pass (VPU-friendly elementwise math; no per-gaussian
kernel launches): quat→rotation, Σ = R S Sᵀ Rᵀ, perspective Jacobian with the
1.3·tan(fov/2) frustum clamp, 2D covariance + 0.3 low-pass, conic inversion,
3σ screen radius, near-plane cull. Differentiable end-to-end by construction
(the rasterizer stop-gradients the integer binning quantities only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Projected(NamedTuple):
    xys: jnp.ndarray      # [N, 2] pixel-space centers
    depths: jnp.ndarray   # [N] view-space z
    radii: jnp.ndarray    # [N] float 3σ screen radii (0 ⇒ culled)
    conics: jnp.ndarray   # [N, 3] upper-tri inverse 2D covariance (a, b, c)
    cov2d: jnp.ndarray    # [N, 3] upper-tri 2D covariance


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] (w,x,y,z) unnormalized → [N, 3, 3] rotation matrices."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """[N,3] linear-space scales + quats → [N, 3, 3] world covariance."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means: jnp.ndarray,      # [N, 3]
    scales: jnp.ndarray,     # [N, 3] linear-space (exp already applied)
    quats: jnp.ndarray,      # [N, 4]
    viewmat: jnp.ndarray,    # [4, 4] world→camera
    fx, fy, cx, cy,
    width: int, height: int,
    clip_thresh: float = 0.01,
    blur: float = 0.3,
) -> Projected:
    W_rot = viewmat[:3, :3]
    p_view = means @ W_rot.T + viewmat[:3, 3]
    tz = p_view[:, 2]
    valid = tz > clip_thresh
    tz_safe = jnp.where(valid, tz, 1.0)

    # frustum-clamped tangent-plane coords for the Jacobian
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz_safe, -lim_x, lim_x) * tz_safe
    ty = jnp.clip(p_view[:, 1] / tz_safe, -lim_y, lim_y) * tz_safe

    cov3d = compute_cov3d(scales, quats)

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    zeros = jnp.zeros_like(tz)
    # J: [N, 2, 3] perspective Jacobian at the clamped point
    J = jnp.stack(
        [
            jnp.stack([fx * rz, zeros, -fx * tx * rz2], -1),
            jnp.stack([zeros, fy * rz, -fy * ty * rz2], -1),
        ],
        axis=-2,
    )
    T = J @ W_rot  # [N, 2, 3]
    cov2d_m = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # [N, 2, 2]
    a = cov2d_m[:, 0, 0] + blur
    b = cov2d_m[:, 0, 1]
    c = cov2d_m[:, 1, 1] + blur

    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    xys = jnp.stack(
        [fx * p_view[:, 0] * rz + cx, fy * p_view[:, 1] * rz + cy], -1
    )

    ok = valid & (det > 0)
    radius = jnp.where(ok, radius, 0.0)
    return Projected(
        xys=xys,
        depths=tz,
        radii=radius,
        conics=conic,
        cov2d=jnp.stack([a, b, c], -1),
    )

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
    opacities: jnp.ndarray | None = None,   # [N] post-sigmoid (optional)
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

    # --- scalar-channel (structure-of-arrays) covariance chain.
    # [N,3,3] batched 3x3 matmuls lower onto the TPU as tiny dot_generals
    # with terrible utilization (measured 36 ms at 102k gaussians for ~10
    # MFLOP of math); spelled out per channel the whole chain is one fused
    # VPU loop. M = R·diag(s): Σ3d = M Mᵀ, T = J W, Σ2d = T Σ3d Tᵀ.
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-8)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    m00 = (1 - 2 * (qy * qy + qz * qz)) * sx
    m01 = (2 * (qx * qy - qw * qz)) * sy
    m02 = (2 * (qx * qz + qw * qy)) * sz
    m10 = (2 * (qx * qy + qw * qz)) * sx
    m11 = (1 - 2 * (qx * qx + qz * qz)) * sy
    m12 = (2 * (qy * qz - qw * qx)) * sz
    m20 = (2 * (qx * qz - qw * qy)) * sx
    m21 = (2 * (qy * qz + qw * qx)) * sy
    m22 = (1 - 2 * (qx * qx + qy * qy)) * sz
    # world covariance Σ = M Mᵀ (symmetric, 6 channels)
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # rows of T = J @ W_rot: t0 = fx·rz·w0 − fx·tx·rz²·w2,
    #                        t1 = fy·rz·w1 − fy·ty·rz²·w2
    w0x, w0y, w0z = W_rot[0, 0], W_rot[0, 1], W_rot[0, 2]
    w1x, w1y, w1z = W_rot[1, 0], W_rot[1, 1], W_rot[1, 2]
    w2x, w2y, w2z = W_rot[2, 0], W_rot[2, 1], W_rot[2, 2]
    a0 = fx * rz
    a2 = -fx * tx * rz2
    b1 = fy * rz
    b2 = -fy * ty * rz2
    t0x = a0 * w0x + a2 * w2x
    t0y = a0 * w0y + a2 * w2y
    t0z = a0 * w0z + a2 * w2z
    t1x = b1 * w1x + b2 * w2x
    t1y = b1 * w1y + b2 * w2y
    t1z = b1 * w1z + b2 * w2z
    # Σ2d = T Σ Tᵀ via u = Σ tᵢ
    u0x = c00 * t0x + c01 * t0y + c02 * t0z
    u0y = c01 * t0x + c11 * t0y + c12 * t0z
    u0z = c02 * t0x + c12 * t0y + c22 * t0z
    a = t0x * u0x + t0y * u0y + t0z * u0z + blur
    b = t1x * u0x + t1y * u0y + t1z * u0z
    u1x = c00 * t1x + c01 * t1y + c02 * t1z
    u1y = c01 * t1x + c11 * t1y + c12 * t1z
    u1z = c02 * t1x + c12 * t1y + c22 * t1z
    c = t1x * u1x + t1y * u1y + t1z * u1z + blur

    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam1 = mid + disc
    # opacity-aware effective radius: the footprint ends where peak alpha
    # falls below the blend threshold, alpha = opac·exp(-r²/2σ²) < 1/255 —
    # pale gaussians get honest (much smaller) footprints, which both
    # shrinks tile lists and keeps them inside the static tile windows
    # (3σ splats cut at a window border showed as rectangular artifacts)
    sigma = jnp.sqrt(jnp.maximum(lam1, 0.0))
    if opacities is not None:
        mult = jnp.sqrt(2.0 * jnp.log(jnp.maximum(opacities * 255.0, 1e-6)))
        radius = jnp.ceil(jnp.minimum(3.0, mult) * sigma)
        radius = jnp.where(opacities * 255.0 > 1.0, radius, 0.0)
    else:
        radius = jnp.ceil(3.0 * sigma)

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

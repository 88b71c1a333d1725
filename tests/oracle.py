"""NumPy reference implementations (oracles) for the splat kernels.

Brute-force, per-pixel, trivially-auditable versions of projection and
alpha-blend rasterization mirroring the semantics documented in
gaussctrl_tpu/splat/{project,rasterize}.py. Test scenes are sized so the
static capacity / tile-window limits in the fast path never bind.
"""

import numpy as np

ALPHA_THRESH = 1.0 / 255.0
T_EPS = 1e-4


def quat_to_rotmat_np(q):
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def project_np(means, scales, quats, viewmat, fx, fy, cx, cy, W, H,
               clip_thresh=0.01, blur=0.3):
    n = means.shape[0]
    xys = np.zeros((n, 2))
    depths = np.zeros(n)
    radii = np.zeros(n)
    conics = np.zeros((n, 3))
    tan_fovx = 0.5 * W / fx
    tan_fovy = 0.5 * H / fy
    for i in range(n):
        R = quat_to_rotmat_np(quats[i])
        M = R * scales[i][None, :]
        cov3d = M @ M.T
        t = viewmat[:3, :3] @ means[i] + viewmat[:3, 3]
        depths[i] = t[2]
        if t[2] <= clip_thresh:
            continue
        lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
        tx = min(lim_x, max(-lim_x, t[0] / t[2])) * t[2]
        ty = min(lim_y, max(-lim_y, t[1] / t[2])) * t[2]
        J = np.array([
            [fx / t[2], 0, -fx * tx / t[2] ** 2],
            [0, fy / t[2], -fy * ty / t[2] ** 2],
        ])
        T = J @ viewmat[:3, :3]
        cov2d = T @ cov3d @ T.T
        a = cov2d[0, 0] + blur
        b = cov2d[0, 1]
        c = cov2d[1, 1] + blur
        det = a * c - b * b
        if det <= 0:
            continue
        conics[i] = np.array([c, -b, a]) / det
        mid = 0.5 * (a + c)
        disc = np.sqrt(max(mid * mid - det, 0.1))
        radii[i] = np.ceil(3.0 * np.sqrt(max(mid + disc, 0.0)))
        xys[i] = [fx * t[0] / t[2] + cx, fy * t[1] / t[2] + cy]
    return xys, depths, radii, conics


def rasterize_np(xys, depths, radii, conics, colors, opacities, background,
                 H, W, tile_size=16):
    """Per-pixel brute force with the same tile-footprint gating as the fast path."""
    n = xys.shape[0]
    ch = colors.shape[-1]
    ntx = (W + tile_size - 1) // tile_size
    nty = (H + tile_size - 1) // tile_size
    tmin_x = np.clip(np.floor((xys[:, 0] - radii) / tile_size), 0, ntx - 1).astype(int)
    tmin_y = np.clip(np.floor((xys[:, 1] - radii) / tile_size), 0, nty - 1).astype(int)
    tmax_x = np.clip(np.ceil((xys[:, 0] + radii + 1) / tile_size), 1, ntx).astype(int)
    tmax_y = np.clip(np.ceil((xys[:, 1] + radii + 1) / tile_size), 1, nty).astype(int)

    order = np.argsort(depths, kind="stable")
    img = np.zeros((H, W, ch))
    alpha_out = np.zeros((H, W))
    for py in range(H):
        for px in range(W):
            tx, ty = px // tile_size, py // tile_size
            T = 1.0
            acc = np.zeros(ch)
            for i in order:
                if radii[i] <= 0:
                    continue
                if not (tmin_x[i] <= tx < tmax_x[i] and tmin_y[i] <= ty < tmax_y[i]):
                    continue
                dx = xys[i, 0] - (px + 0.5)
                dy = xys[i, 1] - (py + 0.5)
                a, b, c = conics[i]
                sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                if sigma < 0:
                    continue
                al = min(0.999, opacities[i] * np.exp(-sigma))
                if al < ALPHA_THRESH:
                    continue
                w = al * T if T > T_EPS else 0.0
                acc += w * colors[i]
                T *= 1.0 - al
            img[py, px] = acc + T * background
            alpha_out[py, px] = 1.0 - T
    return img, alpha_out

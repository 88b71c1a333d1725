"""Scene → image rendering (the GaussCtrlModel.get_outputs equivalent).

Mirrors the reference model's render path
(/root/reference/gaussctrl/gc_model.py:57-206) with one TPU-first change: RGB
and depth are composited in a single fused 4-channel rasterization pass
instead of two separate rasterize calls (gc_model.py:174-202), halving binning
and blending traffic. Depth is alpha-normalized with the same 1000.0 far-fill
contract (gc_model.py:203-204).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussctrl_tpu.cameras.camera import Cameras, view_matrix
from gaussctrl_tpu.splat.project import project_gaussians
from gaussctrl_tpu.splat.rasterize import RasterConfig, rasterize
from gaussctrl_tpu.splat.scene import GaussianScene
from gaussctrl_tpu.splat.sh import eval_sh


def render_rgbd(
    scene: GaussianScene,
    c2w: jnp.ndarray,          # [3, 4]
    fx, fy, cx, cy,
    width: int,
    height: int,
    background: jnp.ndarray,   # [3]
    sh_degree: int | None = None,
    cfg: RasterConfig = RasterConfig(),
    return_stats: bool = False,
    xys_shift: jnp.ndarray | None = None,
):
    """Render one view. Returns dict(rgb [H,W,3], depth [H,W,1], accumulation [H,W,1]).

    `sh_degree` is the *active* degree (progressive schedule handled by the
    caller as in gc_model.py:165); None ⇒ the scene's full degree. With
    `return_stats` the dict gains "stats" (rasterizer occupancy counters,
    see rasterize). `xys_shift` [N,2] (zeros) is added to the projected
    centers — differentiating wrt it yields the EXACT pixel-space positional
    gradient (splatfacto's densification statistic) without re-deriving the
    projection chain."""
    if sh_degree is None:
        sh_degree = scene.sh_degree
    viewmat = view_matrix(c2w)
    opac = jax.nn.sigmoid(scene.opacities[:, 0])
    proj = project_gaussians(
        means=scene.means,
        scales=jnp.exp(scene.scales),
        quats=scene.quats,
        viewmat=viewmat,
        fx=fx, fy=fy, cx=cx, cy=cy,
        width=width, height=height,
        opacities=jax.lax.stop_gradient(opac),
    )
    # view-dependent color (gc_model.py:162-167)
    cam_origin = c2w[:3, 3]
    viewdirs = scene.means - cam_origin[None, :]
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True).clip(1e-8)
    rgbs = eval_sh(sh_degree, jax.lax.stop_gradient(viewdirs), scene.colors)
    rgbs = jnp.clip(rgbs + 0.5, 0.0, None)

    # fused channels: [r, g, b, depth-premultiplied]
    chans = jnp.concatenate([rgbs, proj.depths[:, None]], axis=-1)
    bg4 = jnp.concatenate([background, jnp.zeros((1,), background.dtype)])
    xys = proj.xys if xys_shift is None else proj.xys + xys_shift
    out = rasterize(
        xys, proj.depths, proj.radii, proj.conics,
        chans, opac, bg4, height, width, cfg, return_stats=return_stats,
    )
    img, alpha = out[0], out[1]
    rgb = jnp.clip(img[..., :3], None, 1.0)
    # alpha-normalized depth, 1000 where nothing hit (gc_model.py:203-204)
    depth = jnp.where(alpha > 0, img[..., 3] / jnp.maximum(alpha, 1e-10), 1000.0)
    result = {
        "rgb": rgb,
        "depth": depth[..., None],
        "accumulation": alpha[..., None],
    }
    if return_stats:
        result["stats"] = out[2]
    return result


@partial(jax.jit, static_argnames=("sh_degree", "cfg"))
def render_camera(
    scene: GaussianScene,
    cameras: Cameras,
    cam_idx: jnp.ndarray,
    background: jnp.ndarray,
    sh_degree: int | None = None,
    cfg: RasterConfig = RasterConfig(),
):
    """Render the `cam_idx`-th camera of a batch (dynamic index, static shapes)."""
    from gaussctrl_tpu.splat.rasterize import resolve_auto_blend
    cfg = resolve_auto_blend(cfg)  # always a single-view call (callers loop)
    c2w = cameras.c2w[cam_idx]
    return render_rgbd(
        scene, c2w,
        cameras.fx[cam_idx], cameras.fy[cam_idx],
        cameras.cx[cam_idx], cameras.cy[cam_idx],
        cameras.width, cameras.height, background, sh_degree, cfg,
    )

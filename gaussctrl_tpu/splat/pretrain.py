"""From-scratch 3DGS pre-training (the `ns-train splatfacto` role).

The reference assumes a splatfacto scene trained for 30k steps by nerfstudio
(/root/reference/README.md:100-113); this module makes the framework
standalone: seed gaussians from the sparse point cloud, optimize L1+SSIM with
the same per-group Adam setup as the re-optimizer, and run the static-shape
densification from densify.py (fixed capacity, alive masks — the train step
compiles once and never re-specializes as the gaussian count grows).

Progressive SH degree matches splatfacto: active degree = step //
sh_degree_interval, capped at the scene's degree (gc_model.py:162-169).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.cameras.camera import Cameras
from gaussctrl_tpu.splat.densify import (
    DensifyConfig, DensifyState, accumulate, grow_capacity, init_state,
    refine, reset_opacities,
)
from gaussctrl_tpu.splat.losses import splat_loss
from gaussctrl_tpu.splat.project import project_gaussians
from gaussctrl_tpu.splat.rasterize import RasterConfig
from gaussctrl_tpu.splat.render import render_rgbd
from gaussctrl_tpu.splat.scene import GaussianScene, from_points
from gaussctrl_tpu.splat.trainer import TrainConfig, make_optimizer
from gaussctrl_tpu.cameras.camera import view_matrix


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    num_steps: int = 30000
    capacity_mult: float = 8.0      # gaussian buffer = mult × seed points
    eval_every: int = 1000          # full-res PSNR on 4 fixed views (0 = off)
    ckpt_every: int = 0             # mid-run checkpoints via ckpt_fn (0 = off)
    sh_degree_interval: int = 1000
    # splatfacto resolution schedule: train at 1/2^num_downscales resolution,
    # halving the downscale every resolution_schedule steps (0 disables).
    # 3000 matches splatfacto's default — full res only from step 6000,
    # AFTER the early densify chaos settles (ramping at 250 put the
    # fresh-split scene at full res by step 500 and never converged)
    num_downscales: int = 2
    resolution_schedule: int = 3000
    # blend path at FULL resolution: "auto" routes to the ops/splat_blend.py
    # Pallas kernel on TPU only (~20% faster per train step at 134k gaussians
    # and scaling better with depth) and leaves other backends on the XLA
    # blend (the kernel would run in interpret mode there — orders of
    # magnitude slower); "pallas"/"xla" are explicit opt-ins honored on any
    # backend; "" disables the full-res override. Downscaled phases always
    # use the XLA blend — at small images the kernel's aligned-buffer prep
    # dominates.
    fullres_blend: str = "auto"
    densify: DensifyConfig = DensifyConfig()
    train: TrainConfig = TrainConfig(lr_step_offset=0)


def _reset_label_moments(opt_state, label: str, optimizer, scene):
    """Zero one multi_transform group's Adam state (post-opacity-reset)."""
    try:
        inner = dict(opt_state.inner_states)
        inner[label] = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "dtype") else x,
            inner[label])
        return opt_state._replace(inner_states=inner)
    except (AttributeError, TypeError, KeyError):
        return optimizer.init(scene)  # optax internals changed — full reset


def _reset_newborn_moments(opt_state, born: jnp.ndarray):
    """Zero Adam mu/nu rows of freshly-born gaussian slots, preserving the
    moments of surviving ones (splatfacto keeps optimizer state across
    densification; a full reset would stall convergence every refine)."""
    cap = born.shape[0]

    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return jnp.where(born.reshape((-1,) + (1,) * (x.ndim - 1)), 0, x)
        return x

    return jax.tree_util.tree_map(f, opt_state)


def _eval_psnr(scene, cameras, images, sh_degree, raster_cfg):
    """Full-resolution PSNR on 4 fixed views — a comparable convergence
    metric (the per-step train PSNR is view- and schedule-resolution-noisy).
    Also reports intersection-buffer occupancy (>1.0 ⇒ binning overflow,
    lower RasterConfig.isect_divisor)."""
    from gaussctrl_tpu.splat.rasterize import resolve_auto_blend
    raster_cfg = resolve_auto_blend(raster_cfg)  # single-view loop: Pallas ok
    v_idx = [int(i * len(cameras) / 4) for i in range(4)]
    h, w = int(cameras.height), int(cameras.width)
    vals = []
    alphas = []
    isect_frac = 0.0
    for v in v_idx:
        out = render_rgbd(scene, cameras.c2w[v], cameras.fx[v], cameras.fy[v],
                          cameras.cx[v], cameras.cy[v], w, h,
                          jnp.zeros(3), sh_degree, raster_cfg,
                          return_stats=True)
        mse = jnp.mean((out["rgb"] - images[v]) ** 2)
        vals.append(-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))
        isect_frac = max(isect_frac, float(out["stats"]["n_isect"])
                         / float(out["stats"]["isect_budget"]))
        alphas.append(float(out["accumulation"].mean()))
    return {"eval_psnr": float(jnp.stack(vals).mean()),
            "eval_alpha": round(float(np.mean(alphas)), 3),
            "isect_frac": round(isect_frac, 3)}


@partial(jax.jit, static_argnames=("width", "height", "sh_degree",
                                   "raster_cfg", "train_cfg"),
         donate_argnames=("scene", "opt_state", "dstate"))
def pretrain_step(
    scene: GaussianScene,
    opt_state,
    dstate: DensifyState,
    c2w, fx, fy, cx, cy,
    gt_image: jnp.ndarray,
    key: jax.Array,
    width: int, height: int,
    sh_degree: int,
    raster_cfg: RasterConfig = RasterConfig(),
    train_cfg: TrainConfig = TrainConfig(lr_step_offset=0),
):
    """Train step + densify-statistics accumulation. Returns
    (scene, opt_state, dstate, metrics)."""
    import optax

    background = jax.random.uniform(key, (3,))
    optimizer = make_optimizer(train_cfg)

    def loss_fn(s, xys_shift):
        out = render_rgbd(s, c2w, fx, fy, cx, cy, width, height, background,
                          sh_degree, raster_cfg, xys_shift=xys_shift,
                          return_stats=True)
        loss, metrics = splat_loss(out["rgb"], gt_image, train_cfg.ssim_lambda)
        # overflow sentinel: > 1.0 means the binning buffer dropped
        # intersections THIS step — silent bottom-tile corruption in both
        # the render and the gradients (lower RasterConfig.isect_divisor)
        metrics = dict(metrics, isect_frac=jax.lax.stop_gradient(
            out["stats"]["n_isect"].astype(jnp.float32)
            / out["stats"]["isect_budget"].astype(jnp.float32)))
        return loss, metrics

    shift0 = jnp.zeros((scene.num_gaussians, 2))
    (loss, metrics), (grads, g_xys) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(scene, shift0)
    # visibility of every gaussian in this view, for the grad stats; g_xys is
    # the EXACT pixel-space positional gradient (splatfacto's criterion)
    proj = project_gaussians(scene.means, jnp.exp(scene.scales), scene.quats,
                             view_matrix(c2w), fx, fy, cx, cy, width, height,
                             opacities=jax.lax.stop_gradient(
                                 jax.nn.sigmoid(scene.opacities[:, 0])))
    dstate = accumulate(dstate, g_xys, proj.radii > 0, width, height,
                        radii=proj.radii)

    updates, opt_state = optimizer.update(grads, opt_state, scene)
    scene = optax.apply_updates(scene, updates)
    from gaussctrl_tpu.splat.trainer import _renorm_quats
    return _renorm_quats(scene), opt_state, dstate, metrics


def pretrain(
    cameras: Cameras,
    images: np.ndarray,               # [V, H, W, 3]
    points_xyz: np.ndarray,
    points_rgb: np.ndarray,
    cfg: PretrainConfig = PretrainConfig(),
    sh_degree: int = 3,
    raster_cfg: RasterConfig = RasterConfig(),
    seed: int = 0,
    log_fn=None,
    ckpt_fn=None,
    init_scene: Optional[GaussianScene] = None,
    start_step: int = 0,
):
    """Full pre-training loop. Returns (scene [alive only], final metrics).
    `ckpt_fn(step, scene)` fires every cfg.ckpt_every steps when set.

    Resume: pass `init_scene` (a saved mid-run scene, alive gaussians only)
    and `start_step`; the resolution/SH/densify schedules pick up where the
    interrupted run left off and the means-lr decay is offset to
    `start_step` (densify statistics restart cold — one refine interval of
    warm-up, harmless)."""
    import optax

    if init_scene is not None:
        scene = jax.tree_util.tree_map(jnp.asarray, init_scene)
    else:
        scene = from_points(points_xyz, points_rgb, sh_degree)
    n_seed = scene.num_gaussians
    cap_max = max(int(cfg.capacity_mult * n_seed), n_seed)
    # bucketed static shapes: start near the seed count and double as the
    # buffer fills (grow_capacity) — a handful of recompiles instead of
    # paying cap_max's projection/binning cost from step 0
    capacity = min(cap_max, -(-int(1.5 * n_seed) // 4096) * 4096)
    scene, dstate = init_state(scene, capacity)
    if start_step:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, lr_step_offset=cfg.train.lr_step_offset + start_step))
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(scene)

    rng = np.random.default_rng(seed + start_step)
    keys = jax.random.split(jax.random.PRNGKey(seed), cfg.num_steps + 1)
    order: list = []
    metrics = {}
    # resolution pyramid for the splatfacto warm-up schedule (mean-pooled)
    pyramid = {1: jnp.asarray(images)}
    if cfg.num_downscales and cfg.resolution_schedule:
        for lvl in range(1, cfg.num_downscales + 1):
            f = 2 ** lvl
            v, h, w, c = images.shape
            im = images[:, : h // f * f, : w // f * f]
            pyramid[f] = jnp.asarray(
                im.reshape(v, h // f, f, w // f, f, c).mean((2, 4)))
    d = cfg.densify
    for step in range(start_step, cfg.num_steps):
        if not order:
            order = list(rng.permutation(len(cameras)))
        v = int(order.pop())
        active_sh = min(step // cfg.sh_degree_interval, sh_degree)
        if cfg.num_downscales and cfg.resolution_schedule:
            f = 2 ** max(cfg.num_downscales - step // cfg.resolution_schedule, 0)
        else:
            f = 1
        fullres_blend = cfg.fullres_blend
        if fullres_blend == "auto":
            fullres_blend = ("pallas" if jax.default_backend() == "tpu"
                             else "")
        rc = (raster_cfg.replace(blend_impl=fullres_blend)
              if f == 1 and fullres_blend else raster_cfg)
        scene, opt_state, dstate, metrics = pretrain_step(
            scene, opt_state, dstate,
            cameras.c2w[v], cameras.fx[v] / f, cameras.fy[v] / f,
            cameras.cx[v] / f, cameras.cy[v] / f, pyramid[f][v], keys[step],
            cameras.width // f, cameras.height // f, active_sh, rc,
            cfg.train)

        in_window = d.warmup < step < d.stop_at
        post_window = step >= d.stop_at
        scale_cull_on = step > d.reset_alpha_every  # post first opacity reset
        # splatfacto pauses refinement for ~(num_views + refine_every) steps
        # after every opacity reset: post-reset gradients spike everywhere
        # and alpha-culling would judge opacities that haven't re-converged —
        # refining in that window mass-culled and mass-split the recovering
        # scene (measured: eval PSNR fell for 1000+ steps after each reset)
        steps_since_reset = (step % d.reset_alpha_every
                             if d.reset_alpha_every else step)
        settled = steps_since_reset > len(cameras) + d.refine_every
        # resets only fire in-window, so the settling pause applies only
        # there; the post-window cull-only passes run unconditionally
        # (splatfacto's continue_cull_post_densification has no gate)
        if ((in_window and settled) or post_window) \
                and step % d.refine_every == 0:
            alive_before = np.asarray(dstate.alive)  # refine() donates
            if log_fn:
                # densify-statistic distribution: the primary calibration
                # signal (a healthy run selects a few % per refine; medians
                # above grad_thresh mean the statistic is mis-scaled)
                avg = np.asarray(dstate.grad_accum) / np.maximum(
                    np.asarray(dstate.grad_count), 1.0)
                av = avg[alive_before]
                if av.size:
                    log_fn(step, {
                        "grad_p50": float(np.quantile(av, 0.5)),
                        "grad_p90": float(np.quantile(av, 0.9)),
                        "grad_p98": float(np.quantile(av, 0.98)),
                        "grad_frac_above": float((av > d.grad_thresh).mean()),
                    })
            scene, dstate, stats = refine(
                scene, dstate, keys[-1], d,
                screen_split=step < d.stop_screen_size_at,
                scale_cull=scale_cull_on,
                screen_cull=scale_cull_on and step < d.stop_screen_size_at,
                cull_only=post_window)
            born = jnp.asarray(np.asarray(dstate.alive) & ~alive_before)
            opt_state = _reset_newborn_moments(opt_state, born)
            if log_fn:
                log_fn(step, {k: int(v) for k, v in stats.items()})
            cap = scene.num_gaussians
            if cap < cap_max and int(stats["n_alive"]) > 0.8 * cap:
                new_cap = min(cap_max, 2 * cap)
                scene, dstate, opt_state = grow_capacity(
                    scene, dstate, opt_state, new_cap)
                if log_fn:
                    log_fn(step, {"capacity": new_cap})
        if in_window and d.reset_alpha_every and step % d.reset_alpha_every == 0 \
                and step > 0:
            scene = reset_opacities(scene, dstate.alive,
                                    value=2 * d.cull_opacity)
            # only the opacity Adam moments are stale after the clamp;
            # nuking every group's moments stalls convergence for ~hundreds
            # of steps (splatfacto resets just the opacity optimizer)
            opt_state = _reset_label_moments(opt_state, "opacities", optimizer,
                                             scene)
        if log_fn and step % 200 == 0:
            m = {k: float(x) for k, x in metrics.items()}
            log_fn(step, m)
            if m.get("isect_frac", 0.0) > 1.0:
                log_fn(step, {"WARN_isect_overflow": m["isect_frac"]})
            # divergence sentinel (VERDICT r1: a run with logged SSIM -2.66
            # burned 3h before a human noticed) — fail fast, loudly, and
            # drop a post-mortem checkpoint of the offending state
            bad = (not np.isfinite(m.get("loss", 0.0))
                   or not -1.0 - 1e-3 <= m.get("ssim", 0.0) <= 1.0 + 1e-3)
            if bad:
                if ckpt_fn:
                    alive_np = np.nonzero(np.asarray(dstate.alive))[0]
                    ckpt_fn(step, jax.tree_util.tree_map(
                        lambda x: x[alive_np], scene))
                raise FloatingPointError(
                    f"pretrain diverged at step {step} (view {v}): {m} — "
                    "SSIM outside [-1,1] / non-finite loss means renders "
                    "left [0,1]; post-mortem ckpt written when ckpt_fn set")
        if log_fn and cfg.eval_every and step % cfg.eval_every == 0:
            log_fn(step, _eval_psnr(scene, cameras, pyramid[1], sh_degree,
                                    raster_cfg))
        if ckpt_fn and cfg.ckpt_every and step and step % cfg.ckpt_every == 0:
            alive_np = np.nonzero(np.asarray(dstate.alive))[0]
            ckpt_fn(step, jax.tree_util.tree_map(lambda x: x[alive_np], scene))

    if log_fn and cfg.eval_every:
        log_fn(cfg.num_steps, _eval_psnr(scene, cameras, pyramid[1],
                                         sh_degree, raster_cfg))

    # compact to alive gaussians for downstream static-shape consumers
    alive_idx = np.nonzero(np.asarray(dstate.alive))[0]
    scene = jax.tree_util.tree_map(lambda x: x[alive_idx], scene)
    return scene, metrics

"""Adaptive density control (split / duplicate / cull) with static shapes.

The reference inherits splatfacto's densification (inert during re-opt, which
starts past the refinement window — SURVEY.md §2.2), so editing parity doesn't
need it; *standalone pre-training* does (the reference delegates that to
`ns-train splatfacto`, README.md:104). This is the TPU-native version of the
3DGS adaptive density control:

  * the gaussian buffer has a FIXED capacity; a boolean `alive` mask tracks
    real gaussians (dead/padded slots render as radii=0) — growth is a masked
    scatter into free slots, never a reshape, so the train step compiles once;
  * screen-gradient statistics accumulate per step (world-mean grad norm
    scaled by focal/depth ≈ the splatfacto xys-grad criterion);
  * split: high-grad & large → two children sampled from the parent, scales
    ÷1.6, parent killed; duplicate: high-grad & small → copy;
  * cull: opacity below threshold, or screen/world footprint too large;
  * periodic opacity reset to just-below-cull (splatfacto's reset_alpha).

All of refine() is one jit-compiled function over (scene, opt_state, state).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gaussctrl_tpu.splat.scene import GaussianScene


@struct.dataclass
class DensifyConfig:
    # threshold on the avg pixel-space positional gradient, normalized by
    # half the max resolution — the EXACT splatfacto statistic (accumulate
    # differentiates wrt a zero screen-shift), so splatfacto's classic
    # 0.0002 transfers directly
    grad_thresh: float = struct.field(pytree_node=False, default=0.0002)
    # OPTIONAL quantile rate-cap on top of the threshold (0 = pure splatfacto
    # threshold, the default). Full-run evidence settled this (VERDICT r2
    # missing #5): a 30k bear run with the 0.98 cap starved growth at ~2% of
    # alive per refine (~500 births/cycle, scene stuck at 23k gaussians) —
    # full-res entry then exploded (grad_p98 ~4e3, PSNR falling), because too
    # few gaussians cover too many pixels each. The pure-threshold run grew
    # 12-16k/cycle to ~350k and climbed cleanly (outputs/bear_r2a vs the
    # starved log in the r3 restart). Capacity growth + the childless-split
    # guard are the intended saturation controls, not this cap.
    densify_quantile: float = struct.field(pytree_node=False, default=0.0)
    densify_size_thresh: float = struct.field(pytree_node=False, default=0.01)
    # splatfacto semantics (cull_alpha_thresh=0.1, reset to 2x): the scene the
    # reference edits is pre-trained by splatfacto, whose shallow opacity
    # resets recover in ~100 steps — the INRIA 0.005/0.01 pair left the scene
    # near-transparent for >1000 steps after every reset
    cull_opacity: float = struct.field(pytree_node=False, default=0.1)
    cull_scale3d: float = struct.field(pytree_node=False, default=0.5)
    # screen-size criteria (fractions of max(W, H), splatfacto semantics):
    # gaussians larger than split_screen_size also split while
    # step < stop_screen_size_at; larger than cull_screen_size are culled
    # once scale-culling is active (after the first opacity reset)
    split_screen_size: float = struct.field(pytree_node=False, default=0.05)
    cull_screen_size: float = struct.field(pytree_node=False, default=0.15)
    stop_screen_size_at: int = struct.field(pytree_node=False, default=4000)
    split_ratio: float = struct.field(pytree_node=False, default=1.6)
    warmup: int = struct.field(pytree_node=False, default=500)
    stop_at: int = struct.field(pytree_node=False, default=15000)
    refine_every: int = struct.field(pytree_node=False, default=100)
    reset_alpha_every: int = struct.field(pytree_node=False, default=3000)


@struct.dataclass
class DensifyState:
    alive: jnp.ndarray        # [Nmax] bool
    grad_accum: jnp.ndarray   # [Nmax] summed screen-grad norms
    grad_count: jnp.ndarray   # [Nmax] steps with a visible contribution
    radii_max: jnp.ndarray    # [Nmax] max screen radius / max(W, H)


def pad_scene(scene: GaussianScene, pad: int) -> GaussianScene:
    """Append `pad` dead slots (far-transparent, never rasterized)."""
    if not pad:
        return scene

    def grow(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    return GaussianScene(
        means=grow(scene.means),
        scales=jnp.concatenate([scene.scales, jnp.full((pad, 3), -15.0)]),
        quats=jnp.concatenate(
            [scene.quats, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (pad, 1))]),
        opacities=jnp.concatenate([scene.opacities,
                                   jnp.full((pad, 1), -15.0)]),
        features_dc=grow(scene.features_dc),
        features_rest=grow(scene.features_rest),
    )


def init_state(scene: GaussianScene, capacity: int
               ) -> Tuple[GaussianScene, DensifyState]:
    """Pad a scene to `capacity` slots; padded slots are dead."""
    n = scene.num_gaussians
    assert capacity >= n, (capacity, n)
    scene = pad_scene(scene, capacity - n)
    alive = jnp.arange(capacity) < n
    return scene, DensifyState(alive=alive,
                               grad_accum=jnp.zeros((capacity,), jnp.float32),
                               grad_count=jnp.zeros((capacity,), jnp.float32),
                               radii_max=jnp.zeros((capacity,), jnp.float32))


def grow_capacity(scene: GaussianScene, state: DensifyState, opt_state,
                  new_cap: int):
    """Bucketed buffer growth: re-pad scene/state/optimizer to `new_cap`.

    The train step is compiled per capacity bucket; growing ~2x whenever the
    buffer passes ~80% full costs a handful of recompiles instead of paying
    the final capacity's projection/binning cost from step 0."""
    old = scene.num_gaussians
    pad = new_cap - old
    assert pad > 0, (old, new_cap)
    scene = pad_scene(scene, pad)

    def grow(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == old:
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x

    state = DensifyState(alive=jnp.concatenate(
        [state.alive, jnp.zeros((pad,), bool)]),
        grad_accum=grow(state.grad_accum),
        grad_count=grow(state.grad_count),
        radii_max=grow(state.radii_max))
    opt_state = jax.tree_util.tree_map(grow, opt_state)
    return scene, state, opt_state


def accumulate(state: DensifyState, xys_grads: jnp.ndarray,
               visible: jnp.ndarray, width: int, height: int,
               radii: jnp.ndarray | None = None) -> DensifyState:
    """Track the screen-space gradient criterion after a train step.

    xys_grads [N,2] are the EXACT pixel-space gradients of the projected
    centers (differentiate the loss wrt a zero screen-shift — see
    render_rgbd's xys_shift); normalized by half the max resolution exactly
    as splatfacto does, so the classic densify_grad_thresh=0.0002 transfers.
    `radii` (screen px) feeds the max-2D-size statistic for the screen-size
    split/cull criteria.
    """
    g = jnp.linalg.norm(xys_grads, axis=-1) * (0.5 * max(width, height))
    radii_max = state.radii_max
    if radii is not None:
        radii_max = jnp.maximum(radii_max, radii / max(width, height))
    return state.replace(
        grad_accum=state.grad_accum + jnp.where(visible, g, 0.0),
        grad_count=state.grad_count + visible.astype(jnp.float32),
        radii_max=radii_max,
    )


@partial(jax.jit,
         static_argnames=("cfg", "screen_split", "scale_cull", "screen_cull",
                          "cull_only"),
         donate_argnames=("scene", "state"))
def refine(scene: GaussianScene, state: DensifyState, key: jax.Array,
           cfg: DensifyConfig = DensifyConfig(),
           screen_split: bool = False, scale_cull: bool = True,
           screen_cull: bool = False, cull_only: bool = False):
    """One split/duplicate/cull pass. Static shapes; returns (scene, state,
    stats). New gaussians land in dead slots (capacity permitting).

    Gating flags follow splatfacto's schedule (the caller derives them from
    the step): `screen_split` while step < stop_screen_size_at; `scale_cull`/
    `screen_cull` only after the first opacity reset (fresh post-reset
    opacities would mass-cull otherwise); `cull_only` after stop_at
    (continue_cull_post_densification).
    """
    cap = scene.num_gaussians
    alive = state.alive
    avg_grad = state.grad_accum / jnp.maximum(state.grad_count, 1.0)
    opac = jax.nn.sigmoid(scene.opacities[:, 0])
    max_scale = jnp.exp(scene.scales).max(-1)

    high_grad = (avg_grad > cfg.grad_thresh) & alive
    if cfg.densify_quantile > 0:
        qt = jnp.nanquantile(jnp.where(alive, avg_grad, jnp.nan),
                             cfg.densify_quantile)
        high_grad = high_grad & (avg_grad >= qt)
    big = max_scale > cfg.densify_size_thresh
    if screen_split:
        big = big | (state.radii_max > cfg.split_screen_size)
    split_mask = high_grad & big
    dup_mask = high_grad & ~big
    if cull_only:
        split_mask = jnp.zeros_like(split_mask)
        dup_mask = jnp.zeros_like(dup_mask)
    cull_mask = opac < cfg.cull_opacity
    if scale_cull:
        toobig = max_scale > cfg.cull_scale3d
        if screen_cull:
            toobig = toobig | (state.radii_max > cfg.cull_screen_size)
        cull_mask = cull_mask | toobig
    cull_mask = cull_mask & alive
    # A split is only real if BOTH children fit in free slots: with the buffer
    # at capacity, dropped child scatters must not leave the parent killed and
    # shrunk (childless splits destroyed the highest-gradient gaussians every
    # refine once pre-training saturated the buffer). free_slots is packed
    # ascending, so the first ⌊free/2⌋ split ranks (by buffer order) succeed.
    num_free = jnp.sum(~alive & ~cull_mask)
    split_rank = jnp.cumsum(split_mask) - 1
    split_mask = split_mask & (2 * split_rank + 1 < num_free)
    n_split = split_mask.sum()

    # child i (2 per split parent) gets claim index 2*rank(+0/1);
    # dup children follow after all split children
    free_slots = jnp.nonzero(~alive & ~cull_mask, size=cap, fill_value=cap)[0]
    # (dead slots; culled slots of this round are also reusable next round)

    def place(claim_idx, parent_idx, new_scene, noise_key, shrink):
        """Scatter one batch of children at free_slots[claim_idx]."""
        slot_raw = jnp.where(claim_idx < free_slots.shape[0],
                             free_slots[jnp.clip(claim_idx, 0, cap - 1)], cap)
        ok = (slot_raw < cap) & (parent_idx < cap)
        # invalid writes go out of bounds and are dropped by mode="drop" —
        # never clipped onto a real slot (duplicate-index scatter would
        # clobber genuine writes there)
        slot = jnp.where(ok, slot_raw, cap)
        p = jnp.clip(parent_idx, 0, cap - 1)
        # sample child positions from the parent gaussian
        eps = jax.random.normal(noise_key, (parent_idx.shape[0], 3))
        sc = jnp.exp(new_scene.scales[p])
        q = new_scene.quats[p]
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = jnp.stack([
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ], -2)
        offset = jnp.einsum("nij,nj->ni", R, eps * sc)
        new_means = new_scene.means[p] + jnp.where(shrink, 1.0, 0.0) * offset
        new_scales = new_scene.scales[p] - jnp.where(
            shrink, jnp.log(jnp.asarray(cfg.split_ratio)), 0.0)

        def put(dst, src_vals):
            return dst.at[slot].set(src_vals, mode="drop")

        return GaussianScene(
            means=put(new_scene.means, new_means),
            scales=put(new_scene.scales, new_scales),
            quats=put(new_scene.quats, new_scene.quats[p]),
            opacities=put(new_scene.opacities, new_scene.opacities[p]),
            features_dc=put(new_scene.features_dc, new_scene.features_dc[p]),
            features_rest=put(new_scene.features_rest, new_scene.features_rest[p]),
        ), jnp.zeros((cap,), bool).at[slot].set(True, mode="drop")

    k1, k2, k3 = jax.random.split(key, 3)
    split_parents = jnp.nonzero(split_mask, size=cap, fill_value=cap)[0]
    dup_parents = jnp.nonzero(dup_mask, size=cap, fill_value=cap)[0]

    # children A (shifted, shrunk), children B (shifted, shrunk), dup copies
    scene1, born1 = place(2 * src_idx(split_parents, cap) + 0, split_parents,
                          scene, k1, True)
    scene2, born2 = place(2 * src_idx(split_parents, cap) + 1, split_parents,
                          scene1, k2, True)
    scene3, born3 = place(2 * n_split + src_idx(dup_parents, cap), dup_parents,
                          scene2, k3, False)

    # split parents also shrink in place and then die; dup parents live on
    scene3 = scene3.replace(
        scales=jnp.where(split_mask[:, None],
                         scene3.scales - jnp.log(jnp.asarray(cfg.split_ratio)),
                         scene3.scales))
    new_alive = (alive & ~cull_mask & ~split_mask) | born1 | born2 | born3
    # dead slots are pushed far away with zero opacity so they never rasterize
    dead = ~new_alive
    scene3 = scene3.replace(
        opacities=jnp.where(dead[:, None], -15.0, scene3.opacities),
        scales=jnp.where(dead[:, None], -15.0, scene3.scales),
    )
    n_born = born1.sum() + born2.sum() + born3.sum()
    stats = {"n_alive": new_alive.sum(), "n_split": n_split,
             "n_dup": dup_mask.sum(), "n_cull": cull_mask.sum(),
             "n_born": n_born,
             # candidates that found no free slot — nonzero means the
             # buffer is at capacity and growth is being throttled to the
             # cull rate (n_dup counts CANDIDATES, n_born PLACEMENTS; the
             # r3 bear run silently starved at capacity_mult*seed until
             # this gap was noticed in the logs)
             "n_unplaced": jnp.maximum(2 * n_split + dup_mask.sum()
                                       - n_born, 0)}
    fresh = DensifyState(alive=new_alive,
                         grad_accum=jnp.zeros((cap,), jnp.float32),
                         grad_count=jnp.zeros((cap,), jnp.float32),
                         radii_max=jnp.zeros((cap,), jnp.float32))
    return scene3, fresh, stats


def src_idx(parents: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Claim ranks for a padded parent list: 0,1,2,… for real entries."""
    real = parents < cap
    return jnp.where(real, jnp.cumsum(real) - 1, cap)


def reset_opacities(scene: GaussianScene, alive: jnp.ndarray,
                    value: float = 0.2) -> GaussianScene:
    """Clamp alive opacities to ≤ `value` (splatfacto's reset_alpha:
    2 x cull_alpha_thresh)."""
    logit = jnp.log(value / (1 - value))
    return scene.replace(
        opacities=jnp.where(alive[:, None],
                            jnp.minimum(scene.opacities, logit),
                            scene.opacities))

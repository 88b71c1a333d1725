"""The GaussCtrl editing method: render+invert -> cross-view edit -> re-optimize.

TPU-native re-architecture of the reference pipeline
(/root/reference/gaussctrl/gc_pipeline.py):

  render_reverse  (gc_pipeline.py:122-157)  — the reference loops the 40 views
    one by one on one GPU; here views are processed in static-size batches
    (vmapped splat render, batched VAE encode, batched 20-step DDIM inversion),
    sharded over the device mesh when one is given.

  edit_images     (gc_pipeline.py:159-237)  — the reference denoises chunks of
    `chunk_size` views, *re-denoising the 4 reference views inside every chunk*
    to keep their K/V in-batch (quirk, SURVEY.md §5.1.5). Here `chunk_size=0`
    denoises ALL views in ONE sharded batch: reference K/V reach every device
    via the XLA-inserted ICI allgather inside the cross-view processor, so the
    refs are denoised exactly once. `chunk_size>0` reproduces the reference's
    chunking (refs prepended per chunk) for single-chip memory envelopes.

  reoptimize      (gc_trainer.py:176-255)   — delegated to splat/trainer.py.

Prompt handling matches gc_pipeline.py:104-107: ', best quality, extremely
detailed' appended to both edit and reverse prompts, fixed negative prompt.
Reference-view selection matches gc_pipeline.py:109-114: one uniformly random
view per contiguous subset, seeded.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.cameras.camera import Cameras
from gaussctrl_tpu.core.mesh import shard_views
from gaussctrl_tpu.diffusion.clip import NEGATIVE_PROMPT, POSITIVE_SUFFIX, load_tokenizer
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.diffusion.ddim import DDIMSchedule
from gaussctrl_tpu.diffusion.processors import CrossViewAttnProcessor
from gaussctrl_tpu.diffusion.sample import (
    SDModels, denoise, encode_text, invert, vae_decode, vae_encode,
)
from gaussctrl_tpu.splat.rasterize import RasterConfig
from gaussctrl_tpu.splat.render import render_rgbd
from gaussctrl_tpu.splat.scene import GaussianScene
from gaussctrl_tpu.splat.trainer import TrainConfig, reoptimize


@dataclasses.dataclass
class GaussCtrlConfig:
    """Public flags — names preserved from GaussCtrlPipelineConfig
    (/root/reference/gaussctrl/gc_pipeline.py:48-73)."""
    edit_prompt: str = ""
    reverse_prompt: str = "a photo"
    langsam_obj: str = ""
    guidance_scale: float = 5.0
    num_inference_steps: int = 20
    chunk_size: int = 3           # 0 = all views in one sharded batch
    ref_view_num: int = 4
    diffusion_ckpt: str = ""      # local diffusers dir ('' = random init)
    controlnet_ckpt: str = ""
    render_rate: int = 500
    self_attn_coeff: float = 0.6
    conditioning_scale: float = 1.0
    seed: int = 13789
    # views per splat-render/VAE-encode batch (r3 sweep: per-view cost
    # plateaus by b=20)
    render_batch: int = 20
    # views per DDIM-inversion scan; 0 = ALL views in one scan (the
    # production default). The r4 on-chip A/B (outputs/perf_r4/ab.txt)
    # routes the no-CFG inversion to the transposed flash schedule, which
    # never materializes scores — one b=40 scan runs 8.99 s vs 17.9 s for
    # the r3 2x b=20 einsum split. Set >0 to bound the scan batch on
    # scenes with many views.
    invert_batch: int = 0
    # EasyInv inversion refinement (arXiv 2408.05159): 0 = off (exact
    # reference behavior); ~0.85 blends each high-noise iterate with the
    # previous one for a tighter invert->denoise round trip
    easyinv_rho: float = 0.0


def depth_to_disparity(depth: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """[V,H,W,1] depth -> [V,H,W,3] per-view max-normalized disparity
    (gc_pipeline.py:248-266 contract: each view normalized by its own max)."""
    disp = 1.0 / (depth + eps)
    m = jnp.max(disp, axis=(1, 2, 3), keepdims=True)
    disp = disp / jnp.maximum(m, eps)
    return jnp.tile(disp, (1, 1, 1, 3))


def select_ref_views(num_views: int, ref_view_num: int, seed: int = 13789) -> List[int]:
    """One random view per contiguous subset — reference-exact picks
    (gc_pipeline.py:110-114: floor-div anchors, seeded inclusive `randint`;
    e.g. 40 views → [4, 11, 29, 31]). The reference's randint upper bound is
    `anchors[idx+1]` itself, which for the last subset is `num_views` — an
    out-of-range view the reference would crash on; we clamp to the last
    valid index (same draws otherwise)."""
    rng = random.Random(seed)
    anchors = [(num_views * i) // ref_view_num
               for i in range(ref_view_num)] + [num_views]
    return [min(rng.randint(lo, hi), num_views - 1)
            for lo, hi in zip(anchors[:-1], anchors[1:])]


def _pad_to(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, mode="edge")


class GaussCtrlPipeline:
    """Orchestrates one full edit of a 3DGS scene."""

    def __init__(
        self,
        config: GaussCtrlConfig,
        scene: GaussianScene,
        cameras: Cameras,
        sd_config: Optional[SDConfig] = None,
        sd_params: Optional[Dict[str, Any]] = None,
        mesh=None,
        masker=None,                      # seg.MaskProvider or None
        dtype=jnp.bfloat16,
        raster_cfg: RasterConfig = RasterConfig(),
    ):
        self.config = config
        self.scene = scene
        self.cameras = cameras
        self.mesh = mesh
        self.masker = masker
        self.raster_cfg = raster_cfg
        self.sd_config = sd_config or SDConfig.sd15()
        self.models = SDModels.create(self.sd_config, dtype=dtype)
        if sd_params is None:
            if config.diffusion_ckpt:
                from gaussctrl_tpu.diffusion.weights import load_sd_params
                sd_params = load_sd_params(config.diffusion_ckpt,
                                           config.controlnet_ckpt)
            else:
                sd_params = jax.jit(self.models.init_params)(
                    jax.random.PRNGKey(0))
        # inference-only stack: keep params in the compute dtype (bf16 by
        # default) — halves HBM residency and weight-streaming traffic
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), sd_params)
        self.sched = DDIMSchedule.sd15()
        self.tokenizer = load_tokenizer(config.diffusion_ckpt or None,
                                        self.sd_config.text)
        self.ref_indices = select_ref_views(len(cameras), config.ref_view_num,
                                            config.seed)
        # artifact store (the reference mutates datamanager.train_data in
        # place, gc_pipeline.py:268-274; we keep explicit arrays)
        self.unedited: Optional[jnp.ndarray] = None   # [V,H,W,3]
        self.depths: Optional[jnp.ndarray] = None     # [V,H,W,1]
        self.disparity: Optional[jnp.ndarray] = None  # [V,H,W,3]
        self.z_T: Optional[jnp.ndarray] = None        # [V,h,w,4]
        self.masks: Optional[jnp.ndarray] = None      # [V,H,W,1]
        self.edited: Optional[jnp.ndarray] = None     # [V,H,W,3]

    # -- prompt helpers ----------------------------------------------------
    def _ctx(self, prompt: str, batch: int) -> jnp.ndarray:
        # keyed defensively by the CURRENT params object, not prompt alone:
        # params are fixed per pipeline instance today, but a pipeline reused
        # across checkpoints must not serve embeddings from the old weights
        if getattr(self, "_ctx_cache_params", None) is not self.params:
            self._ctx_cache = {}
            self._ctx_cache_params = self.params
        if prompt not in self._ctx_cache:
            ids = jnp.asarray(self.tokenizer.encode(prompt))[None]
            self._ctx_cache[prompt] = jax.jit(encode_text, static_argnums=0)(
                self.models, self.params, ids)
        ctx = self._ctx_cache[prompt]
        return jnp.broadcast_to(ctx, (batch,) + ctx.shape[1:])

    def _shard(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None or x.shape[0] % self.mesh.devices.size != 0:
            return x
        return jax.device_put(x, shard_views(self.mesh))

    def _round_up_views(self, n: int) -> int:
        """Smallest batch >= n divisible by the mesh (1 without a mesh) —
        callers pad to this so _shard never silently skips a non-divisible
        view count (a 44-view scene on 8 chips must pad to 48, not quietly
        run unsharded)."""
        if self.mesh is None:
            return n
        nd = self.mesh.devices.size
        return -(-n // nd) * nd

    def _invert_processor(self):
        """Attention routing for the inversion lane (r4 on-chip A/B,
        outputs/perf_r4/ab.txt + ab_iso.txt): the no-CFG inversion scan
        runs 2.0x faster under the transposed flash schedule, while the
        CFG-doubled edit lane prefers einsum — so ONLY invert gets the
        Pallas processor. Single-chip TPU only: the kernel has no mesh
        partition rules (mesh mode keeps the XLA-partitionable einsum
        path), and off-TPU Pallas would need interpret mode.
        GAUSSCTRL_INVERT_ATTN overrides: einsum | full_t | full | stream.
        """
        mode = os.environ.get("GAUSSCTRL_INVERT_ATTN", "auto")
        if mode == "einsum":
            return None
        if mode == "auto":
            # GAUSSCTRL_FLASH=0 is the documented global Pallas kill-switch
            # (nn._use_flash); honor it here too so disabling flash really
            # disables every Pallas lane. GAUSSCTRL_INVERT_ATTN stays the
            # explicit per-lane override (wins over the global switch).
            if (jax.default_backend() != "tpu" or self.mesh is not None
                    or os.environ.get("GAUSSCTRL_FLASH") == "0"):
                return None
            mode = "full_t"
        from gaussctrl_tpu.diffusion.processors import FlashSelfAttnProcessor
        return FlashSelfAttnProcessor(kernel=mode)

    def _diffusion_hw(self) -> tuple[int, int]:
        """Image resolution the diffusion stack runs at: camera resolution
        rounded UP to the stack's divisibility requirement — the VAE's 8x
        downsample times the UNet's 2^(levels-1) skip alignment (64 for
        sd15). The reference sidesteps this by REQUIRING 512x512 inputs
        (README.md:95, gc_pipeline.py:132); here arbitrary-resolution
        scenes edit by resizing into and out of the diffusion stack, and
        the reference's 512x512 contract passes through untouched."""
        div = 8 * 2 ** (len(self.models.cfg.unet.block_out_channels) - 1)
        h, w = self.cameras.height, self.cameras.width
        return -(-h // div) * div, -(-w // div) * div

    def _to_diffusion_res(self, x: jnp.ndarray) -> jnp.ndarray:
        rh, rw = self._diffusion_hw()
        if tuple(x.shape[1:3]) == (rh, rw):
            return x
        return jax.image.resize(x, (x.shape[0], rh, rw, x.shape[3]),
                                "bilinear").astype(x.dtype)

    def _from_diffusion_res(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.cameras.height, self.cameras.width
        if tuple(x.shape[1:3]) == (h, w):
            return x
        return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                                "bilinear").astype(x.dtype)

    def load_artifacts(self, train_data) -> bool:
        """Adopt precomputed edit artifacts from a datamanager's train_data
        (the resume path: the dataparser auto-discovers unedited/ depth_npy/
        z_0/ mask_npy/ dirs, gc_dataparser_ns.py:409-420). Returns True when
        every view is covered so render_reverse() can be skipped."""
        needed = ("unedited_image", "depth_image", "z_0_image")
        if not train_data or not all(
                all(k in d for k in needed) for d in train_data):
            return False
        # stored layouts follow the reference: depth [1,H,W] or [H,W,1],
        # z0 [(1,)4,h,w] channel-first or [h,w,4]
        def fix_depth(x):
            x = jnp.asarray(x)
            if x.ndim == 3 and x.shape[0] == 1:
                x = x[0]
            return x if x.ndim == 3 else x[..., None]

        def fix_z0(x):
            x = jnp.asarray(x)
            if x.ndim == 4:
                x = x[0]
            if x.shape[0] == 4 and x.shape[-1] != 4:
                x = x.transpose(1, 2, 0)
            return x

        self.unedited = jnp.stack(
            [jnp.asarray(d["unedited_image"]) for d in train_data])
        self.depths = jnp.stack([fix_depth(d["depth_image"])
                                 for d in train_data])
        self.z_T = jnp.stack([fix_z0(d["z_0_image"]) for d in train_data])
        if all("mask_image" in d for d in train_data):
            m = jnp.stack([jnp.asarray(d["mask_image"]) for d in train_data])
            self.masks = m if m.ndim == 4 else m[..., None]
        else:
            self.masks = jnp.ones(self.unedited.shape[:3] + (1,),
                                  self.unedited.dtype)
        self.disparity = depth_to_disparity(self.depths)
        return True

    # -- stage 1: render + invert (gc_pipeline.py:122-157) ----------------
    def render_reverse(self, log_fn=None):
        cams = self.cameras
        V = len(cams)
        # batch rounded UP to the mesh size so _shard never silently skips
        bs = self._round_up_views(min(self.config.render_batch, V))
        sh = self.scene.sh_degree

        from gaussctrl_tpu.splat.rasterize import resolve_auto_blend
        rc_single = resolve_auto_blend(self.raster_cfg)

        def _render_one(scene, c2w, fx, fy, cx, cy, cfg):
            return render_rgbd(scene, c2w, fx, fy, cx, cy, cams.width,
                               cams.height, jnp.zeros(3), sh, cfg)

        if self.mesh is None and rc_single.blend_impl == "pallas":
            # single-chip Pallas lane: the blend kernel can't be vmapped
            # (scalar prefetch), so batch views with lax.map — each view's
            # render is large enough to fill the chip on its own, and the
            # kernel's fwd wins over the XLA blend at production scale
            render_batch = jax.jit(
                lambda scene, c2w, fx, fy, cx, cy: jax.lax.map(
                    lambda a: _render_one(scene, *a, rc_single),
                    (c2w, fx, fy, cx, cy)))
        else:
            # mesh mode keeps vmap: the view axis is sharded over devices
            # and lax.map would serialize it into cross-device gathers
            rc_batch = resolve_auto_blend(self.raster_cfg, vmapped=True)
            render_batch = jax.jit(jax.vmap(
                lambda scene, c2w, fx, fy, cx, cy: _render_one(
                    scene, c2w, fx, fy, cx, cy, rc_batch),
                in_axes=(None, 0, 0, 0, 0, 0)))

        rgbs, depths = [], []
        for lo in range(0, V, bs):
            hi = min(lo + bs, V)
            idx = np.minimum(np.arange(lo, lo + bs), V - 1)  # pad w/ last view
            out = render_batch(self.scene, cams.c2w[idx], cams.fx[idx],
                               cams.fy[idx], cams.cx[idx], cams.cy[idx])
            rgbs.append(out["rgb"][: hi - lo])
            depths.append(out["depth"][: hi - lo])
            if log_fn:
                log_fn(f"rendered views {lo}..{hi - 1}")
        self.unedited = jnp.concatenate(rgbs)
        self.depths = jnp.concatenate(depths)
        self.disparity = depth_to_disparity(self.depths)

        # DDIM inversion with the reverse prompt, guidance 0
        reverse = self.config.reverse_prompt + POSITIVE_SUFFIX
        zs = []
        proc = self._invert_processor()
        ibs = V if self.config.invert_batch <= 0 else self.config.invert_batch
        ibs = self._round_up_views(min(ibs, V))
        # params travel as jit ARGUMENTS — closing over them would bake the
        # multi-GB tree into the compiled graph as constants
        inv = jax.jit(lambda p, lat, ctx, disp: invert(
            self.models, p, self.sched, lat, ctx, disp,
            self.config.num_inference_steps, self.config.conditioning_scale,
            easyinv_rho=self.config.easyinv_rho,
            unet_processor=proc, controlnet_processor=proc))
        enc = jax.jit(lambda p, imgs: vae_encode(self.models, p, imgs))
        z0s = []
        for lo in range(0, V, bs):
            hi = min(lo + bs, V)
            imgs = _pad_to(self._to_diffusion_res(self.unedited[lo:hi]), bs)
            z0s.append(enc(self.params, self._shard(imgs))[: hi - lo])
        z0_all = jnp.concatenate(z0s)
        for lo in range(0, V, ibs):
            hi = min(lo + ibs, V)
            n = hi - lo
            idx = np.minimum(np.arange(lo, lo + ibs), V - 1)
            disp = self._to_diffusion_res(self.disparity[idx])
            zT = inv(self.params, self._shard(z0_all[idx]),
                     self._ctx(reverse, ibs), self._shard(disp))
            zs.append(zT[:n])
            if log_fn:
                log_fn(f"inverted views {lo}..{hi - 1}")
        self.z_T = jnp.concatenate(zs)

        # text-prompted object masks (gc_pipeline.py:148-152); all-ones
        # when no object is given or no masker is configured
        if self.config.langsam_obj and self.masker is not None:
            self.masks = self.masker(self.unedited, self.config.langsam_obj)
        else:
            self.masks = jnp.ones(self.unedited.shape[:3] + (1,),
                                  self.unedited.dtype)
        return self

    # -- stage 2: cross-view chunked edit (gc_pipeline.py:159-237) --------
    def edit_images(self, log_fn=None):
        assert self.z_T is not None, "run render_reverse() first"
        cfg = self.config
        V = len(self.cameras)
        refs = self.ref_indices
        R = len(refs)
        others = [i for i in range(V) if i not in refs]

        edit_prompt = cfg.edit_prompt + POSITIVE_SUFFIX
        guided = cfg.guidance_scale > 1.0
        groups = 2 if guided else 1

        # fused cross-view Pallas path is single-chip only (no mesh
        # partition rules); mesh mode keeps the XLA-partitionable einsum
        fused_ok = self.mesh is None

        def _run_batch(p, z, disp, ctx_p, ctx_n, nrefs):
            return denoise(
                self.models, p, self.sched, z, ctx_p, ctx_n,
                disp, cfg.guidance_scale, cfg.num_inference_steps,
                cfg.conditioning_scale,
                unet_processor=CrossViewAttnProcessor(
                    nrefs, cfg.self_attn_coeff, groups, allow_fused=fused_ok),
                controlnet_processor=CrossViewAttnProcessor(
                    nrefs, 0.0, groups, allow_fused=fused_ok))

        _run_batch = jax.jit(_run_batch, static_argnames=("nrefs",))

        def run_batch(z, disp, nrefs):
            b = z.shape[0]
            return _run_batch(self.params, z, disp, self._ctx(edit_prompt, b),
                              self._ctx(NEGATIVE_PROMPT, b), nrefs)

        # the ControlNet hint must match the latent geometry, not the camera
        # geometry (no-op at the reference's 512x512 contract)
        disparity_d = self._to_diffusion_res(self.disparity)
        edited_lat = [None] * V
        if cfg.chunk_size <= 0:
            # all views at once, refs first, view axis sharded over the mesh;
            # pad (repeating the last view) up to a mesh-divisible batch so
            # e.g. 44 views on 8 chips shard as 48, not silently unsharded
            order = refs + others
            order_pad = order + [order[-1]] * (self._round_up_views(V) - V)
            z = self._shard(self.z_T[np.asarray(order_pad)])
            disp = self._shard(disparity_d[np.asarray(order_pad)])
            out = run_batch(z, disp, R)
            for pos, i in enumerate(order):
                edited_lat[i] = out[pos]
            if log_fn:
                log_fn(f"edited all {V} views in one sharded batch")
        else:
            # reference-style chunking: refs prepended to every chunk
            ref_z = self.z_T[np.asarray(refs)]
            ref_disp = disparity_d[np.asarray(refs)]
            for lo in range(0, len(others), cfg.chunk_size):
                chunk = others[lo: lo + cfg.chunk_size]
                chunk_pad = chunk + [others[-1]] * (cfg.chunk_size - len(chunk))
                z = jnp.concatenate([ref_z, self.z_T[np.asarray(chunk_pad)]])
                disp = jnp.concatenate([ref_disp,
                                        disparity_d[np.asarray(chunk_pad)]])
                out = run_batch(z, disp, R)
                for pos, i in enumerate(chunk):
                    edited_lat[i] = out[R + pos]
                if lo == 0:  # ref outputs from the first chunk
                    for pos, i in enumerate(refs):
                        edited_lat[i] = out[pos]
                if log_fn:
                    log_fn(f"edited chunk {chunk}")
        lat = jnp.stack(edited_lat)

        imgs = jax.jit(lambda p, z: vae_decode(self.models, p, z))(
            self.params, lat)
        imgs = self._from_diffusion_res(imgs)
        # mask compositing: edit foreground over unedited background
        # (gc_pipeline.py:223-234)
        m = self.masks
        self.edited = m * imgs + (1.0 - m) * self.unedited
        return self

    # -- stage 3: re-optimization (gc_trainer.py:176-255) ------------------
    def reoptimize(self, num_steps: Optional[int] = None,
                   train_cfg: TrainConfig = TrainConfig(), log_fn=None,
                   ckpt_every: int = 0, ckpt_fn=None):
        assert self.edited is not None, "run edit_images() first"
        steps = num_steps if num_steps is not None else self.config.render_rate
        self.scene, metrics = reoptimize(
            self.scene, self.cameras, self.edited, steps,
            seed=self.config.seed, raster_cfg=self.raster_cfg,
            train_cfg=train_cfg, log_fn=log_fn,
            ckpt_every=ckpt_every, ckpt_fn=ckpt_fn)
        return metrics

    def run(self, log_fn=None):
        """Full edit: render_reverse -> edit_images -> reoptimize."""
        self.render_reverse(log_fn)
        self.edit_images(log_fn)
        return self.reoptimize(log_fn=log_fn)

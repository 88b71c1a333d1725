"""End-to-end GaussCtrl pipeline on tiny models (CPU, 8 virtual devices).

Key invariant: reference-style chunking re-denoises the reference views in
every chunk, but ref trajectories are chunk-independent (their queries only
attend to ref K/V) — so chunked and all-at-once editing must produce the SAME
images. That equivalence is what licenses the TPU design's single sharded
batch (SURVEY.md §2.3, §5.1.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.cameras.camera import make_cameras
from gaussctrl_tpu.core.mesh import make_mesh
from gaussctrl_tpu.diffusion.config import SDConfig
from gaussctrl_tpu.pipeline import GaussCtrlConfig, GaussCtrlPipeline, depth_to_disparity
from gaussctrl_tpu.pipeline.gaussctrl import select_ref_views
from gaussctrl_tpu.seg.masker import ThresholdMasker
from gaussctrl_tpu.splat.scene import random_scene


def _setup(V=5, size=64, **cfg_kwargs):
    scene = random_scene(jax.random.PRNGKey(0), 200, sh_degree=1, extent=0.5)
    # cameras on a ring looking at the origin
    c2ws = []
    for i in range(V):
        a = 2 * np.pi * i / V
        pos = np.array([np.sin(a) * 2, 0.0, np.cos(a) * 2])
        fwd = -pos / np.linalg.norm(pos)          # OpenGL: -z forward
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.stack([right, up, -fwd, pos], axis=1)
        c2ws.append(c2w)
    cams = make_cameras(np.asarray(c2ws, np.float32), size, size,
                        size / 2, size / 2, size, size)
    cfg = GaussCtrlConfig(edit_prompt="a red scene", reverse_prompt="a scene",
                          num_inference_steps=2, ref_view_num=2,
                          render_batch=4, **cfg_kwargs)
    pipe = GaussCtrlPipeline(cfg, scene, cams, sd_config=SDConfig.tiny(),
                             dtype=jnp.float32)
    return pipe


def test_depth_to_disparity_per_view_normalized():
    d = jnp.stack([jnp.full((4, 4, 1), 2.0), jnp.full((4, 4, 1), 8.0)])
    disp = depth_to_disparity(d)
    assert disp.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(disp.max(axis=(1, 2, 3))), 1.0, atol=1e-4)


def test_select_ref_views_one_per_subset():
    refs = select_ref_views(40, 4, seed=13789)
    assert len(refs) == 4
    # reference-exact draws (gc_pipeline.py:110-114: seeded inclusive randint
    # over floor-div anchors) — random.seed(13789) on CPython gives these
    assert refs == [4, 11, 29, 31]
    assert refs == select_ref_views(40, 4, seed=13789)  # deterministic


def test_prompt_constants_match_reference():
    """Byte-exact parity with gc_pipeline.py:104-107."""
    from gaussctrl_tpu.diffusion.clip import NEGATIVE_PROMPT, POSITIVE_SUFFIX
    assert POSITIVE_SUFFIX == ", best quality, extremely detailed"
    assert NEGATIVE_PROMPT == (
        "longbody, lowres, bad anatomy, bad hands, missing fingers, extra "
        "digit, fewer digits, cropped, worst quality, low quality")


@pytest.mark.slow
def test_pipeline_end_to_end_chunked_equals_batched():
    pipe = _setup(V=5, chunk_size=2)
    pipe.render_reverse()
    assert pipe.unedited.shape == (5, 64, 64, 3)
    assert pipe.z_T.shape[0] == 5 and np.isfinite(np.asarray(pipe.z_T)).all()
    pipe.edit_images()
    chunked = np.asarray(pipe.edited)
    assert np.isfinite(chunked).all()

    pipe.config.chunk_size = 0
    pipe.mesh = make_mesh()   # 8 virtual CPU devices — V=5 doesn't divide 8,
    pipe.mesh = None          # sharded path exercised separately below
    pipe.edit_images()
    batched = np.asarray(pipe.edited)
    np.testing.assert_allclose(chunked, batched, atol=2e-3)


def test_invert_processor_gate(monkeypatch):
    """Inversion-lane attention routing (outputs/perf_r4/ab.txt): the Pallas
    full_t processor is single-chip-TPU-only; CPU and mesh mode keep the
    XLA-partitionable einsum path; GAUSSCTRL_INVERT_ATTN overrides."""
    from gaussctrl_tpu.diffusion.processors import FlashSelfAttnProcessor
    pipe = _setup(V=3)
    assert pipe._invert_processor() is None        # CPU backend -> einsum
    monkeypatch.setenv("GAUSSCTRL_INVERT_ATTN", "full_t")
    proc = pipe._invert_processor()
    assert isinstance(proc, FlashSelfAttnProcessor)
    assert proc.kernel == "full_t"
    monkeypatch.setenv("GAUSSCTRL_INVERT_ATTN", "einsum")
    assert pipe._invert_processor() is None


@pytest.mark.slow
def test_invert_batch_split_equals_single_scan():
    """invert_batch > 0 (bounded scans with last-view padding) must produce
    the same z_T as the single-scan default — the same invariant the edit
    lane pins for chunking."""
    pipe = _setup(V=5)                 # invert_batch=0: one 5-view scan
    pipe.render_reverse()
    single = np.asarray(pipe.z_T)

    pipe2 = _setup(V=5, invert_batch=2)  # 2+2+1(padded) scans
    pipe2.render_reverse()
    np.testing.assert_allclose(np.asarray(pipe2.z_T), single, atol=2e-3)


@pytest.mark.slow
def test_pipeline_sharded_edit_equals_unsharded():
    """Sharded (8-device CPU mesh) and single-device edits must agree
    NUMERICALLY, not just run — VERDICT r1 #5. V=5 on 8 devices exercises
    the non-divisible path (padded to 8 by _round_up_views) on top of the
    sharding itself."""
    V = 5
    pipe = _setup(V=V, chunk_size=0)
    pipe.render_reverse()
    pipe.edit_images()
    single = np.asarray(pipe.edited)

    pipe2 = _setup(V=V, chunk_size=0)
    pipe2.mesh = make_mesh()
    pipe2.render_reverse()
    pipe2.edit_images()
    sharded = np.asarray(pipe2.edited)

    assert sharded.shape == (V, 64, 64, 3)
    np.testing.assert_allclose(sharded, single, atol=2e-3)


@pytest.mark.slow
def test_pipeline_full_run_sharded_equals_unsharded():
    """The FULL pipeline.run() — sharded render_reverse + inversion + edit +
    re-optimization — must agree with the single-device run (VERDICT r3 #5:
    only edit_images had this guarantee at pipeline level). V=5 on the
    8-device mesh also exercises the mesh-padding path end to end."""
    V = 5
    pipe = _setup(V=V, chunk_size=0, render_rate=3)
    m1 = pipe.run()
    single_edit = np.asarray(pipe.edited)
    single_means = np.asarray(pipe.scene.means)

    pipe2 = _setup(V=V, chunk_size=0, render_rate=3)
    pipe2.mesh = make_mesh()
    m2 = pipe2.run()
    np.testing.assert_allclose(np.asarray(pipe2.edited), single_edit,
                               atol=2e-3)
    # re-opt consumes the (equal) edits with the same seed: the final
    # scenes must match too (tolerance covers edit deltas amplified by
    # 3 optimization steps)
    np.testing.assert_allclose(np.asarray(pipe2.scene.means), single_means,
                               atol=5e-3)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_pipeline_mask_composite():
    pipe = _setup(V=5, chunk_size=0, langsam_obj="bright")
    pipe.masker = ThresholdMasker(threshold=10.0)  # nothing is that bright
    pipe.render_reverse()
    pipe.edit_images()
    # all-zero mask -> edited image must equal the unedited render
    np.testing.assert_allclose(np.asarray(pipe.edited),
                               np.asarray(pipe.unedited), atol=1e-5)


@pytest.mark.slow
def test_pipeline_artifact_resume_roundtrip():
    """Artifacts dumped in the reference layout reload into an equivalent
    pipeline state (the interrupted-edit resume path)."""
    pipe = _setup(V=5, chunk_size=0)
    pipe.render_reverse()
    train_data = [
        {"unedited_image": np.asarray(pipe.unedited[i]),
         # reference layouts: depth [1,H,W], z0 [1,4,h,w] channel-first
         "depth_image": np.asarray(pipe.depths[i]).transpose(2, 0, 1),
         "z_0_image": np.asarray(pipe.z_T[i]).transpose(2, 0, 1)[None],
         "mask_image": np.asarray(pipe.masks[i][..., 0])}
        for i in range(5)]

    pipe2 = _setup(V=5, chunk_size=0)
    assert pipe2.load_artifacts(train_data)
    np.testing.assert_allclose(np.asarray(pipe2.z_T), np.asarray(pipe.z_T),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pipe2.depths),
                               np.asarray(pipe.depths), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pipe2.disparity),
                               np.asarray(pipe.disparity), atol=1e-5)
    pipe2.edit_images()
    assert pipe2.edited.shape == (5, 64, 64, 3)
    # incomplete artifacts must refuse (forcing a fresh render_reverse)
    assert not _setup(V=5).load_artifacts(train_data[:-1] + [{}])


@pytest.mark.slow
def test_pipeline_reoptimize_improves_loss():
    pipe = _setup(V=5, chunk_size=0)
    pipe.render_reverse()
    pipe.edited = pipe.unedited  # no-op edit: re-opt against the renders
    m = pipe.reoptimize(num_steps=5)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_render_reverse_pallas_lane_matches_vmap():
    """The single-chip Pallas render lane (lax.map over single-view kernel
    calls, taken when blend_impl resolves to 'pallas' with no mesh) must
    produce the same renders as the default vmapped XLA path (VERDICT r2 #5:
    render_reverse over 40 views should not be stuck on the slow blend)."""
    from gaussctrl_tpu.splat.rasterize import RasterConfig

    pipe_x = _setup(V=3)
    pipe_p = _setup(V=3)
    pipe_p.raster_cfg = RasterConfig(blend_impl="pallas")  # forces the lane
    # share weights so the DDIM inversions agree too
    pipe_p.params = pipe_x.params
    pipe_x.render_reverse()
    pipe_p.render_reverse()
    np.testing.assert_allclose(np.asarray(pipe_p.unedited),
                               np.asarray(pipe_x.unedited),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pipe_p.depths),
                               np.asarray(pipe_x.depths),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_non_divisible_resolution_edits():
    """Scenes whose resolution is NOT a multiple of the diffusion stack's
    divisibility requirement (VAE 8x times UNet skip alignment) must still
    edit: the pipeline resizes into/out of the stack (the reference instead
    REQUIRES 512x512 inputs, gc_pipeline.py:132). 40x40 with the tiny
    2-level config needs 48x48 internally."""
    pipe = _setup(V=3, size=40, chunk_size=0)
    rh, rw = pipe._diffusion_hw()
    assert (rh, rw) == (48, 48)
    pipe.render_reverse()
    assert pipe.unedited.shape[1:3] == (40, 40)     # camera res preserved
    assert pipe.z_T.shape[1:3] == (48 // 8, 48 // 8)  # latents at stack res
    pipe.edit_images()
    assert pipe.edited.shape[1:3] == (40, 40)
    assert np.isfinite(np.asarray(pipe.edited)).all()

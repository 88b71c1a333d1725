"""Archival checkpoint compression: fp16 payload must resume as f32.

Pinned because mid-run pre-training checkpoints are committed to git in
compressed form (outputs/bear_r3c) and a later round resumes training
from them (cli/splat_train.py --resume-checkpoint); the resume path must
come back at full precision regardless of the stored payload dtype.
"""

import numpy as np
import jax.numpy as jnp

from gaussctrl_tpu.core.ckpt import (
    compress_scene_npz, load_scene_npz, save_checkpoint)
from gaussctrl_tpu.splat.scene import GaussianScene


def _scene(n=257, seed=3):
    r = np.random.RandomState(seed)
    return GaussianScene(
        means=jnp.asarray(r.randn(n, 3).astype(np.float32) * 2.0),
        scales=jnp.asarray(r.randn(n, 3).astype(np.float32) - 4.0),
        quats=jnp.asarray(r.randn(n, 4).astype(np.float32)),
        opacities=jnp.asarray(r.randn(n, 1).astype(np.float32)),
        features_dc=jnp.asarray(r.randn(n, 3).astype(np.float32)),
        features_rest=jnp.asarray(r.randn(n, 15, 3).astype(np.float32) * 0.1),
    )


def test_compress_scene_roundtrip(tmp_path):
    scene = _scene()
    src = save_checkpoint(tmp_path, 1234, scene)
    dst = compress_scene_npz(src, tmp_path / "step-000001234.fp16.npz")

    got = load_scene_npz(dst)
    # resume precision contract: everything is f32 again
    for k in ("means", "scales", "quats", "opacities",
              "features_dc", "features_rest"):
        assert getattr(got, k).dtype == jnp.float32, k

    # means are archived losslessly; others within fp16 quantization
    np.testing.assert_array_equal(np.asarray(got.means),
                                  np.asarray(scene.means))
    for k in ("scales", "quats", "opacities", "features_dc",
              "features_rest"):
        a, b = np.asarray(getattr(got, k)), np.asarray(getattr(scene, k))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    # and it actually compresses (the point of the exercise)
    assert dst.stat().st_size < src.stat().st_size


def test_load_scene_npz_casts_fp16(tmp_path):
    scene = _scene(64)
    flat = {k: np.asarray(getattr(scene, k), np.float16)
            for k in ("means", "scales", "quats", "opacities",
                      "features_dc", "features_rest")}
    p = tmp_path / "half.npz"
    np.savez_compressed(p, **flat)
    got = load_scene_npz(p)
    assert got.means.dtype == jnp.float32


def test_save_ckpt_archive_cycle(tmp_path):
    from gaussctrl_tpu.cli.splat_train import _save_ckpt
    s = _scene(32)
    _save_ckpt(tmp_path, 500, s, archive=True)
    _save_ckpt(tmp_path, 1000, s, archive=True)
    files = sorted(p.name for p in tmp_path.iterdir())
    # latest-only for BOTH cycles; f32 prune must spare the archive
    assert files == ["step-000001000.fp16.npz", "step-000001000.npz"]
    got = load_scene_npz(tmp_path / "step-000001000.fp16.npz")
    assert got.means.dtype == jnp.float32

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


def test_archive_prune_spares_git_tracked(tmp_path):
    """Round-3 regression: the latest-only cycle unlinked archives that
    were committed to git, so the end-of-round snapshot committed their
    deletion and HEAD lost every pre-training checkpoint. Pruning must
    never remove a git-tracked archive; retirement belongs to the
    committer (scripts/commit_archives.py) which replaces it in the same
    commit that adds the newer one."""
    import subprocess

    from gaussctrl_tpu.cli.splat_train import _save_ckpt

    ckpts = tmp_path / "run" / "ckpts"
    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    for k, v in (("user.email", "t@t"), ("user.name", "t")):
        subprocess.run(["git", "-C", str(tmp_path), "config", k, v],
                       check=True)
    s = _scene(32)
    _save_ckpt(ckpts, 500, s, archive=True)
    subprocess.run(["git", "-C", str(tmp_path), "add", "-f",
                    "run/ckpts/step-000000500.fp16.npz"], check=True)
    subprocess.run(["git", "-C", str(tmp_path), "commit", "-qm",
                    "archive 500"], check=True)

    _save_ckpt(ckpts, 1000, s, archive=True)  # untracked: pruned next cycle
    _save_ckpt(ckpts, 1500, s, archive=True)
    arcs = sorted(p.name for p in ckpts.glob("*.fp16.npz"))
    assert arcs == ["step-000000500.fp16.npz", "step-000001500.fp16.npz"]

    # the committer retires the tracked 500 in the same commit as 1500
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "commit_archives", "scripts/commit_archives.py")
    ca = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ca)
    assert ca.commit_newest(ckpts, tmp_path, "test")
    tracked = subprocess.run(
        ["git", "-C", str(tmp_path), "ls-files"],
        capture_output=True, text=True, check=True).stdout.split()
    assert tracked == ["run/ckpts/step-000001500.fp16.npz"]
    assert not (ckpts / "step-000000500.fp16.npz").exists()

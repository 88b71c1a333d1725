"""Data layer: PLY reader, dataparser against the bundled bear scene, ckpt IO."""

from pathlib import Path

import numpy as np
import pytest

from gaussctrl_tpu.data.dataparser import (
    DataparserConfig, auto_orient_and_center_poses, parse_dataset,
)
from gaussctrl_tpu.data.ply import read_ply, read_point_cloud, write_ply

BEAR = Path("/root/reference/data/bear")


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    write_ply(tmp_path / "pc.ply", pts, cols)
    pts2, cols2 = read_point_cloud(tmp_path / "pc.ply")
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0 + 1e-6)


@pytest.mark.skipif(not BEAR.exists(), reason="reference data not mounted")
def test_read_bear_ply():
    v = read_ply(BEAR / "sparse_pc.ply")
    assert v["x"].shape == (34174,)
    assert v["red"].dtype == np.uint8


def test_auto_orient_centers_and_aligns_up(rng):
    n = 12
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3)) + 5.0
    # up vectors all pointing along +x ⇒ rotation must map x→z
    poses[:, :3, 1] = [1.0, 0.0, 0.0]
    oriented, transform = auto_orient_and_center_poses(poses)
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(oriented[:, :3, 1], np.tile([[0, 0, 1.0]], (n, 1)), atol=1e-5)


@pytest.mark.skipif(not BEAR.exists(), reason="reference data not mounted")
def test_parse_bear_dataset():
    out = parse_dataset(DataparserConfig(data=BEAR))
    assert len(out) == 96                       # README: bear has 96 views
    assert out.width == 512 and out.height == 512
    # frames sorted by filename
    names = [p.name for p in out.image_filenames]
    assert names == sorted(names)
    # poses centered and scaled into the unit box
    assert np.max(np.abs(out.c2w[:, :3, 3])) <= 1.0 + 1e-5
    assert abs(np.max(np.abs(out.c2w[:, :3, 3])) - 1.0) < 1e-4
    # OPENCV distortion propagated
    assert np.any(out.distortion[:, 0] != 0)
    # sparse points transformed along with the cameras
    assert out.points_xyz is not None and out.points_xyz.shape == (34174, 3)
    assert out.points_rgb.min() >= 0 and out.points_rgb.max() <= 1


def test_ckpt_pytree_roundtrip(tmp_path):
    import jax
    from gaussctrl_tpu.core.ckpt import (
        checkpoint_step, latest_checkpoint, load_pytree, save_checkpoint,
    )
    from gaussctrl_tpu.splat.scene import random_scene

    scene = random_scene(jax.random.PRNGKey(1), 50)
    p1 = save_checkpoint(tmp_path, 100, scene)
    p2 = save_checkpoint(tmp_path, 200, scene)
    assert latest_checkpoint(tmp_path) == p2
    assert not p1.exists()                      # latest-only pruning
    assert checkpoint_step(p2) == 200
    scene2 = load_pytree(p2, scene)
    np.testing.assert_allclose(np.asarray(scene2.means), np.asarray(scene.means))


def test_orbax_sharded_ckpt_roundtrip(tmp_path):
    """Save a gaussian-axis-sharded scene via orbax; restore it already laid
    out on the mesh (the multi-host checkpoint path, ROADMAP item 10)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gaussctrl_tpu.core.ckpt import (
        latest_checkpoint, load_checkpoint_sharded, save_checkpoint_sharded,
    )
    from gaussctrl_tpu.core.mesh import make_mesh
    from gaussctrl_tpu.splat.scene import random_scene

    mesh = make_mesh()                         # 8 virtual CPU devices
    sh = NamedSharding(mesh, P("view"))
    scene = jax.device_put(random_scene(jax.random.PRNGKey(2), 64), sh)
    p1 = save_checkpoint_sharded(tmp_path, 100, scene)
    p2 = save_checkpoint_sharded(tmp_path, 250, scene)
    assert not p1.exists() and p2.exists()     # latest-only pruning
    assert latest_checkpoint(tmp_path) == p2
    back = load_checkpoint_sharded(p2, like=scene, sharding=sh)
    np.testing.assert_allclose(np.asarray(back.means),
                               np.asarray(scene.means))
    assert back.means.sharding.is_equivalent_to(sh, back.means.ndim)


def test_import_splatfacto_ckpt(tmp_path):
    import torch

    from gaussctrl_tpu.core.ckpt import import_splatfacto_ckpt

    n = 17
    state = {
        "_model.gauss_params.means": torch.randn(n, 3),
        "_model.gauss_params.scales": torch.randn(n, 3),
        "_model.gauss_params.quats": torch.randn(n, 4),
        "_model.gauss_params.opacities": torch.randn(n, 1),
        "_model.gauss_params.features_dc": torch.randn(n, 3),
        "_model.gauss_params.features_rest": torch.randn(n, 15, 3),
        "_model.camera_optimizer.pose_adjustment": torch.zeros(3, 6),
    }
    torch.save({"step": 29999, "pipeline": state}, tmp_path / "step-000029999.ckpt")
    scene, step = import_splatfacto_ckpt(tmp_path / "step-000029999.ckpt")
    assert step == 29999
    assert scene.num_gaussians == n
    assert scene.sh_degree == 3
    np.testing.assert_allclose(
        np.asarray(scene.means), state["_model.gauss_params.means"].numpy(), rtol=1e-6
    )


def test_bundled_example_scene_parses():
    """The vendored data/example_scene (scripts/make_example_scene.py) obeys
    the dataparser contract end-to-end: frames, intrinsics, sparse points —
    so every CLI is demoable without external data (the reference bundles
    real captures under data/; SURVEY §2.1 row 13)."""
    from gaussctrl_tpu.data.dataparser import DataparserConfig, parse_dataset

    cfg = DataparserConfig(data="data/example_scene")
    out = parse_dataset(cfg)
    assert len(out.image_filenames) == 12
    assert out.width == out.height == 200
    assert out.points_xyz is not None and len(out.points_xyz) == 2600
    assert out.points_rgb is not None
    import cv2
    img = cv2.imread(str(out.image_filenames[0]))
    assert img is not None and img.shape == (200, 200, 3)


def test_gaussian_ply_roundtrip(tmp_path):
    """INRIA 3DGS PLY export/import round-trips a scene exactly (the
    ns-export gaussian-splat role + the original gaussian-splatting
    save_ply layout: channel-major f_rest, raw logit opacity, log scales,
    wxyz rotation)."""
    import jax

    from gaussctrl_tpu.data.ply import read_gaussian_ply, write_gaussian_ply
    from gaussctrl_tpu.splat.scene import random_scene

    scene = random_scene(jax.random.PRNGKey(3), 17, sh_degree=3)
    p = tmp_path / "scene.ply"
    write_gaussian_ply(p, scene)
    back = read_gaussian_ply(p)
    for a, b in zip(jax.tree_util.tree_leaves(scene),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   rtol=0, atol=0)
    assert back.sh_degree == 3


def test_gaussian_ply_renders_same(tmp_path):
    """A PLY round-tripped scene renders pixel-identically."""
    import jax
    import jax.numpy as jnp

    from gaussctrl_tpu.data.ply import read_gaussian_ply, write_gaussian_ply
    from gaussctrl_tpu.splat.render import render_rgbd
    from gaussctrl_tpu.splat.scene import random_scene

    scene = random_scene(jax.random.PRNGKey(4), 50, sh_degree=1)
    p = tmp_path / "s.ply"
    write_gaussian_ply(p, scene)
    back = read_gaussian_ply(p)
    c2w = jnp.eye(4)[:3].at[2, 3].set(2.5)
    a = render_rgbd(scene, c2w, 60., 60., 32., 32., 64, 64, jnp.zeros(3))
    b = render_rgbd(back, c2w, 60., 60., 32., 32., 64, 64, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-6)

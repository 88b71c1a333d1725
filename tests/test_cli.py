"""End-to-end CLI drive: train (tiny SD) then render, on a synthetic scene."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from PIL import Image

    import jax
    from gaussctrl_tpu.core.ckpt import save_pytree
    from gaussctrl_tpu.splat.scene import random_scene

    d = tmp_path_factory.mktemp("synth_scene")
    (d / "images").mkdir()
    rng = np.random.default_rng(0)
    frames = []
    V = 4
    for i in range(V):
        a = 2 * np.pi * i / V
        pos = np.array([np.sin(a) * 2, 0.2, np.cos(a) * 2])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        m = np.eye(4)
        m[:3, :3] = np.stack([right, up, -fwd], axis=1)
        m[:3, 3] = pos
        name = f"images/frame_{i + 1:05d}.jpg"
        Image.fromarray((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
                        ).save(d / name)
        frames.append({"file_path": name, "transform_matrix": m.tolist()})
    meta = {"w": 64, "h": 64, "fl_x": 64.0, "fl_y": 64.0, "cx": 32.0,
            "cy": 32.0, "camera_model": "OPENCV", "frames": frames}
    (d / "transforms.json").write_text(json.dumps(meta))

    scene = random_scene(jax.random.PRNGKey(0), 128, sh_degree=1, extent=0.4)
    save_pytree(d / "scene.npz", scene)
    return d


@pytest.mark.slow
def test_train_cli_end_to_end(scene_dir, tmp_path):
    from gaussctrl_tpu.cli.train import main

    out = main([
        "--data", str(scene_dir),
        "--load-checkpoint", str(scene_dir / "scene.npz"),
        "--output-dir", str(tmp_path / "outputs"),
        "--tiny-sd",
        "--pipeline.edit_prompt", "a bronze statue",
        "--pipeline.num_inference_steps", "1",
        "--pipeline.chunk_size", "0",
        "--pipeline.ref_view_num", "2",
        "--pipeline.render_rate", "2",
        "--pipeline.render_batch", "2",
    ])
    assert (out / "config.json").exists()
    assert len(list((out / "edited").glob("*.png"))) == 4
    # artifact layout follows the dataparser's auto-discovery contract
    for artifact in ("depth_npy", "z_0", "mask_npy"):
        assert len(list((out / artifact).glob("frame_*.npy"))) == 4
    assert len(list((out / "unedited").glob("frame_*.jpg"))) == 4
    ckpts = list((out / "ckpts").glob("step-*.npz"))
    assert len(ckpts) == 1
    # edited ckpt renders through the render CLI
    from gaussctrl_tpu.cli.render import main as render_main
    rd = tmp_path / "renders"
    render_main(["dataset", "--load-checkpoint", str(ckpts[0]),
                 "--data", str(scene_dir), "--output-path", str(rd),
                 "--rendered-output-names", "rgb", "depth",
                 "--save-depth-npy"])
    assert len(list((rd / "rgb").glob("*.png"))) == 4
    assert len(list((rd / "depth_npy").glob("*.npy"))) == 4


@pytest.mark.slow
def test_render_cli_spiral_and_interpolate(scene_dir, tmp_path):
    from gaussctrl_tpu.cli.render import main as render_main

    rd = tmp_path / "spiral"
    render_main(["spiral", "--load-checkpoint", str(scene_dir / "scene.npz"),
                 "--data", str(scene_dir), "--output-path", str(rd),
                 "--frames", "3"])
    assert len(list((rd / "rgb").glob("*.png"))) == 3

    rd = tmp_path / "interp"
    render_main(["interpolate", "--load-checkpoint",
                 str(scene_dir / "scene.npz"), "--data", str(scene_dir),
                 "--output-path", str(rd), "--interpolation-steps", "2",
                 "--rendered-output-names", "rgb", "depth"])
    assert len(list((rd / "rgb").glob("*.png"))) == 6  # (V-1) * steps
    assert len(list((rd / "depth").glob("*.png"))) == 6


@pytest.mark.slow
def test_render_cli_camera_path(scene_dir, tmp_path):
    from gaussctrl_tpu.cli.render import main as render_main

    path_json = {
        "render_height": 48, "render_width": 48, "fps": 5,
        "camera_path": [
            {"camera_to_world": np.eye(4).flatten().tolist(), "fov": 60},
            {"camera_to_world": (np.eye(4) + 0.01).flatten().tolist(), "fov": 60},
        ],
    }
    p = tmp_path / "path.json"
    p.write_text(json.dumps(path_json))
    rd = tmp_path / "cam_renders"
    render_main(["camera-path", "--load-checkpoint", str(scene_dir / "scene.npz"),
                 "--camera-path-filename", str(p), "--output-path", str(rd),
                 "--output-format", "video"])
    assert (rd / "rgb.mp4").exists()

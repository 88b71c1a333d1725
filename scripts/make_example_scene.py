"""Generate the bundled example scene (data/example_scene/).

The reference vendors real capture data under data/ (README.md:100-113);
zero-egress environments can't, so this script deterministically builds a
small synthetic capture in the exact on-disk contract `data/dataparser.py`
parses (transforms.json + images/ + points3d.ply) — enough to smoke every
CLI (splat_train, train, render, viewer) without external data:

    python scripts/make_example_scene.py [out_dir]

The scene is a colored gaussian "rock garden": three blobs and a ground
slab, rendered from a 12-view orbit at 200x200.
"""

import json
import sys
from pathlib import Path

import numpy as np


def build_points(rng):
    pts, cols = [], []
    blobs = [  # (center, scale, base color)
        ((0.0, 0.15, 0.0), 0.18, (0.85, 0.3, 0.2)),
        ((-0.35, 0.05, 0.15), 0.11, (0.2, 0.55, 0.85)),
        ((0.3, 0.0, -0.2), 0.13, (0.9, 0.75, 0.2)),
    ]
    for (c, s, col) in blobs:
        n = 600
        p = rng.normal(size=(n, 3)) * s + np.asarray(c)
        shade = 1.0 - 0.6 * rng.random((n, 1))
        pts.append(p)
        cols.append(np.asarray(col) * shade + 0.05)
    # ground slab
    n = 800
    g = np.stack([rng.uniform(-0.8, 0.8, n), np.full(n, -0.12)
                  + rng.normal(size=n) * 0.01, rng.uniform(-0.8, 0.8, n)], -1)
    checker = ((np.floor(g[:, 0] * 4) + np.floor(g[:, 2] * 4)) % 2)[:, None]
    pts.append(g)
    cols.append(0.25 + 0.35 * checker * np.ones((n, 3)))
    return (np.concatenate(pts).astype(np.float32),
            np.clip(np.concatenate(cols), 0, 1).astype(np.float32))


def orbit_c2ws(v, radius=1.6, height=0.55):
    """OpenGL-convention c2w ring looking at the origin."""
    out = []
    for i in range(v):
        a = 2 * np.pi * i / v
        pos = np.array([np.sin(a) * radius, height, np.cos(a) * radius])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :4] = np.stack([right, up, -fwd, pos], axis=1)
        out.append(c2w)
    return out


def main(out_dir="data/example_scene", v=12, size=200):
    import cv2
    import jax
    import jax.numpy as jnp

    # this box's sitecustomize pre-imports jax pinned to the hardware
    # platform; generation is CPU work (and must not hang when the TPU
    # tunnel is down), so force the platform directly (cf. tests/conftest.py)
    jax.config.update("jax_platforms",
                      __import__("os").environ.get("GAUSSCTRL_PLATFORM",
                                                   "cpu"))

    from gaussctrl_tpu.data.ply import write_ply
    from gaussctrl_tpu.splat.render import render_rgbd
    from gaussctrl_tpu.splat.scene import from_points

    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    pts, cols = build_points(rng)
    write_ply(out / "points3d.ply", pts, (cols * 255).astype(np.uint8))

    scene = from_points(pts, cols, sh_degree=1)
    f = size * 1.1
    render = jax.jit(lambda s, c2w: render_rgbd(
        s, c2w, f, f, size / 2, size / 2, size, size,
        jnp.full((3,), 0.72), sh_degree=1)["rgb"])  # compile ONCE for 12 views
    frames = []
    for i, c2w in enumerate(orbit_c2ws(v)):
        img = render(scene, jnp.asarray(c2w[:3]))
        img = np.asarray(np.clip(img, 0, 1) * 255).astype(np.uint8)
        name = f"frame_{i + 1:05d}.jpg"
        cv2.imwrite(str(out / "images" / name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": c2w.tolist()})
    meta = {"w": size, "h": size, "fl_x": f, "fl_y": f,
            "cx": size / 2, "cy": size / 2, "camera_model": "OPENCV",
            "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0,
            "ply_file_path": "points3d.ply", "frames": frames}
    with open(out / "transforms.json", "w") as fjson:
        json.dump(meta, fjson, indent=1)
    print(f"[example-scene] wrote {v} views + {len(pts)} points -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])

"""Viewer server: page + render endpoint over real HTTP (tiny scene, CPU)."""

import json
import urllib.request

import jax

from gaussctrl_tpu.splat.scene import random_scene
from gaussctrl_tpu.viewer import ViewerServer


def test_viewer_serves_page_and_frames():
    scene = random_scene(jax.random.PRNGKey(0), 50, sh_degree=1, extent=0.4)
    server = ViewerServer(scene, width=64, height=64, port=0)
    server.serve(blocking=False)
    try:
        port = server.httpd.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"gaussctrl_tpu viewer" in page

        body = json.dumps({"az": 0.3, "el": 0.2, "r": 2.5,
                           "center": [0, 0, 0], "depth": False}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/render",
                                     data=body)
        jpeg = urllib.request.urlopen(req, timeout=120).read()
        assert jpeg[:2] == b"\xff\xd8"  # JPEG magic

        body = json.dumps({"az": 0.3, "el": 0.2, "r": 2.5,
                           "center": [0, 0, 0], "depth": True}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/render",
                                     data=body)
        jpeg = urllib.request.urlopen(req, timeout=120).read()
        assert jpeg[:2] == b"\xff\xd8"
    finally:
        server.shutdown()


def test_viewer_modes_markers_and_view_jump():
    """Output-type switching, train-camera markers, exact train-view jump."""
    import numpy as np
    from gaussctrl_tpu.cameras.camera import make_cameras
    scene = random_scene(jax.random.PRNGKey(1), 50, sh_degree=1, extent=0.4)
    c2ws = np.stack([np.eye(4)[:3] + 0.0 for _ in range(3)])
    c2ws[:, 2, 3] = [2.0, 2.5, 3.0]
    cams = make_cameras(c2ws.astype(np.float32), 64, 64, 32, 32, 64, 64)
    server = ViewerServer(scene, width=64, height=64, port=0, cameras=cams)
    server.serve(blocking=False)
    try:
        port = server.httpd.server_address[1]
        info = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=30).read())
        assert info["num_views"] == 3 and info["num_gaussians"] == 50
        for q in (
            {"az": 0.1, "el": 0.1, "r": 2.5, "center": [0, 0, 0],
             "mode": "alpha", "view": -1},
            {"az": 0.1, "el": 0.1, "r": 2.5, "center": [0, 0, 0],
             "mode": "rgb", "markers": True, "view": -1},
            {"az": 0, "el": 0, "r": 0, "center": [0, 0, 0],
             "mode": "depth", "view": 1},          # exact train view 1
        ):
            req = urllib.request.Request(f"http://127.0.0.1:{port}/render",
                                         data=json.dumps(q).encode())
            jpeg = urllib.request.urlopen(req, timeout=120).read()
            assert jpeg[:2] == b"\xff\xd8", q
    finally:
        server.shutdown()

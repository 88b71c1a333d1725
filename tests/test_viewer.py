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

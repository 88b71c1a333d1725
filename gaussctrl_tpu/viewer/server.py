"""Minimal web viewer: orbit the scene in a browser, rendered server-side.

Replaces the reference's viser-based eval viewer
(/root/reference/gaussctrl/gc_viewer.py:49-124 — load ckpt, serve a viewport,
idle loop) with a dependency-free HTTP server: the browser posts orbit camera
parameters, the server renders via the jitted splat renderer (static shape ⇒
one compile per resolution) and streams JPEG frames back.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gaussctrl_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#v{display:block;margin:auto;margin-top:8px}
#hud{position:fixed;top:8px;left:8px}
</style></head><body>
<img id="v" width="%WIDTH%" height="%HEIGHT%">
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan<br>
<label><input type="checkbox" id="depth"> depth</label></div>
<script>
let az=0, el=0.3, r=2.5, cx=0, cy=0, cz=0, busy=false, dirty=true;
const img=document.getElementById('v');
async function tick(){
  if(dirty && !busy){ busy=true; dirty=false;
    const q = {az:az, el:el, r:r, center:[cx,cy,cz],
               depth:document.getElementById('depth').checked};
    const res = await fetch('/render', {method:'POST', body:JSON.stringify(q)});
    const blob = await res.blob();
    img.src = URL.createObjectURL(blob);
    busy=false; }
  requestAnimationFrame(tick); }
let drag=null;
img.onmousedown = e=>{drag=[e.clientX,e.clientY,e.shiftKey];};
window.onmouseup = ()=>{drag=null;};
window.onmousemove = e=>{ if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){ cx-=dx*0.002*r; cy+=dy*0.002*r; }
  else { az-=dx*0.005; el=Math.max(-1.5,Math.min(1.5,el+dy*0.005)); }
  drag=[e.clientX,e.clientY,drag[2]]; dirty=true; };
img.onwheel = e=>{ r*=Math.exp(e.deltaY*0.001); dirty=true; e.preventDefault(); };
document.getElementById('depth').onchange=()=>{dirty=true;};
tick();
</script></body></html>"""


def _orbit_c2w(az: float, el: float, radius: float, center) -> np.ndarray:
    """OpenGL c2w looking at `center` from spherical (az, el, r)."""
    pos = np.array(center) + radius * np.array([
        np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)])
    fwd = (np.array(center) - pos)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    n = np.linalg.norm(right)
    right = right / n if n > 1e-6 else np.array([1.0, 0.0, 0.0])
    up = np.cross(right, fwd)
    return np.stack([right, up, -fwd, pos], axis=1).astype(np.float32)


class ViewerServer:
    def __init__(self, scene, width: int = 512, height: int = 512,
                 focal: float | None = None, port: int = 7007):
        import jax.numpy as jnp

        from gaussctrl_tpu.splat.render import render_rgbd

        self.scene = scene
        self.width, self.height = width, height
        self.focal = focal or 1.1 * max(width, height)
        self.port = port
        self._render = render_rgbd
        self._jnp = jnp

    def _frame(self, q) -> bytes:
        from PIL import Image
        jnp = self._jnp

        c2w = jnp.asarray(_orbit_c2w(q["az"], q["el"], q["r"], q["center"]))
        out = self._render(self.scene, c2w, self.focal, self.focal,
                           self.width / 2, self.height / 2,
                           self.width, self.height, jnp.zeros(3))
        if q.get("depth"):
            d = np.asarray(out["depth"][..., 0])
            lo, hi = np.percentile(d[d < 999], [2, 98]) if (d < 999).any() else (0, 1)
            arr = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
            arr = (np.stack([arr] * 3, -1) * 255).astype(np.uint8)
        else:
            arr = np.asarray(np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def serve(self, blocking: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                page = (_PAGE.replace("%WIDTH%", str(viewer.width))
                        .replace("%HEIGHT%", str(viewer.height)))
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page.encode())

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                q = json.loads(self.rfile.read(n))
                jpeg = viewer._frame(q)
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(jpeg)

        self.httpd = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"[viewer] http://localhost:{self.port}", flush=True)
        if blocking:
            self.httpd.serve_forever()
        else:
            t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
            t.start()
            return t

    def shutdown(self):
        if hasattr(self, "httpd"):
            self.httpd.shutdown()

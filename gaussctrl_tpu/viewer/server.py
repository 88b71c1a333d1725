"""Minimal web viewer: orbit the scene in a browser, rendered server-side.

Replaces the reference's viser-based eval viewer
(/root/reference/gaussctrl/gc_viewer.py:49-124 — load ckpt, serve a viewport,
idle loop) with a dependency-free HTTP server: the browser posts orbit camera
parameters, the server renders via the jitted splat renderer (static shape ⇒
one compile per resolution) and streams JPEG frames back.

Controls at parity with the reference viewer's everyday use: output-type
switching (rgb / depth / accumulation), training-camera markers projected
into the viewport, and exact jump-to-train-view (gc_viewer serves these
through viser's output-type dropdown and camera frustum handles).
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
#hud{position:fixed;top:8px;left:8px;line-height:1.7}
select,input,button{background:#222;color:#ddd;border:1px solid #555}
#view{width:3em}
</style></head><body>
<img id="v" width="%WIDTH%" height="%HEIGHT%">
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan<br>
output <select id="mode"><option value="rgb">rgb</option>
<option value="depth">depth</option>
<option value="alpha">accumulation</option></select><br>
<label><input type="checkbox" id="markers"> train cameras</label><br>
view <input type="number" id="view" min="0" value="0">
<button id="goto">go</button> <button id="orbit">orbit</button>
<span id="nviews"></span></div>
<script>
let az=0, el=0.3, r=2.5, cx=0, cy=0, cz=0, busy=false, dirty=true, view=-1;
const img=document.getElementById('v');
fetch('/info').then(r=>r.json()).then(i=>{
  document.getElementById('nviews').textContent = i.num_views ?
    'of ' + i.num_views : '(no cameras)'; });
async function tick(){
  if(dirty && !busy){ busy=true; dirty=false;
    const q = {az:az, el:el, r:r, center:[cx,cy,cz],
               mode:document.getElementById('mode').value,
               markers:document.getElementById('markers').checked,
               view:view};
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
  drag=[e.clientX,e.clientY,drag[2]]; view=-1; dirty=true; };
img.onwheel = e=>{ r*=Math.exp(e.deltaY*0.001); view=-1; dirty=true;
  e.preventDefault(); };
document.getElementById('mode').onchange=()=>{dirty=true;};
document.getElementById('markers').onchange=()=>{dirty=true;};
document.getElementById('goto').onclick=()=>{
  view=parseInt(document.getElementById('view').value)||0; dirty=true;};
document.getElementById('orbit').onclick=()=>{view=-1; dirty=true;};
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
                 focal: float | None = None, port: int = 7007, cameras=None):
        import jax.numpy as jnp

        from gaussctrl_tpu.splat.render import render_rgbd

        self.scene = scene
        self.cameras = cameras        # optional Cameras for markers / jumps
        self.width, self.height = width, height
        self.focal = focal or 1.1 * max(width, height)
        self.port = port
        self._render = render_rgbd
        self._jnp = jnp

    def _cam_for(self, q):
        """(c2w, fx, fy) for the request — train view or orbit camera."""
        v = int(q.get("view", -1))
        if self.cameras is not None and 0 <= v < len(self.cameras):
            c = self.cameras
            sx = self.width / float(c.width)
            sy = self.height / float(c.height)
            return (np.asarray(c.c2w[v], np.float32),
                    float(c.fx[v]) * sx, float(c.fy[v]) * sy)
        return (_orbit_c2w(q["az"], q["el"], q["r"], q["center"]),
                self.focal, self.focal)

    def _draw_markers(self, arr: np.ndarray, c2w: np.ndarray, fx, fy):
        """Project train-camera centers into the viewport (green squares)."""
        if self.cameras is None:
            return arr
        centers = np.asarray(self.cameras.c2w)[:, :, 3]            # [V, 3]
        R, t = c2w[:, :3], c2w[:, 3]
        pc = (centers - t) @ R                                     # world->cam
        z = -pc[:, 2]                                              # OpenGL fwd
        ok = z > 1e-3
        u = (fx * pc[:, 0] / np.maximum(z, 1e-3) + self.width / 2).astype(int)
        v = (-fy * pc[:, 1] / np.maximum(z, 1e-3) + self.height / 2).astype(int)
        for i in np.nonzero(ok)[0]:
            x, y = u[i], v[i]
            if 1 <= x < self.width - 1 and 1 <= y < self.height - 1:
                arr[y - 1: y + 2, x - 1: x + 2] = (0, 255, 90)
        return arr

    def _frame(self, q) -> bytes:
        from PIL import Image
        jnp = self._jnp

        c2w_np, fx, fy = self._cam_for(q)
        out = self._render(self.scene, jnp.asarray(c2w_np), fx, fy,
                           self.width / 2, self.height / 2,
                           self.width, self.height, jnp.zeros(3))
        mode = q.get("mode", "depth" if q.get("depth") else "rgb")
        if mode == "depth":
            d = np.asarray(out["depth"][..., 0])
            lo, hi = np.percentile(d[d < 999], [2, 98]) if (d < 999).any() else (0, 1)
            arr = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
            arr = (np.stack([arr] * 3, -1) * 255).astype(np.uint8)
        elif mode == "alpha":
            a = np.clip(np.asarray(out["accumulation"][..., 0]), 0, 1)
            arr = (np.stack([a] * 3, -1) * 255).astype(np.uint8)
        else:
            arr = np.asarray(np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        if q.get("markers"):
            arr = self._draw_markers(arr.copy(), c2w_np, fx, fy)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def serve(self, blocking: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path.startswith("/info"):
                    body = json.dumps({
                        "num_views": len(viewer.cameras)
                        if viewer.cameras is not None else 0,
                        "num_gaussians": int(viewer.scene.num_gaussians),
                    }).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                    return
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

"""Interactive HTTP viewer.

Equivalent (in capability, not protocol) of the reference's viser/websocket
viewer (thermo_nerf/scripts/thermal_viewer.py:10-26 + nerfstudio RunViewer):
serve an orbit-controllable view of a trained checkpoint over plain HTTP —
the browser posts a camera pose to ``/render`` and receives a JPEG; the
bundled page provides drag-orbit/zoom and a modality selector (rgb, thermal,
depth, accumulation). Rendering is chunked through the same jitted path as
offline eval (viewer chunk 2^15, config_thermal_nerf.py:46).

TRAIN-TIME ATTACH (round-5): the inherited nerfstudio trainer also streams
renders DURING training (ViewerConfig,
thermo_nerf/thermal_nerf/config_thermal_nerf.py:46). Pass ``params_fn``
returning the live trainer's latest parameter snapshot
(``Trainer.viewer_params``, refreshed at log boundaries as a buffer COPY so
the donated train-step buffers are never read concurrently) and call
``start_background()``; ``thermo-tpu-train --viewer`` wires this up.
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
from PIL import Image

from thermo_tpu.data.cameras import Cameras
from thermo_tpu.engine.pipeline import Pipeline
from thermo_tpu.engine.trainer import make_render_fn
from thermo_tpu.utils.colormaps import apply_depth_colormap, apply_float_colormap, to_uint8

_PAGE = """<!DOCTYPE html>
<html><head><title>thermo-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#bar { padding:6px; } img { display:block; margin:auto; image-rendering:pixelated; }
select,button { background:#222; color:#ddd; border:1px solid #555; }
</style></head><body>
<div id="bar">
 modality <select id="mod"><option>rgb</option><option>thermal</option>
 <option>depth</option><option>accumulation</option></select>
 | drag = orbit, wheel = zoom | <span id="stat"></span>
</div>
<img id="view" width="640"/>
<script>
let theta = 0.8, phi = 1.2, radius = 2.0, busy = false, dirty = true;
const img = document.getElementById('view');
const stat = document.getElementById('stat');
async function render() {
  if (busy || !dirty) return; busy = true; dirty = false;
  const t0 = performance.now();
  const body = JSON.stringify({theta, phi, radius,
                               modality: document.getElementById('mod').value});
  const r = await fetch('/render', {method:'POST', body});
  const blob = await r.blob();
  img.src = URL.createObjectURL(blob);
  stat.textContent = (performance.now()-t0).toFixed(0) + ' ms';
  busy = false;
}
setInterval(render, 50);
let drag = null;
img.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  theta += (e.clientX - drag[0]) * 0.01;
  phi = Math.min(2.8, Math.max(0.3, phi + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY]; dirty = true;
};
img.onwheel = e => { radius = Math.max(0.3, radius * (1 + e.deltaY * 1e-3)); dirty = true; e.preventDefault(); };
document.getElementById('mod').onchange = () => dirty = true;
</script></body></html>"""


def _orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    eye = radius * np.array(
        [math.sin(phi) * math.cos(theta), math.sin(phi) * math.sin(theta), math.cos(phi)]
    )
    forward = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up)
    nr = np.linalg.norm(right)
    if nr < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / nr
    true_up = np.cross(right, forward)
    c2w = np.eye(4)[:3]
    c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, true_up, -forward, eye
    return c2w.astype(np.float32)


class ViewerServer:
    def __init__(
        self,
        pipeline: Pipeline,
        height: int = 480,
        width: int = 640,
        port: int = 7007,
        chunk_size: int = 1 << 15,
        params_fn=None,
    ):
        """``params_fn``: optional zero-arg callable returning the params to
        render with on EVERY request — the train-time attach hook (a live
        Trainer's ``viewer_params`` snapshot). None = the pipeline's static
        (checkpoint-restored) params."""
        self.pipeline = pipeline
        self.height, self.width, self.port = height, width, port
        self._render = make_render_fn(pipeline.model, chunk_size=chunk_size)
        self._params_fn = params_fn
        self._lock = threading.Lock()

    def render_pose(self, theta: float, phi: float, radius: float, modality: str) -> bytes:
        c2w = _orbit_pose(theta, phi, radius)
        focal = 0.7 * self.width
        cameras = Cameras.from_numpy(
            fx=[focal], fy=[focal], cx=[self.width / 2], cy=[self.height / 2],
            width=[self.width], height=[self.height], c2w=c2w[None],
        )
        params = (
            self._params_fn() if self._params_fn is not None else self.pipeline.params
        )
        with self._lock:
            out = self._render(params, cameras, 0, self.height, self.width)
        if modality == "thermal" and "thermal" in out:
            img = apply_float_colormap(out["thermal"], "magma")
        elif modality == "depth":
            img = apply_depth_colormap(out["depth"], accumulation=out["accumulation"])
        elif modality == "accumulation":
            img = apply_float_colormap(out["accumulation"], "turbo")
        else:
            img = out["rgb"][..., :3]
        buf = io.BytesIO()
        Image.fromarray(to_uint8(img)).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    def _make_server(self) -> ThreadingHTTPServer:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())

            def do_POST(self):
                if self.path != "/render":
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                jpeg = viewer.render_pose(
                    float(req.get("theta", 0.0)),
                    float(req.get("phi", 1.2)),
                    float(req.get("radius", 2.0)),
                    str(req.get("modality", "rgb")),
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(jpeg)))
                self.end_headers()
                self.wfile.write(jpeg)

        return ThreadingHTTPServer(("0.0.0.0", self.port), Handler)

    def serve_forever(self) -> None:
        server = self._make_server()
        print(f"viewer listening on http://localhost:{self.port}")
        server.serve_forever()

    def start_background(self) -> ThreadingHTTPServer:
        """Train-time attach: serve on a daemon thread and return the server
        (call ``.shutdown()`` to stop). ``port=0`` binds a free port; the
        bound port is written back to ``self.port``."""
        server = self._make_server()
        self.port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server

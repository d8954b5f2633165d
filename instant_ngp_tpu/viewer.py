"""Minimal interactive web viewer — the headless stand-in for the
reference's GUI (testbed.cu:774-2108 ImGui/GL interface; SURVEY.md §2.8
plans "a lightweight web viewer" for the TPU port).

Serves a single-page orbit viewer over `Testbed.render`:

    python -m instant_ngp_tpu.viewer --scene /path/to/scene \
        [--snapshot snap.ingp] [--port 8000] [--train]

Mouse drag orbits, wheel zooms; the page requests JPEG frames from
/render. With --train, a background thread keeps training between
frames (the reference's train+render interleave in Testbed::frame).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>instant-ngp-tpu viewer</title><style>
 body { margin:0; background:#111; color:#ccc; font-family:monospace; }
 #hud { position:fixed; top:8px; left:8px; background:#000a; padding:6px 10px; }
 img { display:block; width:100vw; height:100vh; object-fit:contain;
       image-rendering:auto; cursor:grab; }
</style></head><body>
<div id="hud">instant-ngp-tpu — drag to orbit, wheel to zoom<br>
<span id="stats"></span></div>
<img id="view" draggable="false">
<script>
let theta = 0.0, phi = 0.3, radius = 2.0, busy = false, dirty = true;
const img = document.getElementById('view');
const stats = document.getElementById('stats');
let res = 384;
async function refresh() {
  if (busy || !dirty) { setTimeout(refresh, 30); return; }
  busy = true; dirty = false;
  const t0 = performance.now();
  const r = await fetch(`/render?theta=${theta}&phi=${phi}&r=${radius}&w=${res}&h=${res}`);
  const blob = await r.blob();
  img.src = URL.createObjectURL(blob);
  const dt = performance.now() - t0;
  const info = JSON.parse(r.headers.get('X-Info') || '{}');
  stats.textContent = `${dt.toFixed(0)} ms/frame  step=${info.step ?? '-'} loss=${info.loss ?? '-'}`;
  busy = false;
  setTimeout(refresh, 10);
}
let drag = null;
img.addEventListener('pointerdown', e => { drag = [e.clientX, e.clientY]; });
window.addEventListener('pointermove', e => {
  if (!drag) return;
  theta += (e.clientX - drag[0]) * 0.01;
  phi = Math.max(-1.5, Math.min(1.5, phi + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY]; dirty = true;
});
window.addEventListener('pointerup', () => { drag = null; });
window.addEventListener('wheel', e => {
  radius = Math.max(0.3, Math.min(10, radius * Math.exp(e.deltaY * 0.001)));
  dirty = true;
});
setInterval(() => { dirty = true; }, 2000);  // pick up training progress
refresh();
</script></body></html>"""


def orbit_matrix(theta: float, phi: float, radius: float,
                 center=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Camera-to-world 3×4 looking at `center` from spherical coords."""
    c = np.asarray(center, np.float32)
    eye = c + radius * np.array(
        [np.cos(phi) * np.sin(theta), np.sin(phi), -np.cos(phi) * np.cos(theta)],
        np.float32,
    )
    fwd = c - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, up)
    nr = np.linalg.norm(right)
    if nr < 1e-6:
        right = np.array([1.0, 0.0, 0.0], np.float32)
    else:
        right /= nr
    up = np.cross(right, fwd)
    m = np.stack([right, -up, fwd, eye], axis=1).astype(np.float32)
    return m


class ViewerServer:
    def __init__(self, testbed, port: int = 8000, train: bool = False,
                 predict_camera: bool = False):
        self.testbed = testbed
        self.port = port
        self.train = train
        self._lock = threading.Lock()
        self._stop = False
        self.camera_predictor = None
        if predict_camera:
            from .render.camera_predictor import MatLogCameraPredictor

            self.camera_predictor = MatLogCameraPredictor(
                is_quadratic=False, is_se3=True, half_life_s=0.25)

    def _train_loop(self):
        while not self._stop:
            with self._lock:
                self.testbed.frame()
            time.sleep(0.001)

    def render_jpeg(self, theta, phi, radius, w, h) -> bytes:
        from PIL import Image

        cam = orbit_matrix(theta, phi, radius)
        # latency compensation: feed observed poses to the camera
        # predictor and render where the camera WILL be when the async
        # render lands (reference MatLogCameraPredictor, used for VR
        # head poses; here for the streamed orbit camera)
        if getattr(self, "camera_predictor", None) is not None:
            now = time.perf_counter()
            last = getattr(self, "_last_pose_t", None)
            self.camera_predictor.sample_camera(
                cam, (now - last) if last else 1 / 30)
            self._last_pose_t = now
            lat = self.testbed.render_ms.val() / 1000.0
            cam = np.asarray(
                self.camera_predictor.predict_camera(lat), np.float32)
        with self._lock:
            frame = self.testbed.render(w, h, camera_matrix=cam)
        rgb = np.clip(np.asarray(frame)[..., :3], 0, 1)
        buf = io.BytesIO()
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=90
        )
        return buf.getvalue()

    def serve_forever(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if u.path == "/render":
                    q = parse_qs(u.query)
                    get = lambda k, d: float(q.get(k, [d])[0])
                    body = viewer.render_jpeg(
                        get("theta", 0), get("phi", 0.3), get("r", 2.0),
                        int(get("w", 384)), int(get("h", 384)),
                    )
                    info = json.dumps({
                        "step": viewer.testbed.training_step,
                        "loss": round(float(viewer.testbed.loss or 0.0), 5),
                    })
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("X-Info", info)
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.end_headers()

        if self.train:
            threading.Thread(target=self._train_loop, daemon=True).start()
        server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"viewer listening on http://localhost:{self.port}", flush=True)
        try:
            server.serve_forever()
        finally:
            self._stop = True


def main():
    p = argparse.ArgumentParser(description="instant-ngp-tpu web viewer")
    p.add_argument("--scene", default="", help="scene to load")
    p.add_argument("--snapshot", default="", help=".ingp snapshot to load")
    p.add_argument("--network", default="", help="network config json")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--train", action="store_true",
                   help="keep training while viewing")
    args = p.parse_args()

    from .testbed import Testbed

    tb = Testbed()
    if args.network:
        tb.reload_network_from_file(args.network)
    if args.scene:
        tb.load_training_data(args.scene)
    if args.snapshot:
        tb.load_snapshot(args.snapshot)
    if not args.scene and not args.snapshot:
        raise SystemExit("need --scene or --snapshot")
    ViewerServer(tb, port=args.port, train=args.train).serve_forever()


if __name__ == "__main__":
    main()

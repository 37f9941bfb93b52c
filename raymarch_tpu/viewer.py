"""Interactive viewer: the app-shell layer (reference L4, src/main.rs:9-83).

The reference is an eframe desktop app: an egui node-graph editor on the
left, the rendered viewport on the right, and mouse input routed to an orbit
camera (src/main.rs:44-82). This module is the TPU-native equivalent as a
tiny dependency-free HTTP app: the browser page is the window, the server
owns ALL state (graph, camera rig, compiled tape), and every frame follows
the reference's exact per-frame pipeline — edit graph -> evaluate_root ->
re-encode tape (pure buffer swap, no recompile) -> render -> present.

Input mapping mirrors src/main.rs:58-69: primary-button drag => Orbit,
secondary-button drag => Pan, scroll => Dolly — the reference's
CameraEvent enum (src/camera.rs:15-19) — applied to the same
OrbitCameraController rig (utils/camera.py).

`ViewerApp` is the headless core (tested directly in tests/test_viewer.py);
`serve()` wraps it in a ThreadingHTTPServer. Run:

    python -m raymarch_tpu.viewer [--port 8000] [--size 512x288] [--cpu]
"""

from __future__ import annotations

import json
import threading
from typing import Any, Dict, Optional

import numpy as np

from .config import DEFAULT_CONFIG, RenderConfig
from .models.graph import CSGNodeGraph
from .ops.tape import compile_scene
from .utils.camera import OrbitCameraController
from .utils.image import png_bytes


def default_graph() -> CSGNodeGraph:
    """The demo scene: (sphere | box) - torus, mirroring BASELINE config 2."""
    g = CSGNodeGraph()
    root = g.add_root()
    s = g.add_node("Sphere", center=(-0.6, 0.0, 0.0), radius=0.9)
    b = g.add_node("Box", center=(0.8, 0.0, 0.0), half_extents=(0.5, 0.5, 0.5))
    t = g.add_node(
        "Torus", center=(0.0, 0.8, 0.0), major_radius=0.7, minor_radius=0.25
    )
    u = g.add_node("Union")
    d = g.add_node("Subtraction")
    g.connect(s, u, "A")
    g.connect(b, u, "B")
    g.connect(u, d, "A")
    g.connect(t, d, "B")
    g.connect(d, root, "SDF")
    return g


class ViewerApp:
    """Headless app state + per-frame pipeline (reference main.rs:44-82).

    Renderers are cached per TapeSpec: geometry-parameter edits re-use the
    compiled program (the reference's "no shader recompile" property,
    README.md:7); structural edits (adding/removing nodes) compile a new one
    on first use, exactly like the reference's fixed-size tape buffer being
    rewritten per frame (renderer.rs:230-239).
    """

    def __init__(
        self,
        graph: Optional[CSGNodeGraph] = None,
        width: int = 512,
        height: int = 288,
        cfg: Optional[RenderConfig] = None,
        backend: Optional[str] = None,
        static: bool = False,
    ):
        import jax

        self._jax = jax
        self.width = width
        self.height = height
        self.cfg = cfg or DEFAULT_CONFIG
        if backend is None:
            on_tpu = any(d.platform != "cpu" for d in jax.devices())
            backend = "pallas_prepass" if on_tpu else "jnp"
        self.backend = backend
        self.static = static or backend in ("pallas_prepass", "pallas_full")
        self.graph = graph if graph is not None else default_graph()
        self.camera = OrbitCameraController(target=(0.0, 0.0, 0.0), radius=4.5)
        self.camera.orbit(0.0, 35.0)  # start slightly above the horizon
        self._renderers: Dict[Any, Any] = {}
        self._lock = threading.Lock()
        self.frames_rendered = 0
        self.compiles = 0

    # -- input events (reference src/main.rs:58-69) ----------------------
    def handle_event(self, ev: Dict[str, Any]) -> None:
        kind = ev.get("type")
        with self._lock:
            if kind == "orbit":
                self.camera.orbit(float(ev.get("dx", 0)), float(ev.get("dy", 0)))
            elif kind == "pan":
                self.camera.pan(float(ev.get("dx", 0)), float(ev.get("dy", 0)))
            elif kind == "dolly":
                self.camera.dolly(float(ev.get("delta", 0)))
            else:
                raise ValueError(f"unknown event type: {kind!r}")

    # -- graph API --------------------------------------------------------
    def graph_dict(self) -> Dict[str, Any]:
        with self._lock:
            return self.graph.to_dict()

    def set_graph(self, data: Dict[str, Any]) -> None:
        g = CSGNodeGraph.from_dict(data)  # validate before swapping in
        with self._lock:
            self.graph = g

    # -- per-frame pipeline ------------------------------------------------
    def _renderer_for(self, spec):
        rnd = self._renderers.get(spec)
        if rnd is None:
            from .ops.march import make_renderer

            chunk = None if self.backend.startswith("pallas") else 1 << 16
            rnd = self._jax.jit(
                make_renderer(
                    spec,
                    self.width,
                    self.height,
                    self.cfg,
                    mode="forward",
                    backend=self.backend,
                    chunk=chunk,
                )
            )
            self._renderers[spec] = rnd
            self.compiles += 1
        return rnd

    def frame(self) -> np.ndarray:
        """edit-aware render: evaluate_root -> tape swap -> render."""
        with self._lock:
            scene = self.graph.evaluate_root()  # None => background only
            spec, arrays = compile_scene(scene, static=self.static)
            img = self._renderer_for(spec)(arrays, self.camera.camera())
            out = np.asarray(img)
            self.frames_rendered += 1
            return out

    def frame_png(self) -> bytes:
        return png_bytes(self.frame())

    def state(self) -> Dict[str, Any]:
        c = self.camera
        return {
            "pitch": c.pitch,
            "yaw": c.yaw,
            "radius": c.radius,
            "target": list(map(float, c.target)),
            "backend": self.backend,
            "size": [self.width, self.height],
            "frames": self.frames_rendered,
            "compiles": self.compiles,
        }


_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>raymarch_tpu viewer</title>
<style>
 body { margin:0; background:#15161a; color:#cfd2d8; font:13px monospace;
        display:flex; height:100vh; }
 #left { width:380px; padding:10px; display:flex; flex-direction:column; }
 #right { flex:1; display:flex; align-items:center; justify-content:center; }
 #view { image-rendering:auto; max-width:100%; max-height:100%;
         cursor:grab; user-select:none; -webkit-user-drag:none; }
 textarea { flex:1; background:#1d1f24; color:#cfd2d8; border:1px solid #333;
            font:11px monospace; white-space:pre; }
 button { margin-top:6px; background:#2a2d34; color:#cfd2d8; border:1px solid
          #444; padding:6px; cursor:pointer; }
 #status { margin-top:6px; min-height:2.5em; color:#8a8f98; }
 h3 { margin:2px 0 8px; font-size:13px; }
</style></head><body>
<div id="left">
 <h3>raymarch_tpu &mdash; CSG node graph</h3>
 <textarea id="graph" spellcheck="false"></textarea>
 <button id="apply">Apply graph</button>
 <div id="status">drag: orbit &middot; right-drag: pan &middot; wheel: dolly</div>
</div>
<div id="right"><img id="view" draggable="false"></div>
<script>
const view = document.getElementById('view');
const status_ = document.getElementById('status');
const ta = document.getElementById('graph');
let inflight = false;
async function tick() {
  if (!inflight) {
    inflight = true;
    try {
      const r = await fetch('/frame.png?t=' + performance.now());
      const b = await r.blob();
      const url = URL.createObjectURL(b);
      view.onload = () => URL.revokeObjectURL(url);
      view.src = url;
    } catch (e) { status_.textContent = 'frame error: ' + e; }
    inflight = false;
  }
  requestAnimationFrame(tick);
}
function send(ev) { fetch('/event', {method:'POST', body:JSON.stringify(ev)}); }
let drag = null;
view.addEventListener('mousedown', e => { drag = e.button; e.preventDefault(); });
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (drag === null) return;
  // Reference input routing (src/main.rs:58-69): primary drag -> Orbit,
  // secondary -> Pan; deltas are raw pixels, speeds live server-side.
  if (drag === 0) send({type:'orbit', dx:e.movementX, dy:e.movementY});
  else send({type:'pan', dx:e.movementX, dy:e.movementY});
});
view.addEventListener('contextmenu', e => e.preventDefault());
view.addEventListener('wheel', e => {
  e.preventDefault();
  send({type:'dolly', delta:e.deltaY});
}, {passive:false});
async function loadGraph() {
  const g = await (await fetch('/graph')).json();
  ta.value = JSON.stringify(g, null, 1);
}
document.getElementById('apply').onclick = async () => {
  try {
    const r = await fetch('/graph', {method:'POST', body:ta.value});
    status_.textContent = r.ok ? 'graph applied' : 'rejected: ' + await r.text();
  } catch (e) { status_.textContent = 'apply error: ' + e; }
};
loadGraph(); tick();
</script></body></html>
"""


def serve(app: ViewerApp, port: int = 8000, host: str = "127.0.0.1"):
    """Serve the viewer; blocks. Returns the server if you start it yourself:
    `srv = serve(app, start=False)`-style embedding is just
    `_make_server(app, port)` + `serve_forever()` in a thread."""
    srv = make_server(app, port, host)
    print(
        f"raymarch_tpu viewer on http://{host}:{srv.server_address[1]} "
        f"({app.width}x{app.height}, backend={app.backend})"
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


def make_server(app: ViewerApp, port: int = 0, host: str = "127.0.0.1"):
    """Build (don't start) the HTTP server wrapping `app`."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep the console clean
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?", 1)[0]
            try:
                if path == "/":
                    self._send(200, _HTML.encode(), "text/html; charset=utf-8")
                elif path == "/frame.png":
                    self._send(200, app.frame_png(), "image/png")
                elif path == "/graph":
                    body = json.dumps(app.graph_dict()).encode()
                    self._send(200, body, "application/json")
                elif path == "/state":
                    self._send(200, json.dumps(app.state()).encode(),
                               "application/json")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # surface errors to the page, don't die
                self._send(500, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                data = json.loads(raw or b"{}")
                if self.path == "/event":
                    app.handle_event(data)
                    self._send(200, b"ok", "text/plain")
                elif self.path == "/graph":
                    app.set_graph(data)
                    self._send(200, b"ok", "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # bad graphs/events are client errors
                self._send(400, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--size", default=None, help="WxH, e.g. 512x288")
    p.add_argument("--backend", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--aa", type=int, default=None, help="AA grid (n -> n^2 rays/px)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if args.size:
        w, h = (int(v) for v in args.size.lower().split("x"))
    else:
        w, h = (960, 540) if on_tpu else (256, 144)
    cfg = DEFAULT_CONFIG
    if args.aa is None and not on_tpu:
        cfg = RenderConfig(aa_samples=2)  # keep CPU interactive
    elif args.aa is not None:
        cfg = RenderConfig(aa_samples=args.aa)
    app = ViewerApp(width=w, height=h, cfg=cfg, backend=args.backend)
    serve(app, port=args.port)


if __name__ == "__main__":
    main()

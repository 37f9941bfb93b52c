"""Tiered scene execution: instant edits, background static compiles.

The reference's headline property is that ANY scene edit is a buffer write —
never a shader recompile (reference README.md:7; renderer.rs:230-239 rewrites
the tape buffer per frame). This framework reproduces that with the
dynamic-tape interpreter, but its data-driven dispatch (macro-op form,
ops.tape.macroize_streams) still runs ~1.4x slower per frame than the
static-tape compile of the same scene, and a static
compile of a NEW topology takes seconds on a real chip — far too long to
block an interactive frame on.

`TieredRenderer` resolves the tension the way browser JavaScript engines do
(baseline interpreter + optimizing JIT): every frame is served by the best
tier available *right now*:

- **Dynamic tier** (always available): the zero-recompile interpreter. A
  topology edit changes only tape buffers; the next frame renders
  immediately.
- **Static tier** (per topology): the unrolled static-tape program. The
  first frame after a topology edit kicks off its compilation in a
  BACKGROUND thread; once compiled and warmed it serves all subsequent
  frames of that topology. Parameter/material/camera edits never leave the
  static tier (they are pure buffer swaps in both tiers).

Compiled static tiers are cached per `TapeSpec`, so revisiting a topology
(undo/redo, toggling a node) is instant. The result is reference-parity
editing latency with static-tape steady-state throughput.
"""

from __future__ import annotations

import atexit
import threading
from typing import Any, Callable, Dict, Optional

import numpy as np

from .config import DEFAULT_CONFIG, RenderConfig
from .ops.tape import compile_scene

# Live compile threads across all TieredRenderer instances. Joined at
# interpreter exit: a daemon thread killed mid-PJRT-compile segfaults the
# runtime on shutdown.
_LIVE_THREADS: list = []
_LIVE_LOCK = threading.Lock()


def _drain_threads_at_exit():  # pragma: no cover - exit path
    with _LIVE_LOCK:
        threads = list(_LIVE_THREADS)
    for t in threads:
        t.join(timeout=600.0)


atexit.register(_drain_threads_at_exit)


class TieredRenderer:
    """Render scenes through the best available execution tier.

    Parameters
    ----------
    width, height : image size.
    cfg : RenderConfig shared by both tiers.
    backend : `ops.march.make_renderer` backend for both tiers (default
        picks the fused cone-prepass kernels on an accelerator, the jnp
        path on CPU — same heuristic as the viewer).
    background : compile static tiers in a daemon thread (default). False
        compiles them synchronously inside `render` — the deterministic
        mode used by tests.
    renderer_factory : optional override `(spec) -> fn(arrays, camera)`
        replacing make_renderer entirely (tests inject interpret-mode or
        oracle-backed factories).

    Thread model: `render` may be called from one thread at a time (the
    viewer's frame lock). Background compiles touch only per-spec slots
    guarded by `_lock` and publish completed tiers atomically.
    """

    def __init__(
        self,
        width: int,
        height: int,
        cfg: RenderConfig = DEFAULT_CONFIG,
        backend: Optional[str] = None,
        chunk: Optional[int] = None,
        background: bool = True,
        interpret: bool = False,
        renderer_factory: Optional[Callable[[Any], Any]] = None,
        persistent_cache: bool = True,
    ):
        import jax

        self._jax = jax
        if persistent_cache:
            # Static-tier compiles cost seconds per topology on a chip;
            # the persistent cache makes revisited topologies skip XLA
            # across process restarts too (respects an already-configured
            # cache dir — see utils.cache).
            from .utils.cache import enable_persistent_cache

            enable_persistent_cache()
        self.width = width
        self.height = height
        self.cfg = cfg
        if backend is None:
            on_accel = any(d.platform != "cpu" for d in jax.devices())
            backend = "pallas_prepass" if on_accel else "jnp"
        self.backend = backend
        self.chunk = chunk
        self.background = background
        self.interpret = interpret
        self._factory = renderer_factory
        self._lock = threading.Lock()
        # XLA compilation takes a process-wide lock: a background compile
        # blocks any foreground compile for its full duration. One gate
        # serializes static-tier compiles so rapid topology edits can't
        # thrash N concurrent compiles through it (and `render` always
        # builds the dynamic tier BEFORE kicking a static compile for the
        # same reason — see render()).
        self._compile_gate = threading.Lock()
        # spec -> jitted render fn. Dynamic tiers compile fast (one
        # interpreter body) and are built on demand; static tiers appear
        # here only once compiled AND warmed.
        self._dynamic: Dict[Any, Any] = {}
        self._static: Dict[Any, Any] = {}
        self._pending: Dict[Any, threading.Thread] = {}
        # Telemetry.
        self.frames = 0
        self.dynamic_frames = 0
        self.static_compiles = 0
        self.last_tier = "none"

    # -- tier construction ---------------------------------------------------

    def _build(self, spec):
        if self._factory is not None:
            return self._factory(spec)
        from .ops.march import make_renderer

        return self._jax.jit(
            make_renderer(
                spec,
                self.width,
                self.height,
                self.cfg,
                mode="forward",
                backend=self.backend,
                chunk=self.chunk,
                interpret=self.interpret,
            )
        )

    def _dynamic_for(self, spec):
        rnd = self._dynamic.get(spec)
        if rnd is None:
            rnd = self._build(spec)
            self._dynamic[spec] = rnd
        return rnd

    def _compile_static(self, spec, arrays, camera):
        """Build + warm the static tier for `spec`, then publish it.

        The warm-up render forces actual XLA compilation (jit is lazy) and
        device warm paths, so the first static frame served to a user is
        full speed. Runs on the calling thread (synchronous mode) or a
        daemon thread.
        """
        try:
            with self._compile_gate:
                rnd = self._build(spec)
                np.asarray(rnd(arrays, camera))  # forces compile + execute
        except Exception:  # pragma: no cover - surfaced via telemetry
            with self._lock:
                self._pending.pop(spec, None)
            raise
        with self._lock:
            self._static[spec] = rnd
            self._pending.pop(spec, None)
            self.static_compiles += 1

    def _kick_static(self, spec, arrays, camera):
        with self._lock:
            if spec in self._static or spec in self._pending:
                return
            if not self.background:
                self._pending[spec] = None  # claimed; released in _compile
            else:
                t = threading.Thread(
                    target=self._compile_static,
                    args=(spec, arrays, camera),
                    daemon=True,
                    name="raymarch-static-tier",
                )
                self._pending[spec] = t
                with _LIVE_LOCK:
                    _LIVE_THREADS[:] = [
                        lt for lt in _LIVE_THREADS if lt.is_alive()
                    ]
                    _LIVE_THREADS.append(t)
                t.start()
                return
        self._compile_static(spec, arrays, camera)

    # -- public API ------------------------------------------------------------

    def render(self, scene, camera) -> np.ndarray:
        """Render `scene` (CSG node or None) from `camera` (Camera pytree)
        via the best available tier; kicks off a static compile for new
        topologies as a side effect."""
        spec_s, arrays_s = compile_scene(scene, static=True)
        with self._lock:
            static_rnd = self._static.get(spec_s)
        self.frames += 1
        if static_rnd is not None:
            self.last_tier = "static"
            return np.asarray(static_rnd(arrays_s, camera))
        if not self.background:
            self._kick_static(spec_s, arrays_s, camera)  # compiles inline
            with self._lock:
                static_rnd = self._static.get(spec_s)
            self.last_tier = "static"
            return np.asarray(static_rnd(arrays_s, camera))
        # Serve THIS frame from the dynamic tier before kicking the static
        # compile: the background compile takes the process-wide XLA compile
        # lock, and kicking it first would stall a cold dynamic tier behind
        # a multi-second static compile.
        spec_d, arrays_d = compile_scene(scene)
        img = np.asarray(self._dynamic_for(spec_d)(arrays_d, camera))
        self.last_tier = "dynamic"
        self.dynamic_frames += 1
        self._kick_static(spec_s, arrays_s, camera)
        return img

    @property
    def tier(self) -> str:
        """Tier that served the most recent frame."""
        return self.last_tier

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Block until every in-flight static compile finishes. Returns
        False if `timeout` elapsed with compiles still pending."""
        while True:
            with self._lock:
                threads = [t for t in self._pending.values() if t is not None]
            if not threads:
                return True
            for t in threads:
                t.join(timeout)
                if timeout is not None and t.is_alive():
                    return False

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            pending = len(self._pending)
            cached = len(self._static)
        return {
            "frames": self.frames,
            "dynamic_frames": self.dynamic_frames,
            "static_compiles": self.static_compiles,
            "static_cached": cached,
            "pending_compiles": pending,
            "last_tier": self.last_tier,
        }

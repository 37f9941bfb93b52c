"""Tiered execution tests (runtime.TieredRenderer).

The tiered renderer must reproduce the reference's editing latency (any
edit renders the NEXT frame, reference README.md:7) while converging to the
static-tape program's throughput: frames after a topology edit are served
by the dynamic-tape interpreter until the static compile — run off-thread —
completes, then switch over. Images from both tiers must agree.
"""

import dataclasses
import threading
import time

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.runtime import TieredRenderer

CFG = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=60)
W, H = 48, 32

SCENE_A = rm.sphere(center=(0, 0, 0), radius=1.0)
SCENE_B = rm.sphere(center=(0, 0, 0), radius=1.0) | rm.box(
    center=(1.2, 0, 0), half_extents=(0.4, 0.4, 0.4)
)
CAM = rm.Camera.looking_at(position=(0.0, 1.2, 4.0), target=(0.0, 0.0, 0.0))


class TestSynchronous:
    """background=False: static tiers compile inline — deterministic."""

    @pytest.fixture()
    def tiered(self):
        return TieredRenderer(W, H, CFG, backend="jnp", background=False)

    def test_first_frame_compiles_static_and_serves_it(self, tiered):
        img = tiered.render(SCENE_A, CAM)
        assert img.shape == (H, W, 3)
        assert tiered.tier == "static"
        assert tiered.static_compiles == 1

    def test_param_edit_stays_static_no_recompile(self, tiered):
        tiered.render(SCENE_A, CAM)
        img2 = tiered.render(rm.sphere(center=(0, 0, 0), radius=1.3), CAM)
        assert tiered.tier == "static"
        assert tiered.static_compiles == 1  # same TapeSpec: buffer swap only
        img1 = tiered.render(SCENE_A, CAM)
        assert np.abs(img1 - img2).max() > 1e-3  # the edit was visible

    def test_topology_edit_compiles_new_tier_and_caches(self, tiered):
        tiered.render(SCENE_A, CAM)
        tiered.render(SCENE_B, CAM)
        assert tiered.static_compiles == 2
        # Revisiting topology A is instant (cached tier, no new compile).
        tiered.render(SCENE_A, CAM)
        assert tiered.static_compiles == 2
        assert tiered.tier == "static"

    def test_empty_scene(self, tiered):
        img = tiered.render(None, CAM)
        assert np.isfinite(img).all()


class TestBackground:
    def _gated_factory(self, gate: threading.Event, calls: list):
        """Renderer factory that blocks STATIC-tier builds on `gate` —
        simulates a slow XLA compile so the dynamic tier must serve."""
        from raymarch_tpu.ops.march import make_renderer
        import jax

        def factory(spec):
            if spec.static_tape is not None:
                gate.wait(timeout=30.0)
                calls.append(spec)
            return jax.jit(
                make_renderer(spec, W, H, CFG, mode="forward", backend="jnp")
            )

        return factory

    def test_dynamic_serves_until_static_ready_then_switches(self):
        gate = threading.Event()
        calls = []
        tiered = TieredRenderer(
            W, H, CFG, background=True,
            renderer_factory=self._gated_factory(gate, calls),
        )
        img_dyn = tiered.render(SCENE_B, CAM)
        assert tiered.tier == "dynamic"  # static compile still gated
        assert tiered.dynamic_frames == 1
        # More frames while the compile is "running" stay dynamic and do
        # not spawn duplicate compiles.
        tiered.render(SCENE_B, CAM)
        assert tiered.tier == "dynamic"
        gate.set()
        assert tiered.wait(timeout=60.0)
        img_sta = tiered.render(SCENE_B, CAM)
        assert tiered.tier == "static"
        assert len(calls) == 1
        # Tier switch must be visually seamless: same scene, same camera.
        assert np.abs(img_dyn - img_sta).max() < 1e-4

    def test_stats_shape(self):
        gate = threading.Event()
        gate.set()
        tiered = TieredRenderer(
            W, H, CFG, background=True,
            renderer_factory=self._gated_factory(gate, []),
        )
        tiered.render(SCENE_A, CAM)
        tiered.wait(timeout=60.0)
        s = tiered.stats()
        assert s["frames"] == 1
        assert s["pending_compiles"] == 0
        assert s["static_cached"] == 1


class TestViewerIntegration:
    def test_viewer_tiered_mode(self):
        from raymarch_tpu.viewer import ViewerApp

        app = ViewerApp(width=W, height=H, cfg=CFG, backend="jnp", tiered=True)
        img0 = app.frame()
        assert img0.shape == (H, W, 3)
        assert app.state()["tier"] in ("dynamic", "static")
        # Converge to the static tier and re-render.
        assert app._tiered.wait(timeout=120.0)
        img1 = app.frame()
        assert app.state()["tier"] == "static"
        assert np.abs(img0 - img1).max() < 1e-4

    def test_viewer_default_single_tier_on_jnp(self):
        from raymarch_tpu.viewer import ViewerApp

        app = ViewerApp(width=W, height=H, cfg=CFG, backend="jnp")
        app.frame()
        assert app.state()["tier"] == "single"


class TestPersistentCache:
    def test_respects_already_configured_dir(self):
        # conftest configures the test cache dir; the production default
        # must NOT override a user/test configuration.
        import jax

        from raymarch_tpu.utils.cache import enable_persistent_cache

        before = jax.config.jax_compilation_cache_dir
        assert before  # set by tests/conftest.py
        assert enable_persistent_cache() == before
        assert jax.config.jax_compilation_cache_dir == before

    def test_explicit_dir_wins_and_restores(self, tmp_path):
        import jax

        from raymarch_tpu.utils.cache import enable_persistent_cache

        before = jax.config.jax_compilation_cache_dir
        try:
            d = str(tmp_path / "xla_cache")
            assert enable_persistent_cache(d) == d
            assert jax.config.jax_compilation_cache_dir == d
            import os

            assert os.path.isdir(d)
        finally:
            jax.config.update("jax_compilation_cache_dir", before)

    def test_tiered_renderer_enables_cache_by_default(self):
        # TieredRenderer(persistent_cache=True) must leave the configured
        # dir intact (and not raise); with the conftest cache set this is
        # the no-override path, the common production case after restart.
        import jax

        from raymarch_tpu.runtime import TieredRenderer

        before = jax.config.jax_compilation_cache_dir
        TieredRenderer(W, H, CFG, backend="jnp", background=False)
        assert jax.config.jax_compilation_cache_dir == before

"""Serialization (io) and march-stats tests."""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu import io as rio
from raymarch_tpu.utils.stats import march_stats


class TestSceneIO:
    def test_wire_roundtrip(self, tmp_path):
        scene = (rm.sphere() | rm.box()) - rm.torus()
        tape = rm.encode_wire(scene)
        p = str(tmp_path / "scene.npz")
        rio.save_scene(p, tape, camera={"pos": [0, 1, 4]}, note="config-2")
        tape2, meta = rio.load_scene(p)
        np.testing.assert_array_equal(tape, tape2)
        assert meta["note"] == "config-2"
        assert meta["camera"]["pos"] == [0, 1, 4]

    def test_params_roundtrip(self, tmp_path):
        scene = rm.sphere().union(rm.box(), k=0.3)
        spec, arrays = rm.compile_scene(scene)
        arrays2 = dataclasses.replace(
            arrays, leaf_params=arrays.leaf_params + 0.25
        )
        p = str(tmp_path / "params.npz")
        rio.save_params(p, spec, arrays2)
        restored = rio.load_params(p, spec)
        np.testing.assert_array_equal(restored.leaf_params, arrays2.leaf_params)
        np.testing.assert_array_equal(restored.tape_ops, arrays2.tape_ops)

    def test_params_spec_mismatch_raises(self, tmp_path):
        spec1, arrays1 = rm.compile_scene(rm.sphere())
        spec2, _ = rm.compile_scene(rm.sphere() | rm.box())
        p = str(tmp_path / "params.npz")
        rio.save_params(p, spec1, arrays1)
        with pytest.raises(ValueError, match="different TapeSpec"):
            rio.load_params(p, spec2)

    def test_loaded_scene_renders_identically(self, tmp_path):
        import jax

        scene = rm.sphere(radius=0.8) | rm.plane(normal=(0, 1, 0), offset=1.5)
        cam = rm.Camera.looking_at(position=(0, 1, 4), target=(0, 0, 0))
        cfg = rm.RenderConfig(aa_samples=1, max_iter=32)
        p = str(tmp_path / "scene.npz")
        rio.save_scene(p, rm.encode_wire(scene))
        tape, _ = rio.load_scene(p)
        spec1, arrays1 = rm.compile_scene(scene)
        spec2, arrays2 = rm.compile_wire(tape)
        assert spec1 == spec2
        render = jax.jit(rm.make_renderer(spec1, 12, 12, cfg, mode="forward"))
        np.testing.assert_allclose(
            np.asarray(render(arrays1, cam)), np.asarray(render(arrays2, cam))
        )


class TestMarchStats:
    def test_basic(self):
        steps = np.array([1, 2, 3, 100])
        hit = np.array([1.0, 1.0, 0.0, 0.0])
        s = march_stats(steps, hit)
        assert s.n_rays == 4
        assert s.hit_rate == 0.5
        assert s.max_steps == 100
        assert "hit_rate=0.500" in str(s)

    def test_tile_divergence(self):
        # Two tiles of 4: [1,1,1,9] and [5,5,5,5].
        steps = np.array([1, 1, 1, 9, 5, 5, 5, 5])
        hit = np.ones(8)
        s = march_stats(steps, hit, tile_size=4)
        per_ray = steps.sum()  # 32
        tile_cost = 9 * 4 + 5 * 4  # 56
        assert s.tile_divergence == pytest.approx(tile_cost / per_ray)

    def test_from_march_outputs(self):
        import jax

        from raymarch_tpu.ops.march import make_march

        scene = rm.sphere(radius=1.0)
        spec, arrays = rm.compile_scene(scene)
        cfg = rm.RenderConfig(aa_samples=1, max_iter=50)
        cam = rm.Camera.looking_at(position=(0, 0, 4), target=(0, 0, 0))
        import jax.numpy as jnp

        idx = jnp.arange(256, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, cam.position, cam.rotation, 16, 16, cfg)
        march = make_march(spec, cfg, "forward")
        t, hit, steps = jax.jit(lambda o, d, a: march(o, d, a))(o, d, arrays)
        s = march_stats(steps, hit)
        assert 0.0 < s.hit_rate < 1.0
        assert 1 <= s.avg_steps <= 50

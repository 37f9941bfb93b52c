"""Native (C++) tape core vs the Python/NumPy implementations: a third
independent evaluator cross-checking the opcode ABI end to end."""

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu import native
from raymarch_tpu.models.csg import box, plane, sphere, torus

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

SCENES = [
    sphere(center=(0.3, -0.2, 0.1), radius=0.8),
    (sphere(radius=1.2) & box()) - torus(minor_radius=0.4),
    sphere().union(box(center=(1, 0, 0)), k=0.5).round(0.1),
    box().rotate_axis_angle((1, 1, 0), 0.8) | plane(offset=2.0),
    box().subtract(sphere(radius=1.1), k=0.3).onion(0.07),
]


class TestNativeOracle:
    @pytest.mark.parametrize("i", range(len(SCENES)))
    def test_eval_matches_numpy_oracle(self, i, rng):
        tape = rm.encode_wire(SCENES[i])
        pts = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
        d_native = native.eval_tape(tape, pts)
        d_numpy = rm.oracle.eval_tape(tape, pts)
        np.testing.assert_allclose(d_native, d_numpy, rtol=1e-5, atol=1e-5)

    def test_empty_tape(self):
        d = native.eval_tape(np.zeros(0, np.uint32), np.zeros((4, 3)), 100.0)
        np.testing.assert_allclose(d, 100.0)

    def test_validate(self):
        tape = rm.encode_wire(SCENES[1])
        cmds, depth = native.validate(tape)
        assert cmds == 5
        assert depth == 2

    def test_validate_rejects_garbage(self):
        with pytest.raises(ValueError):
            native.validate(np.array([100], dtype=np.uint32))  # union, empty stack
        with pytest.raises(ValueError):
            native.validate(np.array([0, 0], dtype=np.uint32))  # truncated sphere

    def test_march_matches_numpy(self, rng):
        tape = rm.encode_wire(SCENES[0])
        cam = rm.Camera.looking_at(position=(0.0, 1.0, 4.0), target=(0, 0, 0))
        o, d = rm.camera_rays_np(cam, 16, 16, rm.DEFAULT_CONFIG)
        o = o.reshape(-1, 3)[:256]
        d = d.reshape(-1, 3)[:256]
        t_n, hit_n = native.march(tape, o, d)
        t_p, hit_p = rm.oracle.march(tape, o, d)
        assert (hit_n == hit_p).all()
        np.testing.assert_allclose(t_n[hit_n], t_p[hit_n], atol=1e-4)


class TestNativeEncoder:
    def test_sphere_union_matches_python_encoder(self, rng):
        spheres = rng.uniform(-2, 2, (17, 4)).astype(np.float32)
        spheres[:, 3] = np.abs(spheres[:, 3]) + 0.1
        t_native = native.build_sphere_union(spheres)

        node = None
        for cx, cy, cz, r in spheres:
            s = sphere(center=(cx, cy, cz), radius=float(r))
            node = s if node is None else (node | s)
        t_python = rm.encode_wire(node)
        np.testing.assert_array_equal(t_native, t_python)

    def test_large_procedural_scene(self, rng):
        """BASELINE config 5 scale: 64-primitive procedural scene encodes and
        evaluates consistently through the native path."""
        spheres = rng.uniform(-4, 4, (64, 4)).astype(np.float32)
        spheres[:, 3] = np.abs(spheres[:, 3]) * 0.3 + 0.1
        tape = native.build_sphere_union(spheres)
        cmds, depth = native.validate(tape)
        assert cmds == 127
        assert depth == 2  # left-leaning chain
        pts = rng.uniform(-4, 4, (128, 3)).astype(np.float32)
        d_native = native.eval_tape(tape, pts)
        d_numpy = rm.oracle.eval_tape(tape, pts)
        np.testing.assert_allclose(d_native, d_numpy, rtol=1e-5, atol=1e-5)

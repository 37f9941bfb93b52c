"""Oracle tests: each SDF opcode vs closed form, interpreter semantics, and
oracle-vs-device-program cross-validation (two encodings, two interpreters)."""

import numpy as np
import pytest

from raymarch_tpu import DEFAULT_CONFIG, compile_scene, csg, encode_wire, oracle
from raymarch_tpu.models.csg import box, plane, sphere, torus


def pts(rng, n=64, scale=3.0):
    return (rng.uniform(-scale, scale, size=(n, 3))).astype(np.float32)


class TestOpcodeMath:
    """Closed-form ground truth per primitive (reference wgsl:229-252)."""

    def test_sphere(self, rng):
        p = pts(rng)
        d = oracle.eval_tape(encode_wire(sphere(center=(1, 2, 3), radius=0.5)), p)
        expected = np.linalg.norm(p - np.array([1, 2, 3]), axis=-1) - 0.5
        np.testing.assert_allclose(d, expected, rtol=1e-5, atol=1e-6)

    def test_box_outside_corner(self):
        tape = encode_wire(box(half_extents=(1, 1, 1)))
        d = oracle.eval_tape(tape, np.array([[2.0, 2.0, 2.0]]))
        np.testing.assert_allclose(d, [np.sqrt(3.0)], rtol=1e-6)

    def test_box_inside(self):
        tape = encode_wire(box(half_extents=(1, 2, 3)))
        d = oracle.eval_tape(tape, np.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(d, [-1.0], rtol=1e-6)

    def test_box_face(self):
        tape = encode_wire(box(half_extents=(1, 1, 1)))
        d = oracle.eval_tape(tape, np.array([[1.5, 0.0, 0.0]]))
        np.testing.assert_allclose(d, [0.5], rtol=1e-6)

    def test_torus(self):
        tape = encode_wire(torus(major_radius=2.0, minor_radius=0.5))
        # On the ring center circle: distance = -0.5 (deepest inside).
        d = oracle.eval_tape(tape, np.array([[2.0, 0.0, 0.0]]))
        np.testing.assert_allclose(d, [-0.5], rtol=1e-6)
        # On axis: sqrt(R^2) - r at y=0 -> 2 - 0.5.
        d = oracle.eval_tape(tape, np.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(d, [1.5], rtol=1e-6)

    def test_plane(self, rng):
        p = pts(rng)
        tape = encode_wire(plane(normal=(0, 1, 0), offset=1.5))
        np.testing.assert_allclose(
            oracle.eval_tape(tape, p), p[:, 1] + 1.5, rtol=1e-5, atol=1e-6
        )

    def test_union_min(self, rng):
        p = pts(rng)
        a, b = sphere(radius=1.0), box(center=(1, 0, 0))
        du = oracle.eval_tape(encode_wire(a | b), p)
        da = oracle.eval_tape(encode_wire(a), p)
        db = oracle.eval_tape(encode_wire(b), p)
        np.testing.assert_allclose(du, np.minimum(da, db), rtol=1e-6)

    def test_subtraction(self, rng):
        p = pts(rng)
        a, b = box(), sphere(radius=1.2)
        d = oracle.eval_tape(encode_wire(a - b), p)
        da = oracle.eval_tape(encode_wire(a), p)
        db = oracle.eval_tape(encode_wire(b), p)
        np.testing.assert_allclose(d, np.maximum(da, -db), rtol=1e-6)

    def test_intersection(self, rng):
        p = pts(rng)
        a, b = box(), sphere(radius=1.2)
        d = oracle.eval_tape(encode_wire(a & b), p)
        da = oracle.eval_tape(encode_wire(a), p)
        db = oracle.eval_tape(encode_wire(b), p)
        np.testing.assert_allclose(d, np.maximum(da, db), rtol=1e-6)

    def test_smooth_union_bounds(self, rng):
        """smin <= min, equals min when far apart, C0-close for small k."""
        p = pts(rng, n=256)
        a, b = sphere(radius=1.0), sphere(center=(3, 0, 0), radius=1.0)
        k = 0.25
        ds = oracle.eval_tape(encode_wire(a.union(b, k=k)), p)
        dmin = np.minimum(
            oracle.eval_tape(encode_wire(a), p), oracle.eval_tape(encode_wire(b), p)
        )
        assert (ds <= dmin + 1e-6).all()
        assert (ds >= dmin - k / 4 - 1e-6).all()

    def test_round_onion(self, rng):
        p = pts(rng)
        base = oracle.eval_tape(encode_wire(sphere()), p)
        d_round = oracle.eval_tape(encode_wire(sphere().round(0.2)), p)
        d_onion = oracle.eval_tape(encode_wire(sphere().onion(0.1)), p)
        np.testing.assert_allclose(d_round, base - 0.2, rtol=1e-6)
        np.testing.assert_allclose(d_onion, np.abs(base) - 0.1, rtol=1e-6)

    def test_rotated_box(self):
        # 90deg about y maps local +x to world -z: the long axis moves.
        b = box(half_extents=(2.0, 0.5, 0.5)).rotate_axis_angle((0, 1, 0), np.pi / 2)
        tape = encode_wire(b)
        d = oracle.eval_tape(tape, np.array([[0.0, 0.0, 1.9], [1.9, 0.0, 0.0]]))
        assert d[0] < 0  # inside along rotated long axis
        assert d[1] > 0  # outside along original axis

    def test_empty_tape_max_dist(self, rng):
        p = pts(rng)
        d = oracle.eval_tape(encode_wire(None), p)
        np.testing.assert_allclose(d, DEFAULT_CONFIG.max_dist)

    def test_scaled_sphere_exact_distance(self, rng):
        """Uniform scale keeps exact (not just conservative) distances."""
        p = pts(rng)
        d = oracle.eval_tape(encode_wire(sphere(radius=1.0).scale(2.5)), p)
        expected = np.linalg.norm(p, axis=-1) - 2.5
        np.testing.assert_allclose(d, expected, rtol=1e-5, atol=1e-6)


class TestDeviceEquivalence:
    """Wire-tape oracle vs jnp device program: same distances everywhere."""

    SCENES = {
        "sphere": sphere(center=(0.3, -0.2, 0.1), radius=0.8),
        "two_types": sphere() | box(center=(1.5, 0, 0), half_extents=(0.5, 1, 0.5)),
        "csg_mix": (sphere(radius=1.2) & box()) - torus(minor_radius=0.4),
        "smooth": sphere().union(box(center=(1, 0, 0)), k=0.5),
        "smooth_sub": box().subtract(sphere(radius=1.1), k=0.3),
        "rotated": box().rotate_axis_angle((1, 1, 0), 0.8)
        | torus(center=(0, 1, 0)).rotate_axis_angle((1, 0, 0), 1.2),
        "round_onion": sphere().round(0.1) | box(center=(2, 0, 0)).onion(0.15),
        "deep": ((sphere() | box()) & (torus() | plane(offset=2.0)))
        - sphere(center=(0, 1, 0), radius=0.5),
        "plane_only": plane(normal=(0.3, 0.9, 0.1), offset=0.7),
    }

    @pytest.mark.parametrize("name", sorted(SCENES))
    def test_scene(self, name, rng):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.sdf import make_scene_fn

        scene_node = self.SCENES[name]
        p = pts(rng, n=128)
        wire = encode_wire(scene_node)
        d_oracle = oracle.eval_tape(wire, p)

        spec, arrays = compile_scene(scene_node)
        scene_fn = jax.jit(make_scene_fn(spec, DEFAULT_CONFIG))
        d_device = np.asarray(scene_fn(jnp.asarray(p), arrays))
        np.testing.assert_allclose(d_device, d_oracle, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("name", ["csg_mix", "smooth", "rotated", "deep"])
    def test_scene_static_tape(self, name, rng):
        """static=True (unrolled combine) matches the oracle too."""
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.sdf import make_scene_fn

        scene_node = self.SCENES[name]
        p = pts(rng, n=128)
        d_oracle = oracle.eval_tape(encode_wire(scene_node), p)
        spec, arrays = compile_scene(scene_node, static=True)
        assert spec.static_tape is not None
        scene_fn = jax.jit(make_scene_fn(spec, DEFAULT_CONFIG))
        d_device = np.asarray(scene_fn(jnp.asarray(p), arrays))
        np.testing.assert_allclose(d_device, d_oracle, rtol=1e-4, atol=1e-5)

    def test_empty_scene_device(self, rng):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.sdf import make_scene_fn

        spec, arrays = compile_scene(None)
        scene_fn = jax.jit(make_scene_fn(spec, DEFAULT_CONFIG))
        d = np.asarray(scene_fn(jnp.asarray(pts(rng)), arrays))
        np.testing.assert_allclose(d, DEFAULT_CONFIG.max_dist)

"""Bounding-sphere march acceleration tests (interpret mode).

The bound is conservative, so results match the plain march except for
grazing rays that pass within ~min_dist of a surface, where hit detection is
sensitive to the exact sample sequence (the same sensitivity any step-
sequence change has). Sky rays skip the march entirely.
"""

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu import RenderConfig
from raymarch_tpu.ops.pallas_march import compute_bound, make_pallas_ray_march

SCENE = (
    rm.sphere(center=(-0.6, 0, 0), radius=0.9)
    | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
) - rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25)
CAM = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
CFG0 = RenderConfig(aa_samples=2, max_iter=80)
CFG1 = RenderConfig(aa_samples=2, max_iter=80, bound_accel=True)


def _march_pair(scene, static):
    import jax
    import jax.numpy as jnp

    spec, arrays = rm.compile_scene(scene, static=static)
    idx = jnp.arange(4096, dtype=jnp.int32)
    o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 32, 32, CFG0)
    m0 = make_pallas_ray_march(spec, CFG0, True)
    m1 = make_pallas_ray_march(spec, CFG1, True)
    r0 = tuple(map(np.asarray, jax.jit(lambda a, o, d: m0(a, o, d))(arrays, o, d)))
    r1 = tuple(map(np.asarray, jax.jit(lambda a, o, d: m1(a, o, d))(arrays, o, d)))
    return spec, arrays, r0, r1


class TestBoundAccel:
    @pytest.mark.parametrize("static", [False, True])
    def test_matches_plain_march(self, static):
        _, _, (t0, h0, s0), (t1, h1, s1) = _march_pair(SCENE, static)
        agree = (h0 == h1).mean()
        assert agree > 0.999, agree  # grazing-threshold rays only
        m = (h0 > 0.5) & (h1 > 0.5)
        # Both marches stop at the first sample with d < min_dist; different
        # sample sequences place that within ~min_dist of each other.
        np.testing.assert_allclose(t0[m], t1[m], atol=2 * CFG0.min_dist)
        # The acceleration must actually accelerate: fewer scene evals.
        assert s1.mean() < s0.mean() * 0.8
        # Sky rays (miss the bound) march zero steps.
        sky = (h1 < 0.5) & (s1 == 0)
        assert sky.sum() > 0

    def test_bound_is_conservative(self, rng):
        """Every point of the surface lies inside the bound: sample scene
        distance on the bound sphere — it must be positive everywhere."""
        spec, arrays = rm.compile_scene(SCENE)
        b = np.asarray(compute_bound(spec, arrays))
        assert b[4] == 1.0
        c, r = b[:3], b[3]
        dirs = rng.normal(size=(512, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = c + dirs * r
        d = rm.oracle.eval_tape(rm.encode_wire(SCENE), pts)
        assert (d > 0).all(), d.min()

    def test_plane_disables_bound(self):
        spec, arrays = rm.compile_scene(SCENE | rm.plane(offset=1.5), static=True)
        b = np.asarray(compute_bound(spec, arrays))
        assert b[4] == 0.0
        _, _, (t0, h0, s0), (t1, h1, s1) = _march_pair(
            SCENE | rm.plane(offset=1.5), True
        )
        assert (h0 == h1).all()
        np.testing.assert_allclose(t0, t1, atol=1e-6)
        np.testing.assert_array_equal(s0, s1)

    def test_smooth_scene_bound_covers_blend(self, rng):
        scene = rm.sphere(center=(-1, 0, 0)).union(
            rm.sphere(center=(1, 0, 0)), k=0.6
        )
        spec, arrays = rm.compile_scene(scene, static=True)
        b = np.asarray(compute_bound(spec, arrays))
        c, r = b[:3], b[3]
        dirs = rng.normal(size=(256, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        d = rm.oracle.eval_tape(rm.encode_wire(scene), c + dirs * r)
        assert (d > 0).all()

    def test_relaxed_march_exact(self):
        """Over-relaxed sphere tracing (cfg.relax > 1) keeps hits exact
        modulo grazing-threshold sensitivity. (Measured on this scene it
        does NOT reduce evals — the overshoot-fallback costs more than the
        longer steps save — which is why it defaults off; the bound accel
        is the effective lever here.)"""
        import jax
        import jax.numpy as jnp

        spec, arrays = rm.compile_scene(SCENE, static=True)
        idx = jnp.arange(2048, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 32, 32, CFG0)
        m0 = make_pallas_ray_march(spec, CFG0, True)
        mr = make_pallas_ray_march(
            spec, RenderConfig(aa_samples=2, max_iter=80, relax=1.6), True
        )
        t0, h0, _ = map(np.asarray, jax.jit(lambda a, o, d: m0(a, o, d))(arrays, o, d))
        t1, h1, _ = map(np.asarray, jax.jit(lambda a, o, d: mr(a, o, d))(arrays, o, d))
        assert (h0 == h1).mean() > 0.999
        m = (h0 > 0.5) & (h1 > 0.5)
        np.testing.assert_allclose(t0[m], t1[m], atol=2 * CFG0.min_dist)

    def test_bound_updates_with_edits(self):
        """The bound is computed from TapeArrays inside jit: moving a leaf
        moves the bound with no recompilation."""
        import jax

        spec, arrays = rm.compile_scene(SCENE)
        f = jax.jit(lambda a: compute_bound(spec, a))
        b1 = np.asarray(f(arrays))
        import dataclasses

        lp = arrays.leaf_params.copy()
        lp[:, 4] += 5.0  # shift all centers in x
        b2 = np.asarray(f(dataclasses.replace(arrays, leaf_params=lp)))
        assert abs(b2[0] - b1[0] - 5.0) < 0.5
        assert f._cache_size() == 1

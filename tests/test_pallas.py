"""Pallas march kernel tests (interpreter mode on CPU; the same kernels are
validated compiled-on-TPU by bench.py / the verify drive)."""

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu import RenderConfig

CFG = RenderConfig(aa_samples=2, max_iter=60)

SCENE = (
    rm.sphere(radius=1.0)
    | rm.box(center=(1.5, 0, 0), half_extents=(0.5, 0.5, 0.5))
) - rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25)

CAM = rm.Camera.looking_at(position=(0.0, 1.5, 4.0), target=(0, 0, 0))


@pytest.fixture(scope="module")
def compiled():
    spec, arrays = rm.compile_scene(SCENE | rm.plane(normal=(0, 1, 0), offset=1.5))
    return spec, arrays


class TestPallasRayMarch:
    def test_matches_jnp_march(self, compiled):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.march import make_march
        from raymarch_tpu.ops.pallas_march import make_pallas_ray_march

        spec, arrays = compiled
        n = 1024 + 130  # force padding
        idx = jnp.arange(n, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 48, 48, CFG)

        pm = make_pallas_ray_march(spec, CFG, True)  # interpret
        t_p, hit_p, steps_p = map(
            np.asarray, jax.jit(lambda a, o, d: pm(a, o, d))(arrays, o, d)
        )
        jm = make_march(spec, CFG, "forward")
        t_j, hit_j, steps_j = map(
            np.asarray, jax.jit(lambda o, d, a: jm(o, d, a))(o, d, arrays)
        )
        assert (hit_p == hit_j).all()
        np.testing.assert_array_equal(steps_p, steps_j)
        m = hit_j > 0.5
        np.testing.assert_allclose(t_p[m], t_j[m], atol=1e-5)

    def test_image_march_matches_flat_raygen(self, compiled):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.march import make_march
        from raymarch_tpu.ops.pallas_march import make_pallas_image_march

        spec, arrays = compiled
        W = H = 24
        im = make_pallas_image_march(spec, CFG, W, H, True)
        cam_vec = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        t_i, hit_i, _ = map(np.asarray, jax.jit(lambda a, c: im(a, c))(arrays, cam_vec))

        total = CFG.aa_samples**2 * H * W
        idx = jnp.arange(total, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, W, H, CFG)
        jm = make_march(spec, CFG, "forward")
        t_j, hit_j, _ = map(
            np.asarray, jax.jit(lambda o, d, a: jm(o, d, a))(o, d, arrays)
        )
        assert (hit_i == hit_j).mean() > 0.999  # raygen f32 rounding at edges
        m = (hit_i > 0.5) & (hit_j > 0.5)
        np.testing.assert_allclose(t_i[m], t_j[m], atol=1e-4)

    def test_pallas_image_renderer_vs_oracle(self, compiled):
        import jax

        spec, arrays = compiled
        W = H = 24
        from raymarch_tpu.ops import pallas_march as pmod

        im = pmod.make_pallas_image_march(spec, CFG, W, H, True)

        # Build the renderer manually around the interpreted kernel to stay
        # CPU-compatible.
        import jax.numpy as jnp

        from raymarch_tpu.ops.march import _gamma, shade
        from raymarch_tpu.ops.raygen import raygen_flat
        from raymarch_tpu.ops.sdf import make_scene_fn

        scene_fn = make_scene_fn(spec, CFG)
        total = CFG.aa_samples**2 * H * W

        def render_interp(arrays, camera):
            cam_vec = jnp.concatenate(
                [
                    jnp.asarray(camera.position, jnp.float32),
                    jnp.asarray(camera.rotation, jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                ]
            )
            t, hit, _ = im(arrays, cam_vec)
            idx = jnp.arange(total, dtype=jnp.int32)
            o, d = raygen_flat(idx, camera.position, camera.rotation, W, H, CFG)
            color = _gamma(shade(scene_fn, o, d, t, hit, arrays, CFG))
            s = CFG.aa_samples**2
            return color.reshape(H, W, s, 3).mean(axis=2)  # pixel-major order

        img_p = np.asarray(jax.jit(render_interp)(arrays, CAM))
        wire = rm.encode_wire(SCENE | rm.plane(normal=(0, 1, 0), offset=1.5))
        img_o = rm.oracle.render(wire, CAM, W, H, CFG)
        err = np.abs(img_p - img_o)
        assert err.max() < 2e-2
        assert np.mean(err > 1e-3) < 0.02

    def test_static_tape_kernel_matches_dynamic(self):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_march import make_pallas_ray_march

        scene = SCENE | rm.plane(normal=(0, 1, 0), offset=1.5)
        specD, arrD = rm.compile_scene(scene)
        specS, arrS = rm.compile_scene(scene, static=True)
        idx = jnp.arange(1024, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 16, 16, CFG)
        mD = make_pallas_ray_march(specD, CFG, True)
        mS = make_pallas_ray_march(specS, CFG, True)
        tD, hD, sD = map(np.asarray, jax.jit(lambda a, o, d: mD(a, o, d))(arrD, o, d))
        tS, hS, sS = map(np.asarray, jax.jit(lambda a, o, d: mS(a, o, d))(arrS, o, d))
        assert (hD == hS).all()
        np.testing.assert_array_equal(sD, sS)
        np.testing.assert_allclose(tD, tS, atol=1e-6)

    def test_pallas_implicit_grads_match_jnp(self, compiled):
        """make_march_pallas (pallas fwd + implicit VJP) == jnp implicit."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.march import make_march
        from raymarch_tpu.ops.pallas_march import make_pallas_ray_march
        from raymarch_tpu.ops.sdf import make_scene_fn

        from raymarch_tpu.ops.pallas_march import make_march_pallas

        spec, arrays = compiled
        march = make_march_pallas(spec, CFG, interpret=True)

        n = 256
        idx = jnp.arange(n, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 16, 16, CFG)

        def t_sum_pallas(lp):
            t, hit, _ = march(o, d, dataclasses.replace(arrays, leaf_params=lp))
            return jnp.sum(t * hit)

        jm = make_march(spec, CFG, "implicit")

        def t_sum_jnp(lp):
            t, hit, _ = jm(o, d, dataclasses.replace(arrays, leaf_params=lp))
            return jnp.sum(t * hit)

        lp = jnp.asarray(arrays.leaf_params)
        g_p = np.asarray(jax.grad(t_sum_pallas)(lp))
        g_j = np.asarray(jax.grad(t_sum_jnp)(lp))
        np.testing.assert_allclose(g_p, g_j, rtol=1e-4, atol=1e-6)

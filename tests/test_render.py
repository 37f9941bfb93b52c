"""Renderer tests: jnp device renderer vs NumPy oracle (forward images),
raygen equivalence, chunking invariance, runtime-edit stability."""

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu import DEFAULT_CONFIG, RenderConfig

pytestmark = pytest.mark.filterwarnings("ignore")


def small_cfg(**kw):
    base = dict(aa_samples=2, max_iter=60)
    base.update(kw)
    return RenderConfig(**base)


SCENE = rm.sphere(center=(0.0, 0.0, 0.0), radius=1.0) | rm.plane(
    normal=(0, 1, 0), offset=1.5
)
CAM = rm.Camera.looking_at(position=(0.0, 1.0, 4.0), target=(0.0, 0.0, 0.0))


class TestRaygen:
    def test_jnp_matches_numpy_matrices(self):
        import jax.numpy as jnp

        W, H = 17, 13  # deliberately unaligned
        cfg = small_cfg()
        o_np, d_np = rm.camera_rays_np(CAM, W, H, cfg)  # [S,H,W,3], s-major
        n = cfg.aa_samples * cfg.aa_samples * H * W
        idx = jnp.arange(n, dtype=jnp.int32)
        o_j, d_j = rm.raygen_flat(idx, CAM.position, CAM.rotation, W, H, cfg)
        # raygen_flat is pixel-major: r = (i*W+j)*S + s.
        o_ref = np.transpose(o_np, (1, 2, 0, 3)).reshape(-1, 3)
        d_ref = np.transpose(d_np, (1, 2, 0, 3)).reshape(-1, 3)
        np.testing.assert_allclose(np.asarray(o_j), o_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_j), d_ref, rtol=1e-4, atol=1e-5)

    def test_directions_unit_norm(self):
        import jax.numpy as jnp

        cfg = small_cfg()
        idx = jnp.arange(64, dtype=jnp.int32)
        _, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, 8, 8, cfg)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-6
        )


class TestRenderVsOracle:
    @pytest.mark.parametrize(
        "scene_name,scene",
        [
            ("config1_sphere_plane", SCENE),
            (
                "config2_csg_mix",
                (
                    rm.sphere(center=(-0.7, 0, 0), radius=0.8)
                    | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
                )
                - rm.torus(center=(0, 0.5, 0), major_radius=0.8, minor_radius=0.3),
            ),
            (
                "smooth_blend",
                rm.sphere(center=(-0.5, 0, 0)).union(
                    rm.sphere(center=(0.5, 0, 0)), k=0.4
                ),
            ),
            ("empty", None),
        ],
    )
    def test_image_allclose(self, scene_name, scene):
        import jax

        W = H = 24
        cfg = small_cfg()
        img_o = rm.oracle.render(rm.encode_wire(scene), CAM, W, H, cfg)
        spec, arrays = rm.compile_scene(scene)
        render = jax.jit(rm.make_renderer(spec, W, H, cfg, mode="forward"))
        img_d = np.asarray(render(arrays, CAM))
        # f32 march + AA edge pixels: allow a few sub-1e-2 deviations.
        err = np.abs(img_d - img_o)
        assert err.max() < 2e-2, f"max err {err.max()}"
        assert np.mean(err > 1e-3) < 0.02

    def test_chunked_equals_unchunked(self):
        import jax

        W = H = 16
        cfg = small_cfg()
        spec, arrays = rm.compile_scene(SCENE)
        r1 = jax.jit(rm.make_renderer(spec, W, H, cfg, mode="forward"))
        r2 = jax.jit(rm.make_renderer(spec, W, H, cfg, mode="forward", chunk=256))
        np.testing.assert_allclose(
            np.asarray(r1(arrays, CAM)), np.asarray(r2(arrays, CAM)), atol=1e-6
        )

    def test_march_modes_agree_forward(self):
        import jax

        W = H = 16
        cfg = small_cfg()
        spec, arrays = rm.compile_scene(SCENE)
        imgs = {}
        for mode in ("forward", "implicit", "unrolled"):
            r = jax.jit(rm.make_renderer(spec, W, H, cfg, mode=mode))
            imgs[mode] = np.asarray(r(arrays, CAM))
        np.testing.assert_allclose(imgs["forward"], imgs["implicit"], atol=1e-6)
        np.testing.assert_allclose(imgs["forward"], imgs["unrolled"], atol=1e-4)

    def test_runtime_edit_no_recompile(self):
        import jax

        W = H = 16
        cfg = small_cfg()
        spec, arrays = rm.compile_scene(SCENE)
        render = jax.jit(rm.make_renderer(spec, W, H, cfg, mode="forward"))
        img1 = np.asarray(render(arrays, CAM))
        scene2 = rm.sphere(center=(0.6, 0.2, 0.0), radius=0.8) | rm.plane(
            normal=(0, 1, 0), offset=1.5
        )
        spec2, arrays2 = rm.compile_scene(scene2)
        assert spec2 == spec
        img2 = np.asarray(render(arrays2, CAM))
        assert np.abs(img2 - img1).max() > 0.05
        assert render._cache_size() == 1  # one XLA program serves both scenes

    def test_orbit_camera_render(self):
        """Orbit controller -> camera -> image; sanity that orbiting changes
        the view smoothly."""
        import jax

        ctrl = rm.OrbitCameraController(target=(0, 0, 0), radius=5.0)
        spec, arrays = rm.compile_scene(SCENE)
        cfg = small_cfg(aa_samples=1)
        render = jax.jit(rm.make_renderer(spec, 16, 16, cfg, mode="forward"))
        img1 = np.asarray(render(arrays, ctrl.camera()))
        ctrl.orbit(40.0, 25.0)  # yaw/pitch a bit
        img2 = np.asarray(render(arrays, ctrl.camera()))
        assert np.abs(img2 - img1).max() > 1e-3
        assert not np.isnan(img2).any()

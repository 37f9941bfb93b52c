"""Sharded rendering/fitting over the fused Pallas kernels (8 virtual CPU
devices, interpret mode): the production multi-chip path.

Each device renders/differentiates its row band through the cone-prepass
forward and (for the fit) the fused backward kernel; the band's first row
arrives at runtime through the camera vector so ONE compiled kernel serves
every device. Cross-checks: band-sharded == single-device, fused fit step ==
jnp fit step.
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.parallel import make_mesh, make_fit_step, make_sharded_renderer

CFG = dataclasses.replace(
    rm.DEFAULT_CONFIG, aa_samples=2, max_iter=120, min_dist=1e-3, bound_accel=True
)
SCENE = rm.sphere(center=(-0.3, 0, 0), radius=0.9, material=(0.8, 0.2, 0.1)) | rm.box(
    center=(0.8, 0, 0), half_extents=(0.4, 0.4, 0.4)
)
CAM = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
W, H = 48, 36  # H=36: uneven 8-way row split exercises padding


@pytest.fixture(scope="module")
def compiled():
    return rm.compile_scene(SCENE, static=True)


class TestShardedFused:
    def test_prepass_sharded_equals_single(self, compiled):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        spec, arrays = compiled
        mesh = make_mesh(8)
        render_sh = jax.jit(
            make_sharded_renderer(
                spec, W, H, mesh, CFG, backend="pallas_prepass", interpret=True
            )
        )
        img_sh = np.asarray(render_sh(arrays, CAM))
        single = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=1,
        )
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        img_1 = np.asarray(single(arrays, cv))
        # Band and full-image programs are DIFFERENT compiled artifacts, so
        # XLA's fma/fusion choices can differ by an ulp per step; across a
        # ~100-step march that grows to ~1e-6 in t0 and can flip isolated
        # hit-threshold pixels (measured max 9e-5 on 4/1728 pixels). Same
        # tolerance class as the march's own threshold sensitivity.
        d = np.abs(img_sh - img_1)
        assert d.mean() < 1e-5, d.mean()
        assert (d.max(-1) > 1e-3).mean() < 0.01
        assert d.max() < 0.3

    def test_fused_fit_step_matches_jnp(self, compiled):
        import jax
        import jax.numpy as jnp
        import optax

        spec, arrays = compiled
        mesh = make_mesh(8)
        opt = optax.adam(1e-2)
        target = jnp.zeros((H, W, 3), jnp.float32) + 0.2
        results = {}
        for backend in ("jnp", "pallas_fused"):
            step = jax.jit(
                make_fit_step(
                    spec, W, H, mesh, opt, CFG, backend=backend, interpret=True
                )
            )
            st = opt.init(
                (jnp.asarray(arrays.leaf_params), jnp.asarray(arrays.op_param))
            )
            a1, _, _, loss = step(arrays, CAM, st, target)
            results[backend] = (float(loss), np.asarray(a1.leaf_params))
        l_j, lp_j = results["jnp"]
        l_f, lp_f = results["pallas_fused"]
        assert l_f == pytest.approx(l_j, rel=1e-4)
        np.testing.assert_allclose(lp_f, lp_j, atol=1e-5)


class TestBackwardObservability:
    def test_fit_step_reports_backward_kind(self):
        # Pure hard-union scene with culling: the O(active) compact backward
        # must be reported; with leaf_cull off, the legacy kernel with a
        # reason. (Prevents the silent ~10x training cliff — round-4 verdict.)
        import optax

        scene = rm.sphere(center=(-0.5, 0, 0), radius=0.6) | rm.sphere(
            center=(0.6, 0, 0), radius=0.5
        )
        spec, _ = rm.compile_scene(scene, static=True)
        mesh = make_mesh(8)
        cfg_cull = dataclasses.replace(CFG, leaf_cull=True, aa_samples=2)
        step = make_fit_step(
            spec, W, H, mesh, optax.adam(1e-2), cfg_cull,
            backend="pallas_fused", interpret=True,
        )
        info = step.backward_info
        assert info["kind"] == "pallas_compact"
        assert info["compact"] and info["reason"] is None

        cfg_nocull = dataclasses.replace(CFG, leaf_cull=False, aa_samples=2)
        step2 = make_fit_step(
            spec, W, H, mesh, optax.adam(1e-2), cfg_nocull,
            backend="pallas_fused", interpret=True,
        )
        info2 = step2.backward_info
        assert info2["kind"] == "pallas_legacy_unrolled"
        assert not info2["compact"]
        assert "leaf_cull" in info2["reason"]

    def test_jnp_fit_step_reports_backend(self):
        import optax

        spec, _ = rm.compile_scene(SCENE, static=True)
        mesh = make_mesh(8)
        step = make_fit_step(
            spec, W, H, mesh, optax.adam(1e-2), CFG, backend="jnp"
        )
        assert step.backward_info["kind"] == "jnp_implicit"

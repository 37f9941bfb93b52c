"""Silhouette (coverage) gradients via the soft-coverage march.

The round-1 gradient model was interior-only (implicit-function VJP at hit
points): a pure translation whose only loss signal is the silhouette moving
had EXACTLY zero gradient by construction. mode="soft" adds the coverage
channel (ops.march.make_march_soft / shade_soft): alpha driven by the ray's
closest approach, with the envelope-theorem VJP at the frozen argmin point.

The tests construct a provably silhouette-only problem: cfg.ambient = 1.0
makes diffuse identically 1 (the ambient max gate kills every normal/position
gradient on hit pixels), the camera looks upward so the background is black —
the ONLY image signal of a translation is the disk outline moving."""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm

# ambient=1.0 => interior shading is constant albedo (see module docstring).
CFG = dataclasses.replace(
    rm.DEFAULT_CONFIG, aa_samples=2, max_iter=60, ambient=1.0,
    coverage_beta=0.05,
)
# Camera slightly below, looking up: floor_t < 0 for every ray => black
# background, no floor signal.
CAM = rm.Camera.looking_at(position=(0.0, -0.5, 4.0), target=(0.0, 0.2, 0.0))
W = H = 48


def _render(scene, cfg, mode):
    import jax

    spec, arrays = rm.compile_scene(scene)
    r = rm.make_renderer(spec, W, H, cfg, mode=mode)
    return np.asarray(jax.jit(r)(arrays, CAM)), (spec, arrays)


class TestSoftForward:
    def test_matches_hard_renderer_away_from_silhouette(self):
        scene = rm.sphere(center=(0.0, 0.2, 0.0), radius=0.8)
        img_hard, _ = _render(scene, CFG, "forward")
        img_soft, _ = _render(scene, CFG, "soft")
        d = np.abs(img_hard - img_soft)
        # A halo of width O(beta) outside the silhouette, plus a faint glow
        # from the exponential tail amplified by sqrt gamma near black.
        assert d.mean() < 5e-2
        assert (d.max(-1) > 0.1).mean() < 0.15  # strong halo pixels only
        # Interior (center) pixels match exactly.
        assert d[H // 2 - 4 : H // 2 + 4, W // 2 - 4 : W // 2 + 4].max() < 1e-6

    def test_alpha_monotone_in_distance(self):
        # Pixels farther from the silhouette have dimmer halo.
        scene = rm.sphere(center=(0.0, 0.2, 0.0), radius=0.6)
        img_soft, _ = _render(scene, CFG, "soft")
        lum = img_soft.mean(-1)
        row = lum[H // 2]
        edge = np.argmax(row > 1e-4)
        assert row[edge] < row[edge + 2] < row[edge + 4]


class TestSilhouetteFit:
    def _loss_grad_x(self, mode, dx):
        """d(loss)/d(center_x) at a sphere offset dx from the target."""
        import jax
        import jax.numpy as jnp

        target, _ = _render(
            rm.sphere(center=(0.25, 0.2, 0.0), radius=0.8), CFG, "soft"
        )
        spec, arrays = rm.compile_scene(
            rm.sphere(center=(0.25 + dx, 0.2, 0.0), radius=0.8)
        )
        render = rm.make_renderer(spec, W, H, CFG, mode=mode)

        def loss(lp):
            img = render(dataclasses.replace(arrays, leaf_params=lp), CAM)
            return jnp.mean((img - jnp.asarray(target)) ** 2)

        g = jax.grad(loss)(jnp.asarray(arrays.leaf_params))
        return float(np.asarray(g)[0, 4])  # d/d center_x

    def test_interior_only_gradient_is_zero(self):
        # The old gradient model provably cannot see the translation.
        g = self._loss_grad_x("implicit", dx=0.15)
        assert abs(g) < 1e-7

    def test_soft_gradient_points_at_target(self):
        g_pos = self._loss_grad_x("soft", dx=0.15)
        g_neg = self._loss_grad_x("soft", dx=-0.15)
        assert g_pos > 1e-5  # loss decreases by moving -x
        assert g_neg < -1e-5

    def test_fit_recovers_pure_translation(self):
        import jax
        import optax

        target, _ = _render(
            rm.sphere(center=(0.25, 0.2, 0.0), radius=0.8), CFG, "soft"
        )
        spec, arrays = rm.compile_scene(
            rm.sphere(center=(0.0, 0.2, 0.0), radius=0.8)
        )
        mask = np.zeros_like(arrays.leaf_params)
        mask[0, 4] = 1.0  # center x only
        res = rm.fit_scene(
            spec, arrays, CAM, target,
            width=W, height=H, cfg=CFG, steps=80,
            optimizer=optax.adam(2e-2), leaf_mask=mask, mode="soft",
        )
        x = float(np.asarray(res.arrays.leaf_params)[0, 4])
        assert abs(x - 0.25) < 0.04, f"recovered x={x}"
        assert res.losses[-1] < res.losses[0] * 0.1


class TestFusedSoftKernel:
    """Pallas soft-coverage path (ops.pallas_prepass soft mode + the
    envelope term in ops.pallas_grad): must mirror the jnp soft path."""

    def _setup(self):
        import jax.numpy as jnp

        scene = rm.sphere(center=(0.0, 0.2, 0.0), radius=0.8) | rm.box(
            center=(1.2, 0.0, -0.3), half_extents=(0.4, 0.4, 0.4)
        )
        spec, arrays = rm.compile_scene(scene, static=True)
        cam = rm.Camera.looking_at(position=(0.3, 2.9, 4.2), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        cfg = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=64)
        return spec, arrays, cam, cv, cfg

    def test_soft_kernel_forward_matches_jnp_soft(self):
        import jax

        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        spec, arrays, cam, cv, cfg = self._setup()
        r = make_pallas_image_render_aa(
            spec, cfg, 64, 32, interpret=True, no_prepass=True,
            aa_packed=True, soft=True,
        )
        img_k = np.asarray(r(arrays, cv))
        img_j = np.asarray(
            jax.jit(rm.make_renderer(spec, 64, 32, cfg, mode="soft"))(
                arrays, cam
            )
        )
        # camera tilted below the floor-horizon (checker parity at the
        # horizon is ulp-sensitive between compiled artifacts)
        np.testing.assert_allclose(img_k, img_j, atol=5e-4)

    def test_soft_fused_vjp_matches_jnp_soft_grads(self):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        spec, arrays, cam, cv, cfg = self._setup()
        W2, H2 = 64, 32
        rv = make_fused_render_vjp(spec, cfg, W2, H2, interpret=True, soft=True)
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def loss_k(lp_, opp_, cv_):
            a = dataclasses.replace(arrays, leaf_params=lp_, op_param=opp_)
            return jnp.sum(rv(a, cv_) ** 2)

        glk, _gok, gck = jax.grad(loss_k, argnums=(0, 1, 2))(lp, opp, cv)

        render_j = rm.make_renderer(spec, W2, H2, cfg, mode="soft")

        def loss_j(lp_, camera):
            img = render_j(dataclasses.replace(arrays, leaf_params=lp_), camera)
            return jnp.sum(img ** 2)

        glj, gcj = jax.jit(jax.grad(loss_j, argnums=(0, 1)))(lp, cam)
        glk, glj = np.asarray(glk), np.asarray(glj)
        scale = np.abs(glj).max()
        np.testing.assert_allclose(glk, glj, rtol=5e-3, atol=2e-3 * scale)
        gc = np.asarray(gck)
        np.testing.assert_allclose(
            gc[:3], np.asarray(gcj.position), rtol=5e-3, atol=1e-2
        )
        np.testing.assert_allclose(
            gc[3:7], np.asarray(gcj.rotation), rtol=5e-3, atol=1e-2
        )

    def test_soft_fused_sees_pure_translation(self):
        # The provably silhouette-only problem (module docstring) through
        # the FUSED soft path: a pure translation must have nonzero,
        # correctly-signed gradient.
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        cfg = dataclasses.replace(CFG, coverage_beta=0.05)
        scene_t = rm.sphere(center=(0.0, 0.2, 0.0), radius=0.8)
        spec, arrays_t = rm.compile_scene(scene_t, static=True)
        rv = make_fused_render_vjp(spec, cfg, W, H, interpret=True, soft=True)
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(
                np.float32
            )
        )
        target = rv(arrays_t, cv)
        scene_0 = rm.sphere(center=(0.15, 0.2, 0.0), radius=0.8)
        _, arrays_0 = rm.compile_scene(scene_0, static=True)
        lp0 = jnp.asarray(arrays_0.leaf_params)
        opp0 = jnp.asarray(arrays_0.op_param)

        def loss(lp_):
            a = dataclasses.replace(arrays_0, leaf_params=lp_, op_param=opp0)
            return jnp.mean((rv(a, cv) - target) ** 2)

        g = np.asarray(jax.grad(loss)(lp0))
        gx = g[0, 4]  # d loss / d center_x
        assert gx > 1e-7, gx  # loss decreases moving -x (toward target)

    def test_soft_bound_accel_is_exact(self):
        # The inflated-bound soft acceleration must be EXACT: rays missing
        # the inflated bound have alpha exactly 0 in both paths, and the
        # cap lies past every scene point's projection (see
        # _fine_march_tile_soft's docstring).
        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        spec, arrays, cam, cv, cfg = self._setup()
        r_off = make_pallas_image_render_aa(
            spec, cfg, 64, 32, interpret=True, no_prepass=True,
            aa_packed=True, soft=True,
        )
        cfg_b = dataclasses.replace(cfg, bound_accel=True)
        r_on = make_pallas_image_render_aa(
            spec, cfg_b, 64, 32, interpret=True, no_prepass=True,
            aa_packed=True, soft=True,
        )
        a = np.asarray(r_off(arrays, cv))
        b = np.asarray(r_on(arrays, cv))
        np.testing.assert_array_equal(a, b)


class TestSoftCompactPoseFit:
    def test_many_primitive_pose_fit_converges(self):
        """Silhouette-driven camera-pose fit on a MANY-primitive scene via
        the compact soft backward (round 5): the stated use case of soft
        mode at scale. A perturbed pose must recover most of its loss."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp
        import optax

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        rng = np.random.default_rng(41)
        parts = [
            rm.sphere(
                center=tuple(rng.uniform(-1.5, 1.5, 3) * [1, 0.6, 1]),
                radius=float(rng.uniform(0.25, 0.5)),
            )
            for _ in range(12)
        ]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 32, 24
        cfg = dc.replace(
            rm.DEFAULT_CONFIG,
            aa_samples=2,
            coverage_beta=0.05,
            leaf_cull=True,
            bound_accel=True,
        )
        rv = make_fused_render_vjp(spec, cfg, W, H, interpret=True, soft=True)
        assert rv.compact_bwd

        cam_true = rm.Camera.looking_at(
            position=(0.2, 1.6, 5.0), target=(0, 0, 0)
        )
        cv_true = jnp.asarray(
            np.concatenate(
                [cam_true.position, cam_true.rotation, [0.0]]
            ).astype(np.float32)
        )
        target = rv(arrays, cv_true)

        def loss_fn(cv):
            return jnp.mean((rv(arrays, cv) - target) ** 2)

        gfn = jax.jit(jax.value_and_grad(loss_fn))
        # Perturb the pose (position + rotation).
        cv = cv_true + jnp.asarray(
            [0.15, -0.1, 0.12, 0.03, -0.02, 0.03, 0.0, 0.0], jnp.float32
        )
        opt = optax.adam(2e-2)
        state = opt.init(cv)
        l0 = float(gfn(cv)[0])
        for _ in range(30):
            l, g = gfn(cv)
            up, state = opt.update(g, state, cv)
            cv = cv + up
            # re-project the quaternion (as make_fit_step does)
            q = cv[3:7]
            cv = cv.at[3:7].set(q / jnp.maximum(jnp.linalg.norm(q), 1e-8))
        l1 = float(gfn(cv)[0])
        assert l1 < 0.3 * l0, (l0, l1)


class TestSoftCullAlphaFloor:
    def test_log_alpha_24_within_tolerance(self):
        """cfg.soft_cull_log_alpha=24 bounds the DIRECTLY dropped coverage
        alpha by exp(-24) ~ 4e-11; the residual difference vs the bitwise
        (104) configuration is the sample-phase class (culling perturbs
        step sizes, shifting the SAMPLED closest approach on grazing
        rays). On this scene the bounds overlap little, so images and
        gradients agree tightly; the config docstring documents the
        edge-pixel behavior at scale."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        rng = np.random.default_rng(19)
        parts = [
            rm.sphere(
                center=tuple(rng.uniform(-1.5, 1.5, 3) * [1, 0.5, 1]),
                radius=float(rng.uniform(0.25, 0.5)),
            )
            for _ in range(8)
        ]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        spec, arrays = rm.compile_scene(scene, static=True)
        cam = rm.Camera.looking_at(position=(0.3, 1.8, 5.0), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        outs = {}
        for la in (104.0, 24.0):
            cfg = dc.replace(
                rm.DEFAULT_CONFIG,
                aa_samples=2,
                coverage_beta=0.02,
                leaf_cull=True,
                bound_accel=True,
                soft_cull_log_alpha=la,
            )
            rv = make_fused_render_vjp(
                spec, cfg, 48, 32, interpret=True, soft=True
            )
            img = np.asarray(rv(arrays, cv))

            def loss(lp, c, rv=rv):
                a = dc.replace(arrays, leaf_params=lp)
                return jnp.sum(rv(a, c) ** 2)

            g = np.asarray(
                jax.grad(loss)(jnp.asarray(arrays.leaf_params), cv)
            )
            outs[la] = (img, g)
        d_img = np.abs(outs[104.0][0] - outs[24.0][0])
        d_g = np.abs(outs[104.0][1] - outs[24.0][1])
        gs = np.abs(outs[104.0][1]).max()
        assert d_img.max() < 1e-6, d_img.max()
        assert d_g.max() < 1e-6 * max(gs, 1.0), (d_g.max(), gs)

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

"""Cone-tracing AA prepass tests (interpreter mode on CPU).

The prepass renderer must be image-equivalent to the plain fused kernel
(ops.pallas_march.make_pallas_image_render + AA mean): the cone argument is
conservative, so the only differences are hit-threshold sensitivity — the hit
point may land anywhere within min_dist of the surface, exactly the tolerance
class the reference itself has (it accepts any sample with d < 0.01,
reference src/ray_marching/ray_marching.wgsl:95-96).
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.ops.pallas_march import make_pallas_image_render
from raymarch_tpu.ops.pallas_prepass import cone_omega, make_pallas_image_render_aa

CFG = dataclasses.replace(
    rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80, bound_accel=True
)

SCENE = (
    rm.sphere(center=(-0.6, 0, 0), radius=0.9)
    | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
) - rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25)

CAM = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0.0, 0.0, 0.0))


def _cam_vec(cam):
    import jax.numpy as jnp

    return jnp.asarray(
        np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
    )


def _reference_image(spec, arrays, cfg, W, H):
    rgb = make_pallas_image_render(spec, cfg, W, H, interpret=True)
    r, g, b = rgb(arrays, _cam_vec(CAM))
    S = cfg.aa_samples**2
    return np.stack(
        [np.asarray(v).reshape(H * W, S).mean(1) for v in (r, g, b)], -1
    ).reshape(H, W, 3)


def _assert_images_close(img, ref):
    d = np.abs(img - ref)
    # Mean agreement tight; isolated silhouette/crease pixels may flip within
    # the min_dist hit tolerance (same class as the reference's own
    # threshold sensitivity).
    assert d.mean() < 1e-3, f"mean diff {d.mean()}"
    assert (d > 1e-3).mean() < 0.03, f"frac>1e-3 {(d > 1e-3).mean()}"
    assert (d > 0.3).mean() == 0.0, f"max diff {d.max()}"


class TestPrepassRender:
    @pytest.fixture(scope="class")
    def static_compiled(self):
        return rm.compile_scene(SCENE, static=True)

    @pytest.mark.parametrize("block,chain", [(1, False), (4, False), (4, True)])
    def test_matches_plain_fused(self, static_compiled, block, chain):
        spec, arrays = static_compiled
        W, H = 65, 47  # non-multiples of block and lane count
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=block, prepass_chain=chain,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        assert img.shape == (H, W, 3)
        _assert_images_close(img, ref)

    def test_dynamic_tape(self):
        spec, arrays = rm.compile_scene(SCENE)  # dynamic (non-static) tape
        W, H = 48, 32
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_no_bound_accel_and_aa1(self):
        cfg = dataclasses.replace(CFG, bound_accel=False, aa_samples=1)
        spec, arrays = rm.compile_scene(SCENE, static=True)
        W, H = 48, 32
        ref = _reference_image(spec, arrays, cfg, W, H)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_unbounded_scene_with_plane(self):
        # Plane invalidates the bounding sphere; the prepass must still work.
        # Tolerances are looser here BY DESIGN: rays grazing the marched
        # plane near its horizon exhaust the reference's iteration budget
        # without hitting (max_iter banding); the prepass spends its coarse
        # budget once per pixel and so converges further, resolving some of
        # those rays to hits. Both images are budget artifacts of the same
        # surface; away from the horizon band they agree tightly.
        scene = SCENE | rm.plane(normal=(0, 1, 0), offset=1.5)
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 48, 32
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=4,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        d = np.abs(img - ref)
        assert d.mean() < 5e-3, f"mean diff {d.mean()}"
        assert (d.max(-1) > 0.05).mean() < 0.02  # horizon band only
        # Rows well below the horizon (near floor, steep incidence) agree.
        assert d[H // 2 + 4 :].mean() < 1e-3

    @pytest.mark.parametrize("ni", [1, 2, 3])
    def test_interval_prepass(self, static_compiled, ni):
        # Near-interval prepass: the coarse ray scans the whole scene once;
        # fine rays trace only inside recorded intervals and jump the far
        # gaps. Same conservative-cone tolerance class as the legacy
        # prepass.
        spec, arrays = static_compiled
        W, H = 65, 47
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=1, n_intervals=ni,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_interval_prepass_occluded_layers(self):
        # A small sphere hidden close behind a large one: rays that graze
        # the front sphere must still find the back sphere through the
        # interval jumps (and rays missing everything must miss).
        scene = (
            rm.sphere(center=(0, 0, 0), radius=0.8)
            | rm.sphere(center=(0.9, 0, -2.5), radius=0.6)
            | rm.sphere(center=(-1.4, 0.3, -5.0), radius=0.7)
        )
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 64, 48
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=1, n_intervals=2,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_interval_prepass_block4_and_relax(self, static_compiled):
        spec, arrays = static_compiled
        W, H = 65, 47
        ref = _reference_image(spec, arrays, CFG, W, H)
        import dataclasses as dc

        cfg = dc.replace(CFG, relax=1.6)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_coarse=8, bm_fine=8,
            prepass_block=4, n_intervals=2,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_no_prepass_strict_semantics(self, static_compiled):
        # no_prepass: every AA ray marches from t=0 with plain steps — the
        # reference's exact semantics on the 2D-tiled fine kernel. Images
        # must match the flat plain kernel to fp-reassociation tolerance
        # (hits bitwise identical; the diffuse dot product and the AA mean
        # accumulate in different fp orders).
        spec, arrays = static_compiled
        cfg = dataclasses.replace(CFG, bound_accel=False)
        W, H = 65, 47
        ref = _reference_image(spec, arrays, cfg, W, H)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_fine=8, no_prepass=True
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        assert img.shape == (H, W, 3)
        d = np.abs(img - ref)
        assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())

    def test_no_prepass_dynamic_tape_and_materials(self):
        scene = (
            rm.sphere(center=(-0.6, 0, 0), radius=0.9, material=(0.9, 0.2, 0.1))
            | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
        )
        cfg = dataclasses.replace(CFG, bound_accel=False)
        W, H = 48, 32
        for static in (True, False):
            spec, arrays = rm.compile_scene(scene, static=static)
            ref = _reference_image(spec, arrays, cfg, W, H)
            rnd = make_pallas_image_render_aa(
                spec, cfg, W, H, interpret=True, bm_fine=8, no_prepass=True
            )
            img = np.asarray(rnd(arrays, _cam_vec(CAM)))
            assert np.abs(img - ref).max() < 1e-3, static

    def test_no_prepass_rejects_intervals(self, static_compiled):
        spec, _ = static_compiled
        with pytest.raises(ValueError):
            make_pallas_image_render_aa(
                spec, CFG, 32, 32, no_prepass=True, n_intervals=2
            )

    @pytest.mark.parametrize(
        "kw",
        [
            dict(no_prepass=True),
            dict(prepass_block=1),
            dict(prepass_block=1, n_intervals=2),
        ],
        ids=["no_prepass", "legacy", "intervals"],
    )
    def test_aa_packed_matches_plain(self, static_compiled, kw):
        # AA-packed tile layout (all S samples of a pixel strip in one
        # tile): same math, different schedule. no_prepass is exact to fp
        # reassociation; prepass paths are in the cone tolerance class.
        spec, arrays = static_compiled
        W, H = 65, 47
        # Tight no_prepass comparison needs bound_accel off: the flat
        # reference kernel starts bounded rays at the bound entry, a
        # different (equally valid) sample sequence.
        cfg = (
            dataclasses.replace(CFG, bound_accel=False)
            if kw.get("no_prepass")
            else CFG
        )
        ref = _reference_image(spec, arrays, cfg, W, H)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_coarse=8, aa_packed=True, **kw
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        assert img.shape == (H, W, 3)
        d = np.abs(img - ref)
        if kw.get("no_prepass"):
            assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())
        else:
            _assert_images_close(img, ref)

    def test_aa_packed_dynamic_cull_relax(self):
        spec, arrays = rm.compile_scene(SCENE)  # dynamic tape
        cfg = dataclasses.replace(CFG, leaf_cull=True, relax=1.6)
        W, H = 48, 32
        ref = _reference_image(spec, arrays, CFG, W, H)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_coarse=8,
            prepass_block=1, n_intervals=2, aa_packed=True,
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        _assert_images_close(img, ref)

    def test_aa_packed_rejects_shared_normals(self, static_compiled):
        spec, arrays = static_compiled
        cfg = dataclasses.replace(CFG, aa_shared_normals=True)
        with pytest.raises(ValueError):
            make_pallas_image_render_aa(
                spec, cfg, 32, 32, interpret=True, aa_packed=True
            )

    def test_aa_shared_normals(self, static_compiled):
        # cfg.aa_shared_normals reuses the first hitting sample's 4-tap
        # normal for the pixel's other AA samples. Approximate by design:
        # per-sample normals differ by sub-pixel curvature, so tolerances
        # here are statistical (at 1080p the same stats are ~10x tighter;
        # measured frac px>0.05 = 0.07%).
        spec, arrays = static_compiled
        W, H = 65, 47
        ref = _reference_image(spec, arrays, CFG, W, H)
        cfg = dataclasses.replace(CFG, aa_shared_normals=True)
        rnd = make_pallas_image_render_aa(
            spec, cfg, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        img = np.asarray(rnd(arrays, _cam_vec(CAM)))
        assert np.isfinite(img).all()
        d = np.abs(img - ref)
        assert d.mean() < 5e-3, f"mean diff {d.mean()}"
        assert (d.max(-1) > 0.05).mean() < 0.03

    def test_runtime_edit_no_retrace(self, static_compiled):
        # Editing leaf params must reuse the same compiled render (tape is
        # data) — mirror of the reference's no-recompile editability.
        import jax

        spec, arrays = static_compiled
        W, H = 48, 32
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        traces = 0

        @jax.jit
        def render(a, c):
            nonlocal traces
            traces += 1
            return rnd(a, c)

        img1 = np.asarray(render(arrays, _cam_vec(CAM)))
        lp = np.asarray(arrays.leaf_params).copy()
        lp[0, 7] = 1.2  # grow the sphere
        arrays2 = dataclasses.replace(arrays, leaf_params=lp)
        img2 = np.asarray(render(arrays2, _cam_vec(CAM)))
        assert traces == 1
        assert np.abs(img1 - img2).max() > 1e-3  # the edit is visible


class TestConeOmega:
    def test_block1_smaller_than_block4(self):
        w1 = cone_omega(rm.DEFAULT_CONFIG, 1920, 1080, 1)
        w4 = cone_omega(rm.DEFAULT_CONFIG, 1920, 1080, 4)
        assert 0 < w1 < w4

    def test_covers_subpixel_offsets(self):
        # The cone must cover the worst-case angular deviation measured
        # numerically from the actual raygen.
        import jax.numpy as jnp

        W, H = 64, 48
        cfg = rm.DEFAULT_CONFIG
        omega = cone_omega(cfg, W, H, 1)
        idx = jnp.arange(W * H * cfg.aa_samples**2, dtype=jnp.int32)
        _, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, W, H, cfg)
        d = np.asarray(d).reshape(H * W, cfg.aa_samples**2, 3)
        center = d.mean(1)
        center /= np.linalg.norm(center, axis=-1, keepdims=True)
        cosang = np.clip((d * center[:, None, :]).sum(-1), -1, 1)
        max_dev = np.arccos(cosang).max()
        # Center-of-mass ray deviates from the true pixel-center ray by a
        # sub-half-pixel amount; omega must dominate the measured deviation.
        assert max_dev < omega


class TestMarchOnlyFast:
    """march_only mode of the prepass renderer (round-5: the raw-march API
    on the fused path's scheduling — packed tiles, prepass, cull/compact)."""

    def _scene(self):
        return (
            rm.sphere(center=(-0.6, 0.0, 0.0), radius=0.9)
            | rm.box(center=(0.8, 0.0, 0.0), half_extents=(0.5, 0.5, 0.5))
        ) - rm.torus(
            center=(0.0, 0.8, 0.0), major_radius=0.7, minor_radius=0.25
        )

    def test_matches_flat_march_kernel_no_prepass(self):
        import dataclasses as dc

        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_march import make_pallas_image_march
        from raymarch_tpu.ops.pallas_prepass import (
            make_pallas_image_march_fast,
        )

        spec, arrays = rm.compile_scene(self._scene(), static=True)
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        t0, h0, _ = make_pallas_image_march(
            spec, cfg, 64, 48, interpret=True, bm=8
        )(arrays, cv)
        t1, h1 = make_pallas_image_march_fast(
            spec, cfg, 64, 48, interpret=True, no_prepass=True
        )(arrays, cv)
        t0, h0, t1, h1 = (np.asarray(x) for x in (t0, h0, t1, h1))
        assert t1.shape == t0.shape
        agree = (h0 > 0.5) == (h1 > 0.5)
        assert agree.mean() > 0.999
        m = (h0 > 0.5) & (h1 > 0.5)
        # Same math, same sample sequence: bitwise-equal t on hits.
        assert np.abs(t0 - t1)[m].max() < 1e-5

    def test_prepass_variant_same_hits(self):
        import dataclasses as dc

        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_march import make_pallas_image_march
        from raymarch_tpu.ops.pallas_prepass import (
            make_pallas_image_march_fast,
        )

        spec, arrays = rm.compile_scene(self._scene(), static=True)
        cfg = dc.replace(
            rm.DEFAULT_CONFIG, aa_samples=2, bound_accel=True,
            exit_check_every=4,
        )
        cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        t0, h0, _ = make_pallas_image_march(
            spec, cfg, 64, 48, interpret=True, bm=8
        )(arrays, cv)
        t1, h1 = make_pallas_image_march_fast(
            spec, cfg, 64, 48, interpret=True, prepass_block=1,
            n_intervals=2,
        )(arrays, cv)
        t0, h0, t1, h1 = (np.asarray(x) for x in (t0, h0, t1, h1))
        # Cone-prepass tolerance class: grazing samples may flip; bound the
        # disagreement fraction and t deviation on co-hits.
        agree = (h0 > 0.5) == (h1 > 0.5)
        assert agree.mean() > 0.99
        m = (h0 > 0.5) & (h1 > 0.5)
        assert np.abs(t0 - t1)[m].max() < 2 * cfg.min_dist

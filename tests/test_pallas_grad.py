"""Fused-VJP renderer tests (ops.pallas_grad, interpreter mode on CPU).

The backward Pallas kernel must reproduce the jnp implicit-function renderer's
gradients. A tight min_dist is used for the comparisons so both forwards
converge to (numerically) the same hit points — at the default min_dist the
two marches stop anywhere within the same 0.01 band, which is a real forward
difference, not a backward bug (tested separately at the bench config by
bench.py on hardware).
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm

CFG = dataclasses.replace(
    rm.DEFAULT_CONFIG,
    aa_samples=2,
    max_iter=300,
    min_dist=1e-4,
    bound_accel=True,
)

SCENE = (
    rm.sphere(center=(-0.6, 0, 0), radius=0.9, material=(0.8, 0.2, 0.1))
    | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
).union(rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25), k=0.2)

CAM = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0.0, 0.0, 0.0))
W, H = 32, 24


@pytest.fixture(scope="module")
def renderers():
    import jax.numpy as jnp

    spec, arrays = rm.compile_scene(SCENE, static=True)
    from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

    rf = make_fused_render_vjp(spec, CFG, W, H, interpret=True, bm=8)
    rj = rm.make_renderer(spec, W, H, CFG, mode="implicit")
    cv = jnp.asarray(
        np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
    )
    return spec, arrays, rf, rj, cv


class TestFusedVJP:
    def test_forward_matches_jnp(self, renderers):
        import jax.numpy as jnp

        _, arrays, rf, rj, cv = renderers
        img_f = np.asarray(rf(arrays, cv))
        img_j = np.asarray(rj(arrays, CAM))
        assert np.abs(img_f - img_j).mean() < 1e-4

    def test_param_grads_match_jnp(self, renderers):
        import jax
        import jax.numpy as jnp

        _, arrays, rf, rj, cv = renderers
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def loss_f(lp, opp):
            a = dataclasses.replace(arrays, leaf_params=lp, op_param=opp)
            return jnp.mean((rf(a, cv) - 0.3) ** 2)

        def loss_j(lp, opp):
            a = dataclasses.replace(arrays, leaf_params=lp, op_param=opp)
            return jnp.mean((rj(a, CAM) - 0.3) ** 2)

        gf_lp, gf_op = jax.grad(loss_f, argnums=(0, 1))(lp, opp)
        gj_lp, gj_op = jax.grad(loss_j, argnums=(0, 1))(lp, opp)
        scale = np.abs(np.asarray(gj_lp)).max()
        np.testing.assert_allclose(
            np.asarray(gf_lp), np.asarray(gj_lp), atol=0.01 * scale
        )
        np.testing.assert_allclose(
            np.asarray(gf_op), np.asarray(gj_op), atol=0.01 * scale
        )
        # Albedo gradient present (material system differentiable here too).
        assert np.abs(np.asarray(gf_lp)[:, 12:15]).max() > 0

    def test_camera_grads_match_jnp(self, renderers):
        import jax
        import jax.numpy as jnp

        spec, arrays, rf, rj, cv = renderers

        def loss_f(c):
            return jnp.mean((rf(arrays, c) - 0.3) ** 2)

        def loss_j(camera):
            return jnp.mean((rj(arrays, camera) - 0.3) ** 2)

        gf = np.asarray(jax.grad(loss_f)(cv))
        gj = jax.grad(loss_j)(CAM)
        gj_vec = np.concatenate(
            [np.asarray(gj.position), np.asarray(gj.rotation)]
        )
        scale = np.abs(gj_vec).max()
        np.testing.assert_allclose(gf[:7], gj_vec, atol=0.02 * scale)
        assert gf[7] == 0.0

    def test_make_renderer_backend(self, renderers):
        import jax
        import jax.numpy as jnp

        spec, arrays, rf, _, cv = renderers
        # The interpret-mode kernel factory is cached; rebuilding through
        # make_renderer on CPU requires interpret, so call the factory path
        # directly here and just check the backend wiring raises cleanly for
        # non-implicit modes.
        with pytest.raises(ValueError):
            rm.make_renderer(spec, W, H, CFG, mode="forward", backend="pallas_fused")

    def test_dynamic_tape_rejected(self):
        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        spec, _ = rm.compile_scene(SCENE)  # dynamic
        with pytest.raises(NotImplementedError):
            make_fused_render_vjp(spec, CFG, W, H, interpret=True, bm=8)


class TestCulledBackward:
    def test_grads_match_uncylled_with_distant_leaves(self):
        """cfg.leaf_cull in the fused VJP: gradients with per-tile cull gates
        must equal the ungated gradients (culled leaves' grads are exactly
        zero by the substitution lemma, ops.culling)."""
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        scene = (
            rm.sphere(center=(-0.5, 0, 0), radius=0.8)
            | rm.sphere(center=(4.0, 0.3, -2.0), radius=0.5)
            | rm.box(center=(-3.5, -0.2, 1.0), half_extents=(0.4, 0.4, 0.4))
            | rm.sphere(center=(0.9, 0.1, 0.2), radius=0.5)
        )
        spec, arrays = rm.compile_scene(scene, static=True)
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        grads = {}
        for cull in (False, True):
            cfg = dataclasses.replace(CFG, leaf_cull=cull)
            rf = make_fused_render_vjp(spec, cfg, W, H, interpret=True, bm=8)

            def loss(lp, opp):
                a = dataclasses.replace(
                    arrays, leaf_params=lp, op_param=opp
                )
                return jnp.mean((rf(a, cv) - 0.3) ** 2)

            lp = jnp.asarray(arrays.leaf_params)
            opp = jnp.asarray(arrays.op_param)
            grads[cull] = jax.grad(loss, argnums=(0, 1))(lp, opp)
        for a, b in zip(grads[False], grads[True]):
            # Culling may shift march samples within the min_dist tolerance
            # band (same class as the cone prepass), which perturbs hit t by
            # O(min_dist) and grads by the same relative order — structural
            # agreement is what this asserts, not bitwise equality.
            np.testing.assert_allclose(
                # atol covers sample-shift noise on near-zero elements: the
                # packed forward's cull masks live at 64-pixel-row
                # super-tiles (vs bm-row tiles), moving a few cull
                # boundaries and with them O(min_dist) hit-sample shifts.
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-6
            )
        # sanity: the visible sphere actually has gradient signal
        assert np.abs(np.asarray(grads[True][0])).max() > 1e-6


class TestFusedVjpVsAnalyticOracle:
    def test_fused_backward_matches_oracle_grad(self):
        """Chain the PRODUCTION fit backend (make_fused_render_vjp, f32
        Pallas fwd+bwd) directly to the f64 analytic oracle
        (ops.oracle_grad) instead of only to the jnp path: gradients of a
        weighted-pixel loss w.r.t. every leaf/op param word and the camera
        pose must agree at f32-appropriate tolerance on pixels where both
        sides agree on the forward image."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.oracle_grad import pixel_grads
        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80)
        scene = (
            rm.sphere(center=(-0.55, 0.0, 0.1), radius=0.85).union(
                rm.box(center=(0.7, 0.05, -0.1), half_extents=(0.45, 0.5, 0.4)),
                k=0.35,
            )
        ) - rm.torus(
            center=(0.0, 0.75, 0.0), major_radius=0.65, minor_radius=0.22
        )
        cam = rm.Camera.looking_at(
            position=(0.4, 1.5, 4.0), target=(0.0, 0.0, 0.0)
        )
        W, H = 64, 32
        tape = rm.encode_wire(scene)
        spec, arrays = rm.compile_scene(scene, static=True, rebalance=False)
        from test_grad_oracle import _word_map

        wmap = _word_map(tape, spec)

        rv = make_fused_render_vjp(
            spec, cfg, W, H, interpret=True, prepass_block=1
        )
        cam_vec = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def img_of(lp_, opp_, cv_):
            return rv(dc.replace(arrays, leaf_params=lp_, op_param=opp_), cv_)

        img_d = np.asarray(img_of(lp, opp, cam_vec))

        # Oracle forward + per-ray gradients on the device's own rays.
        S = cfg.aa_samples**2
        idx = jnp.arange(W * H * S, dtype=jnp.int32)
        o_dev, d_dev = rm.raygen_flat(
            idx,
            jnp.asarray(cam.position, jnp.float64),
            jnp.asarray(cam.rotation, jnp.float64),
            W,
            H,
            cfg,
        )
        col, dcol, dcam = pixel_grads(
            tape,
            np.asarray(o_dev, np.float64),
            np.asarray(d_dev, np.float64),
            cfg,
            cam_rotation=np.asarray(cam.rotation),
        )
        img_o = col.reshape(H, W, S, 3).mean(2)

        # Weight mask: pixels where the f32 fused forward and the f64
        # oracle agree closely (excludes the cone-prepass / grazing-sample
        # tolerance class from the gradient comparison).
        agree = np.abs(img_d - img_o).max(-1) < 1e-4
        assert agree.mean() > 0.9
        rng = np.random.default_rng(23)
        G = rng.uniform(0.5, 1.5, (H, W, 3)) * agree[:, :, None]

        gl, go, gc = jax.grad(
            lambda lp_, opp_, cv_: jnp.sum(
                img_of(lp_, opp_, cv_) * jnp.asarray(G, jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(lp, opp, cam_vec)
        gl, go, gc = np.asarray(gl), np.asarray(go), np.asarray(gc)

        Wt = len(tape)
        Gray = np.repeat(G[:, :, None, :], S, axis=2).reshape(-1, 3) / S
        oracle_words = np.einsum("nc,ncw->w", Gray, dcol)
        oracle_cam = np.einsum("nc,ncw->w", Gray, dcam)

        dev_words = np.zeros(Wt)
        for w, m in wmap.items():
            if m[0] == "leaf":
                dev_words[w] = gl[m[1], m[2]]
            else:
                dev_words[w] = go[m[1]]

        # Tolerance: the fused kernel runs f32; its ~1e-7-relative
        # rounding passes through the eps=1e-4 tetrahedron taps, putting
        # the genuine noise floor of individual gradient components at the
        # percent level (measured: words spread 0..1.7% rel, median ~0.5%).
        # Bound every word at 3% rel and the median at 1%.
        scale = np.abs(oracle_words).max()
        np.testing.assert_allclose(
            dev_words, oracle_words, rtol=3e-2, atol=1e-3 * scale
        )
        rel = np.abs(dev_words - oracle_words) / (
            np.abs(oracle_words) + 1e-3 * scale
        )
        assert np.median(rel) < 1e-2, rel
        cscale = np.abs(oracle_cam).max()
        np.testing.assert_allclose(
            gc[:7], oracle_cam, rtol=3e-2, atol=1e-3 * cscale
        )


class TestCompactBackward:
    """O(active) backward for pure hard-union compact plans
    (pallas_grad._make_compact_bwd): winner-masked min-fold transpose."""

    def _grads(self, scene, cfg, W=64, H=32, cam=None):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        spec, arrays = rm.compile_scene(scene, static=True)
        cam = cam or rm.Camera.looking_at(
            position=(0.3, 1.8, 5.0), target=(0, 0, 0)
        )
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        rv = make_fused_render_vjp(
            spec, cfg, W, H, interpret=True, prepass_block=1
        )
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def loss(lp_, opp_, cv_):
            a = dc.replace(arrays, leaf_params=lp_, op_param=opp_)
            return jnp.sum(rv(a, cv_) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(lp, opp, cv)
        return rv, tuple(np.asarray(x) for x in g)

    def test_compact_bwd_matches_legacy_unrolled(self):
        import dataclasses as dc

        rng = np.random.default_rng(5)
        parts = [
            rm.sphere(
                center=tuple(rng.uniform(-2, 2, 3) * [1, 0.5, 1]),
                radius=float(rng.uniform(0.3, 0.6)),
            )
            for _ in range(6)
        ]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        rv_c, (gl_c, _go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, _go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd and not rv_l.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )

    def test_compact_bwd_rotated_mixed_types(self):
        # Rotated + every-type unions: the per-row jax.vjp supplies exact
        # partials for all leaf types, quaternions included.
        import dataclasses as dc

        scene = (
            rm.sphere(center=(-1.0, 0.1, 0.0), radius=0.6)
            | rm.box(
                center=(0.9, 0.0, -0.1),
                half_extents=(0.45, 0.35, 0.4),
                rotation=(0.9238795, 0.0, 0.3826834, 0.0),
            )
            | rm.torus(
                center=(0.0, 0.8, 0.1),
                major_radius=0.55,
                minor_radius=0.18,
                rotation=(0.9689124, 0.2474040, 0.0, 0.0),
            )
            | rm.capsule(center=(1.6, 0.4, 0.6), radius=0.22, half_height=0.45)
        )
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        rv_c, (gl_c, _, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, _, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)


class TestCompactBackwardSegmented:
    """Round-5 generalization: the O(active) backward covers seg1 chains,
    multi-segment streams (smooth/subtract folds via in-kernel fold replay +
    reverse sweeps), and winner-routed materials on pool-only plans."""

    _grads = TestCompactBackward._grads

    def test_seg1_mixed_ops_matches_legacy(self):
        # Hard-union bulk + smooth-union/subtract tail: ONE sensitive
        # operand => seg1 chain plan. Blend-radius (op-param) grads must
        # flow through the fold replay.
        import dataclasses as dc

        rng = np.random.default_rng(11)
        parts = [
            rm.sphere(
                center=tuple(rng.uniform(-1.5, 1.5, 3) * [1, 0.5, 1]),
                radius=float(rng.uniform(0.3, 0.6)),
            )
            for _ in range(5)
        ]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        scene = scene.union(
            rm.sphere(center=(0.4, 0.3, 0.5), radius=0.45), k=0.25
        )
        scene = scene - rm.sphere(center=(-0.3, 0.4, 0.6), radius=0.35)
        scene = scene.subtract(
            rm.sphere(center=(0.8, -0.2, 0.4), radius=0.3), k=0.18
        )
        from raymarch_tpu.ops.pallas_march import build_compact_plan

        spec, _ = rm.compile_scene(scene, static=True)
        plan = build_compact_plan(spec)
        assert plan is not None and plan["seg1"] is not None

        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        rv_c, (gl_c, go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd and not rv_l.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        osc = np.abs(go_l).max()
        assert osc > 0  # smooth ks actually carry gradient
        np.testing.assert_allclose(go_c, go_l, rtol=2e-3, atol=2e-3 * osc)
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )

    def test_stream_cluster_matches_legacy(self):
        # >= 2 sensitive operands => multi-segment STREAM plan; the reverse
        # sweep must route each ray's cotangent to its winning segment only.
        import dataclasses as dc

        rng = np.random.default_rng(13)
        clusters = []
        for _ in range(3):
            c = rng.uniform(-1.5, 1.5, 3) * [1, 0.5, 1]
            base = rm.sphere(
                center=tuple(c), radius=float(rng.uniform(0.4, 0.6))
            )
            off = rng.uniform(-0.35, 0.35, 3)
            blob = rm.sphere(
                center=tuple(c + off), radius=float(rng.uniform(0.2, 0.3))
            )
            dent = rm.sphere(
                center=tuple(c - off), radius=float(rng.uniform(0.2, 0.3))
            )
            clusters.append(
                base.union(blob, k=0.2).subtract(dent, k=0.15)
            )
        scene = clusters[0]
        for cl in clusters[1:]:
            scene = scene | cl
        from raymarch_tpu.ops.pallas_march import build_compact_plan

        spec, _ = rm.compile_scene(scene, static=True)
        plan = build_compact_plan(spec)
        assert plan is not None and len(plan["stream"]) == 1

        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        rv_c, (gl_c, go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd and not rv_l.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        osc = np.abs(go_l).max()
        assert osc > 0
        np.testing.assert_allclose(go_c, go_l, rtol=2e-3, atol=2e-3 * osc)
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )

    def test_painted_pool_matches_legacy(self):
        # Painted hard-union scene: winner-routed albedo/flag gradients.
        import dataclasses as dc

        scene = (
            rm.sphere(
                center=(-0.8, 0.1, 0.0), radius=0.7, material=(0.9, 0.2, 0.1)
            )
            | rm.sphere(
                center=(0.7, 0.0, 0.2), radius=0.6, material=(0.1, 0.4, 0.8)
            )
            | rm.box(
                center=(0.0, -0.2, -0.8), half_extents=(0.5, 0.3, 0.4)
            )
        )
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2)
        rv_c, (gl_c, _go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, _go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd and not rv_l.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        # Albedo columns carry real gradient and agree.
        assert np.abs(gl_l[:, 12:15]).max() > 1e-6
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )

    def test_eligibility_reasons(self):
        import dataclasses as dc

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        # materials + smooth segments -> legacy, with a reason
        scene = rm.sphere(
            center=(-0.5, 0, 0), radius=0.7, material=(0.8, 0.2, 0.1)
        ).union(rm.sphere(center=(0.5, 0, 0), radius=0.6), k=0.2)
        scene = scene | rm.sphere(center=(0.0, 1.0, 0.0), radius=0.3)
        spec, _ = rm.compile_scene(scene, static=True)
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True)
        rv = make_fused_render_vjp(spec, cfg, 32, 24, interpret=True, bm=8)
        assert not rv.compact_bwd
        assert "materials" in rv.backward_info["reason"]


class TestCompactBackwardVsAnalyticOracle:
    def test_stream_compact_backward_matches_oracle_grad(self):
        """Chain the GENERALIZED O(active) backward (stream plan: smooth
        clusters hard-unioned) directly to the f64 analytic oracle
        (ops.oracle_grad), same recipe as the legacy-path oracle test:
        weighted-pixel-loss gradients for every tape word + camera pose."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.oracle_grad import pixel_grads
        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        cfg = dc.replace(
            rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80, leaf_cull=True
        )
        rng = np.random.default_rng(29)
        clusters = []
        for _ in range(2):
            c = rng.uniform(-1.2, 1.2, 3) * [1, 0.5, 1]
            base = rm.sphere(center=tuple(c), radius=0.6)
            off = rng.uniform(-0.3, 0.3, 3)
            blob = rm.sphere(center=tuple(c + off), radius=0.3)
            dent = rm.sphere(center=tuple(c - off), radius=0.25)
            clusters.append(base.union(blob, k=0.2).subtract(dent, k=0.15))
        scene = clusters[0] | clusters[1] | rm.sphere(
            center=(0.0, 1.2, -0.5), radius=0.35
        )
        cam = rm.Camera.looking_at(
            position=(0.4, 1.5, 4.0), target=(0.0, 0.0, 0.0)
        )
        W, H = 64, 32
        tape = rm.encode_wire(scene)
        spec, arrays = rm.compile_scene(scene, static=True, rebalance=False)
        from raymarch_tpu.ops.pallas_march import build_compact_plan

        assert build_compact_plan(spec)["stream"], "must exercise a stream"
        from test_grad_oracle import _word_map

        wmap = _word_map(tape, spec)

        rv = make_fused_render_vjp(
            spec, cfg, W, H, interpret=True, prepass_block=1
        )
        assert rv.compact_bwd
        cam_vec = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def img_of(lp_, opp_, cv_):
            return rv(dc.replace(arrays, leaf_params=lp_, op_param=opp_), cv_)

        img_d = np.asarray(img_of(lp, opp, cam_vec))

        S = cfg.aa_samples**2
        idx = jnp.arange(W * H * S, dtype=jnp.int32)
        o_dev, d_dev = rm.raygen_flat(
            idx,
            jnp.asarray(cam.position, jnp.float64),
            jnp.asarray(cam.rotation, jnp.float64),
            W,
            H,
            cfg,
        )
        col, dcol, dcam = pixel_grads(
            tape,
            np.asarray(o_dev, np.float64),
            np.asarray(d_dev, np.float64),
            cfg,
            cam_rotation=np.asarray(cam.rotation),
        )
        img_o = col.reshape(H, W, S, 3).mean(2)
        agree = np.abs(img_d - img_o).max(-1) < 1e-4
        assert agree.mean() > 0.9
        rng2 = np.random.default_rng(31)
        G = rng2.uniform(0.5, 1.5, (H, W, 3)) * agree[:, :, None]

        gl, go, gc = jax.grad(
            lambda lp_, opp_, cv_: jnp.sum(
                img_of(lp_, opp_, cv_) * jnp.asarray(G, jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(lp, opp, cam_vec)
        gl, go, gc = np.asarray(gl), np.asarray(go), np.asarray(gc)

        Wt = len(tape)
        Gray = np.repeat(G[:, :, None, :], S, axis=2).reshape(-1, 3) / S
        oracle_words = np.einsum("nc,ncw->w", Gray, dcol)
        oracle_cam = np.einsum("nc,ncw->w", Gray, dcam)

        dev_words = np.zeros(Wt)
        for w, m in wmap.items():
            if m[0] == "leaf":
                dev_words[w] = gl[m[1], m[2]]
            else:
                dev_words[w] = go[m[1]]

        scale = np.abs(oracle_words).max()
        np.testing.assert_allclose(
            dev_words, oracle_words, rtol=3e-2, atol=1e-3 * scale
        )
        rel = np.abs(dev_words - oracle_words) / (
            np.abs(oracle_words) + 1e-3 * scale
        )
        assert np.median(rel) < 1e-2, rel
        cscale = np.abs(oracle_cam).max()
        np.testing.assert_allclose(
            gc[:7], oracle_cam, rtol=3e-2, atol=1e-3 * cscale
        )


class TestSoftCompactBackward:
    """Round-5: soft-coverage fwd+bwd on the O(active) compact machinery
    (per-leaf soft bound inflation makes culling exact for alpha; the
    backward adds the envelope sweep at the frozen closest approach)."""

    def _grads(self, scene, cfg, W=48, H=32):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        spec, arrays = rm.compile_scene(scene, static=True)
        cam = rm.Camera.looking_at(position=(0.3, 1.8, 5.0), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        rv = make_fused_render_vjp(spec, cfg, W, H, interpret=True, soft=True)
        lp = jnp.asarray(arrays.leaf_params)
        opp = jnp.asarray(arrays.op_param)

        def loss(lp_, opp_, cv_):
            a = dc.replace(arrays, leaf_params=lp_, op_param=opp_)
            return jnp.sum(rv(a, cv_) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(lp, opp, cv)
        return rv, tuple(np.asarray(x) for x in g)

    def test_soft_compact_matches_soft_legacy(self):
        import dataclasses as dc

        rng = np.random.default_rng(7)
        parts = [
            rm.sphere(
                center=tuple(rng.uniform(-1.5, 1.5, 3) * [1, 0.5, 1]),
                radius=float(rng.uniform(0.3, 0.55)),
            )
            for _ in range(6)
        ]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        cfg = dc.replace(
            rm.DEFAULT_CONFIG, aa_samples=2, coverage_beta=0.02
        )
        rv_c, (gl_c, _go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, _go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd and rv_c.backward_info["soft"]
        assert not rv_l.compact_bwd
        scale = np.abs(gl_l).max()
        assert scale > 0
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )

    def test_soft_compact_stream_scene(self):
        # Smooth clusters in soft mode: ordered folds + envelope together.
        import dataclasses as dc

        rng = np.random.default_rng(9)
        cl = []
        for _ in range(2):
            c = rng.uniform(-1.2, 1.2, 3) * [1, 0.5, 1]
            base = rm.sphere(center=tuple(c), radius=0.55)
            off = rng.uniform(-0.3, 0.3, 3)
            cl.append(
                base.union(
                    rm.sphere(center=tuple(c + off), radius=0.28), k=0.2
                ).subtract(
                    rm.sphere(center=tuple(c - off), radius=0.22), k=0.15
                )
            )
        scene = cl[0] | cl[1] | rm.sphere(center=(0, 1.1, -0.4), radius=0.3)
        cfg = dc.replace(
            rm.DEFAULT_CONFIG, aa_samples=2, coverage_beta=0.02
        )
        rv_c, (gl_c, go_c, gc_c) = self._grads(
            scene, dc.replace(cfg, leaf_cull=True)
        )
        rv_l, (gl_l, go_l, gc_l) = self._grads(scene, cfg)
        assert rv_c.compact_bwd
        scale = np.abs(gl_l).max()
        np.testing.assert_allclose(gl_c, gl_l, rtol=2e-3, atol=2e-3 * scale)
        osc = np.abs(go_l).max()
        assert osc > 0
        np.testing.assert_allclose(go_c, go_l, rtol=2e-3, atol=2e-3 * osc)
        cs = np.abs(gc_l).max()
        np.testing.assert_allclose(
            gc_c[:7], gc_l[:7], rtol=2e-3, atol=2e-3 * cs
        )


@pytest.mark.parametrize("seed", [71, 72])
def test_random_mixed_scene_backward_fuzz(seed):
    """Randomized backward fuzz: a random hard/smooth mix that lands on the
    compact backward must match the legacy unrolled backward's gradients."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

    rng = np.random.default_rng(seed)
    parts = [
        rm.sphere(
            center=tuple(rng.uniform(-1.5, 1.5, 3) * [1, 0.5, 1]),
            radius=float(rng.uniform(0.25, 0.5)),
        )
        for _ in range(5)
    ]
    scene = parts[0]
    for p in parts[1:]:
        scene = scene | p
    for _ in range(int(rng.integers(2, 5))):
        c = tuple(rng.uniform(-1.2, 1.2, 3) * [1, 0.5, 1])
        p = rm.sphere(center=c, radius=float(rng.uniform(0.2, 0.4)))
        if rng.integers(0, 2):
            scene = scene.union(p, k=float(rng.uniform(0.1, 0.25)))
        else:
            scene = scene.subtract(p, k=float(rng.uniform(0.1, 0.2)))
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.3, 1.8, 5.0), target=(0, 0, 0))
    cv = jnp.asarray(
        np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
    )
    grads = {}
    for cull in (True, False):
        cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=cull)
        rv = make_fused_render_vjp(
            spec, cfg, 48, 32, interpret=True, prepass_block=1
        )
        if cull:
            assert rv.compact_bwd, rv.backward_info

        def loss(lp, opp, c, rv=rv):
            a = dc.replace(arrays, leaf_params=lp, op_param=opp)
            return jnp.sum(rv(a, c) ** 2)

        grads[cull] = tuple(
            np.asarray(x)
            for x in jax.grad(loss, argnums=(0, 1, 2))(
                jnp.asarray(arrays.leaf_params),
                jnp.asarray(arrays.op_param),
                cv,
            )
        )
    for a, b in zip(grads[True], grads[False]):
        s = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * max(s, 1e-9))

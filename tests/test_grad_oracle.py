"""Analytic-oracle gradient validation at BASELINE's literal bar:

    pixel-gradients allclose, rtol 1e-4, device AD vs the CPU oracle.

The oracle side (ops.oracle_grad) computes exact closed-form gradients of
the float64 reference renderer; the device side is the jnp differentiable
renderer (ops.march, implicit-function VJP) run in float64 on CPU. The two
share no code — agreement at rtol 1e-4 means the implicit-VJP machinery,
the shading-chain transpose, and the parameter plumbing are all correct to
numerical precision, not just to finite-difference tolerance (the old
tests/test_grad.py bounds were 5-20% masked FD)."""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.ops import opcodes as oc
from raymarch_tpu.ops.oracle_grad import eval_tape_grads, pixel_grads

CFG = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80)

SCENE = (
    rm.sphere(center=(-0.55, 0.0, 0.1), radius=0.85).union(
        rm.box(center=(0.7, 0.05, -0.1), half_extents=(0.45, 0.5, 0.4)),
        k=0.35,
    )
) - rm.torus(center=(0.0, 0.75, 0.0), major_radius=0.65, minor_radius=0.22)

CAM = rm.Camera.looking_at(position=(0.4, 1.5, 4.0), target=(0.0, 0.0, 0.0))


def _word_map(tape, spec):
    """Map wire-tape word index -> ('leaf', row, col) | ('op', instr_idx).

    Mirrors ops.tape._decode_wire's row assignment (leaves sorted stably by
    (type, ordinal)) for the UNREBALANCED lowering, generically for every
    primitive opcode (rotated variants map their quat words to leaf-param
    cols 0..3)."""
    from raymarch_tpu.ops.tape import _WIRE_PRIM_TO_LEAF

    _SHAPE_COLS = {
        oc.OP_SPHERE: [7],
        oc.OP_BOX: [7, 8, 9],
        oc.OP_BOX_ROT: [7, 8, 9],
        oc.OP_PLANE: [7, 8, 9, 10],
        oc.OP_TORUS: [7, 8],
        oc.OP_TORUS_ROT: [7, 8],
        oc.OP_CYLINDER: [7, 8],
        oc.OP_CYLINDER_ROT: [7, 8],
        oc.OP_CAPSULE: [7, 8],
        oc.OP_CAPSULE_ROT: [7, 8],
        oc.OP_CONE: [7, 8, 9],
        oc.OP_CONE_ROT: [7, 8, 9],
    }
    _ROT_OPS = {
        oc.OP_BOX_ROT, oc.OP_TORUS_ROT, oc.OP_CYLINDER_ROT,
        oc.OP_CAPSULE_ROT, oc.OP_CONE_ROT,
    }
    tape = np.asarray(tape, np.uint32)
    types = []  # leaf ordinal -> leaf type, in wire order
    entries = []  # (word_index, 'leaf', ordinal, col) | (word, 'op', instr)
    i = 0
    instr = 0
    while i < len(tape):
        op = int(tape[i])
        i += 1
        npar = oc.WIRE_PARAM_COUNT[op]
        pw = list(range(i, i + npar))
        i += npar
        if op in oc.PRIMITIVE_OPS:
            ordinal = len(types)
            types.append(_WIRE_PRIM_TO_LEAF[op])
            cols = []
            if op in _ROT_OPS:
                cols += [0, 1, 2, 3]
            if op != oc.OP_PLANE:
                cols += [4, 5, 6]
            cols += _SHAPE_COLS[op]
            for w, c in zip(pw, cols):
                entries.append((w, "leaf", ordinal, c))
            instr += 1  # the PUSH
        elif op == oc.OP_MATERIAL:
            for w, c in zip(pw, [oc.LEAF_ALBEDO + j for j in range(3)]):
                entries.append((w, "leaf", len(types) - 1, c))
        else:
            if npar:  # smooth k / round / onion param
                entries.append((pw[0], "op", instr, None))
            instr += 1
    # ordinal -> packed row (stable sort by (type, ordinal), then sequential
    # within each type bank; mirrors compile_wire).
    order = sorted(range(len(types)), key=lambda j: (types[j], j))
    starts = {t: s for t, s, _ in spec.type_slices}
    row_of = {}
    cursor = dict(starts)
    for j in order:
        row_of[j] = cursor[types[j]]
        cursor[types[j]] += 1
    out = {}
    for w, kind, a, b in entries:
        out[w] = ("leaf", row_of[a], b) if kind == "leaf" else ("op", a)
    return out


def _param_words(tape):
    """Word indices of every numeric parameter in a wire tape."""
    tape = np.asarray(tape, np.uint32)
    out = []
    i = 0
    while i < len(tape):
        op = int(tape[i])
        i += 1
        npar = oc.WIRE_PARAM_COUNT[op]
        out += list(range(i, i + npar))
        i += npar
    return out


@pytest.fixture(scope="module")
def x64():
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


class TestEvalTapeGrads:
    def test_matches_oracle_forward(self):
        tape = rm.encode_wire(SCENE)
        rng = np.random.default_rng(3)
        pts = rng.uniform(-2, 2, (256, 3))
        d, _, _ = eval_tape_grads(tape, pts, CFG)
        d_ref = rm.oracle.eval_tape(tape, pts.astype(np.float32), CFG)
        np.testing.assert_allclose(d, d_ref, rtol=2e-5, atol=2e-5)

    def test_spatial_gradient_unit_norm_on_hard_scene(self):
        # Away from blend regions an SDF gradient has unit norm.
        scene = rm.sphere(radius=1.0) | rm.box(
            center=(3, 0, 0), half_extents=(1, 1, 1)
        )
        tape = rm.encode_wire(scene)
        rng = np.random.default_rng(4)
        pts = rng.uniform(-2, 2, (128, 3)) + np.array([0.0, 0.0, 2.5])
        _, dp, _ = eval_tape_grads(tape, pts, CFG)
        np.testing.assert_allclose(
            np.linalg.norm(dp, axis=1), 1.0, rtol=1e-10
        )

    def test_param_gradient_vs_f64_central_difference(self):
        # Sanity-anchor the closed forms against high-order FD in f64 (the
        # oracle itself must be right before it can judge the device).
        tape = rm.encode_wire(SCENE).copy()
        rng = np.random.default_rng(5)
        pts = rng.uniform(-1.5, 1.5, (64, 3))
        d0, _, dw = eval_tape_grads(tape, pts, CFG)
        f32 = tape.view(np.float32)
        # Param words of SCENE's tape: sphere center x (1), sphere radius
        # (4), box half-extent x (9), smooth-union k (13), torus center y
        # (16).
        for w in [1, 4, 9, 13, 16]:
            eps = 1e-4
            t_hi = tape.copy()
            t_hi.view(np.float32)[w] = f32[w] + eps
            t_lo = tape.copy()
            t_lo.view(np.float32)[w] = f32[w] - eps
            hi, _, _ = eval_tape_grads(t_hi, pts, CFG)
            lo, _, _ = eval_tape_grads(t_lo, pts, CFG)
            fd = (hi - lo) / (
                float(t_hi.view(np.float32)[w]) - float(t_lo.view(np.float32)[w])
            )
            np.testing.assert_allclose(dw[:, w], fd, rtol=5e-4, atol=5e-4)


class TestPixelGradRtol1em4:
    def test_grad_oracle_analytic_rtol1e4(self, x64):
        """Device AD pixel gradients vs analytic oracle, elementwise rtol
        1e-4, on pixels where both sides agree on the discrete structure
        (hit masks; disagreement is measure-zero threshold ties)."""
        import jax
        import jax.numpy as jnp

        W = H = 32
        tape = rm.encode_wire(SCENE)
        spec, arrays = rm.compile_scene(SCENE, rebalance=False)
        wmap = _word_map(tape, spec)

        # Shared rays: the device raygen's own output, fed to both sides.
        idx = jnp.arange(W * H * CFG.aa_samples**2, dtype=jnp.int32)
        o_dev, d_dev = rm.raygen_flat(
            idx,
            jnp.asarray(CAM.position, jnp.float64),
            jnp.asarray(CAM.rotation, jnp.float64),
            W,
            H,
            CFG,
        )
        o_np = np.asarray(o_dev, np.float64)
        d_np = np.asarray(d_dev, np.float64)

        # Oracle: exact per-ray gradients -> per-pixel AA means.
        S = CFG.aa_samples**2
        col, dcol = pixel_grads(tape, o_np, d_np, CFG)
        Wt = len(tape)
        img_o = col.reshape(H, W, S, 3).mean(2)
        dimg_o = dcol.reshape(H, W, S, 3, Wt).mean(2)
        hit_o = _march_hits(tape, o_np, d_np)

        # Device: f64 render + vjp with single-pixel cotangents.
        lp64 = jnp.asarray(arrays.leaf_params, jnp.float64)
        opp64 = jnp.asarray(arrays.op_param, jnp.float64)

        from raymarch_tpu.ops import march as march_mod

        def render(lp, opp):
            import dataclasses as dc

            a = dc.replace(arrays, leaf_params=lp, op_param=opp)
            colors = march_mod.render_rays(
                spec, a, o_dev, d_dev, CFG, mode="implicit"
            )
            return colors.reshape(H, W, S, 3).mean(2)

        img_d, vjp = jax.vjp(render, lp64, opp64)
        img_d_np = np.asarray(img_d)
        np.testing.assert_allclose(img_d_np, img_o, rtol=1e-4, atol=1e-6)

        # Device hit mask per sample (forward march, f64).
        march = march_mod.make_march(spec, CFG, "forward")
        _, hit_d, _ = march(o_dev, d_dev, arrays_f64(arrays))
        agree = (
            (np.asarray(hit_d) > 0.5).reshape(H, W, S)
            == hit_o.reshape(H, W, S)
        ).all(axis=2)
        assert agree.mean() > 0.99

        # Pixels to check: spread across hit / miss / silhouette regions.
        hit_px = hit_o.reshape(H, W, S).any(2) & agree
        ys, xs = np.nonzero(hit_px)
        sel = list(zip(ys[:: max(1, len(ys) // 12)], xs[:: max(1, len(ys) // 12)]))
        ys2, xs2 = np.nonzero(~hit_px & agree)
        sel += list(
            zip(ys2[:: max(1, len(ys2) // 6)], xs2[:: max(1, len(ys2) // 6)])
        )
        checked = 0
        for (py, px) in sel[:20]:
            for ch in range(3):
                g = np.zeros((H, W, 3))
                g[py, px, ch] = 1.0
                dlp, dopp = vjp(jnp.asarray(g))
                dev = np.zeros(Wt)
                orc = np.zeros(Wt)
                for w, m in wmap.items():
                    if m[0] == "leaf":
                        dev[w] = float(np.asarray(dlp)[m[1], m[2]])
                    else:
                        dev[w] = float(np.asarray(dopp)[m[1]])
                    orc[w] = dimg_o[py, px, ch, w]
                np.testing.assert_allclose(
                    dev, orc, rtol=1e-4, atol=1e-9,
                    err_msg=f"pixel ({py},{px}) ch {ch}",
                )
                checked += 1
        assert checked >= 30


def _march_hits(tape, o, d):
    from raymarch_tpu.ops.oracle_grad import _march_f64

    _, hit = _march_f64(tape, o, d, CFG)
    return hit


def arrays_f64(arrays):
    import dataclasses as dc

    import jax.numpy as jnp

    return dc.replace(
        arrays,
        leaf_params=jnp.asarray(arrays.leaf_params, jnp.float64),
        op_param=jnp.asarray(arrays.op_param, jnp.float64),
    )


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return tuple(
        np.concatenate(
            [[np.cos(angle / 2)], np.sin(angle / 2) * axis]
        ).tolist()
    )


# Every primitive type, every rotated variant, hard + smooth ops, round:
# the full opcode/parameter space the analytic oracle must cover.
SCENE_EXT = (
    (
        rm.sphere(center=(-1.1, 0.1, 0.2), radius=0.55)
        | rm.box(
            center=(0.9, 0.0, -0.1),
            half_extents=(0.45, 0.35, 0.4),
            rotation=_axis_angle_quat((0.3, 1.0, 0.2), 0.7),
        )
        | rm.torus(
            center=(0.0, 0.85, 0.1),
            major_radius=0.55,
            minor_radius=0.18,
            rotation=_axis_angle_quat((1.0, 0.1, 0.0), 0.5),
        )
        | rm.cylinder(
            center=(-0.2, -0.2, 0.9),
            radius=0.3,
            half_height=0.5,
            rotation=_axis_angle_quat((0.2, 0.3, 1.0), 0.9),
        )
    ).union(
        rm.capsule(
            center=(1.6, 0.4, 0.6),
            radius=0.22,
            half_height=0.45,
            rotation=_axis_angle_quat((1.0, 0.4, 0.3), 1.1),
        ),
        k=0.25,
    )
    - rm.cone(
        center=(0.2, 0.1, 0.4),
        half_height=0.45,
        r_bottom=0.4,
        r_top=0.15,
        rotation=_axis_angle_quat((0.5, 1.0, 0.1), 0.6),
    )
)

CAM_EXT = rm.Camera.looking_at(position=(0.5, 1.8, 4.2), target=(0.0, 0.1, 0.2))


class TestEvalTapeGradsExtended:
    def test_matches_oracle_forward_ext(self):
        tape = rm.encode_wire(SCENE_EXT)
        rng = np.random.default_rng(9)
        pts = rng.uniform(-2, 2, (256, 3))
        d, _, _ = eval_tape_grads(tape, pts, CFG)
        d_ref = rm.oracle.eval_tape(tape, pts.astype(np.float32), CFG)
        np.testing.assert_allclose(d, d_ref, rtol=3e-5, atol=3e-5)

    def test_every_param_word_vs_f64_central_difference(self):
        # Anchor EVERY closed-form partial (rotated quats, cylinder/capsule/
        # cone shape params, centers, smooth k) against high-order f64 FD.
        tape = rm.encode_wire(SCENE_EXT).copy()
        rng = np.random.default_rng(11)
        pts = rng.uniform(-1.8, 1.8, (96, 3))
        _, _, dw = eval_tape_grads(tape, pts, CFG)
        f32 = tape.view(np.float32)
        words = _param_words(tape)
        assert len(words) > 50
        for w in words:
            eps = 1e-4 * max(1.0, abs(float(f32[w])))
            t_hi = tape.copy()
            t_hi.view(np.float32)[w] = f32[w] + eps
            t_lo = tape.copy()
            t_lo.view(np.float32)[w] = f32[w] - eps
            hi, _, _ = eval_tape_grads(t_hi, pts, CFG)
            lo, _, _ = eval_tape_grads(t_lo, pts, CFG)
            step = float(t_hi.view(np.float32)[w]) - float(
                t_lo.view(np.float32)[w]
            )
            fd = (hi - lo) / step
            # Exclude points that straddle a branch boundary for this word
            # (winner flip between hi/lo evals makes FD meaningless there).
            err = np.abs(dw[:, w] - fd)
            tol = 5e-4 * np.maximum(1.0, np.abs(fd))
            frac_bad = (err > tol).mean()
            assert frac_bad < 0.06, (w, frac_bad, err.max())

    def test_spatial_gradient_unit_norm_rotated(self):
        # Rotated primitives: outside the smooth-blend bands the spatial
        # gradient must be unit-norm (rotation preserves it).
        scene = rm.box(
            half_extents=(0.5, 0.4, 0.3),
            rotation=_axis_angle_quat((0.3, 1.0, 0.2), 0.7),
        ) | rm.cone(
            center=(3.0, 0.0, 0.0),
            half_height=0.5,
            r_bottom=0.4,
            r_top=0.1,
            rotation=_axis_angle_quat((1.0, 0.2, 0.1), 0.8),
        )
        tape = rm.encode_wire(scene)
        rng = np.random.default_rng(12)
        pts = rng.uniform(-1.5, 1.5, (128, 3)) + np.array([0.0, 0.0, 2.0])
        _, dp, _ = eval_tape_grads(tape, pts, CFG)
        # rtol 1e-6: the f32-stored quaternions are unit only to f32
        # precision, and a non-unit quat scales the rotated gradient.
        np.testing.assert_allclose(np.linalg.norm(dp, axis=1), 1.0, rtol=1e-6)


class TestPixelGradExtendedRtol1em4:
    def test_grad_oracle_ext_rtol1e4(self, x64):
        """Device AD pixel gradients vs analytic oracle at rtol 1e-4 on the
        everything-rotated scene: every primitive type rotated, smooth
        union, hard subtraction — replaces the 5-20% FD bounds as the
        binding validation for this parameter space."""
        import jax
        import jax.numpy as jnp

        W = H = 24
        tape = rm.encode_wire(SCENE_EXT)
        spec, arrays = rm.compile_scene(SCENE_EXT, rebalance=False)
        wmap = _word_map(tape, spec)

        idx = jnp.arange(W * H * CFG.aa_samples**2, dtype=jnp.int32)
        o_dev, d_dev = rm.raygen_flat(
            idx,
            jnp.asarray(CAM_EXT.position, jnp.float64),
            jnp.asarray(CAM_EXT.rotation, jnp.float64),
            W,
            H,
            CFG,
        )
        o_np = np.asarray(o_dev, np.float64)
        d_np = np.asarray(d_dev, np.float64)

        S = CFG.aa_samples**2
        col, dcol = pixel_grads(tape, o_np, d_np, CFG)
        Wt = len(tape)
        img_o = col.reshape(H, W, S, 3).mean(2)
        dimg_o = dcol.reshape(H, W, S, 3, Wt).mean(2)
        hit_o = _march_hits(tape, o_np, d_np)

        lp64 = jnp.asarray(arrays.leaf_params, jnp.float64)
        opp64 = jnp.asarray(arrays.op_param, jnp.float64)

        from raymarch_tpu.ops import march as march_mod

        def render(lp, opp):
            import dataclasses as dc

            a = dc.replace(arrays, leaf_params=lp, op_param=opp)
            colors = march_mod.render_rays(
                spec, a, o_dev, d_dev, CFG, mode="implicit"
            )
            return colors.reshape(H, W, S, 3).mean(2)

        img_d, vjp = jax.vjp(render, lp64, opp64)
        np.testing.assert_allclose(np.asarray(img_d), img_o, rtol=1e-4, atol=1e-6)

        march = march_mod.make_march(spec, CFG, "forward")
        _, hit_d, _ = march(o_dev, d_dev, arrays_f64(arrays))
        agree = (
            (np.asarray(hit_d) > 0.5).reshape(H, W, S)
            == hit_o.reshape(H, W, S)
        ).all(axis=2)
        assert agree.mean() > 0.98

        hit_px = hit_o.reshape(H, W, S).any(2) & agree
        ys, xs = np.nonzero(hit_px)
        sel = list(zip(ys[:: max(1, len(ys) // 12)], xs[:: max(1, len(ys) // 12)]))
        checked = 0
        for (py, px) in sel[:14]:
            for ch in range(3):
                g = np.zeros((H, W, 3))
                g[py, px, ch] = 1.0
                dlp, dopp = vjp(jnp.asarray(g))
                dev = np.zeros(Wt)
                orc = np.zeros(Wt)
                for w, m in wmap.items():
                    if m[0] == "leaf":
                        dev[w] = float(np.asarray(dlp)[m[1], m[2]])
                    else:
                        dev[w] = float(np.asarray(dopp)[m[1]])
                    orc[w] = dimg_o[py, px, ch, w]
                np.testing.assert_allclose(
                    dev, orc, rtol=1e-4, atol=1e-9,
                    err_msg=f"pixel ({py},{px}) ch {ch}",
                )
                checked += 1
        assert checked >= 30


class TestCameraPoseGradRtol1em4:
    def test_camera_pose_grads_rtol1e4(self, x64):
        """d(pixel)/d(camera position + raw quaternion) through raygen:
        device AD vs the analytic oracle's camera chain at rtol 1e-4."""
        import jax
        import jax.numpy as jnp

        W = H = 24
        tape = rm.encode_wire(SCENE)
        spec, arrays = rm.compile_scene(SCENE, rebalance=False)
        S = CFG.aa_samples**2
        idx = jnp.arange(W * H * S, dtype=jnp.int32)
        pos64 = jnp.asarray(CAM.position, jnp.float64)
        quat64 = jnp.asarray(CAM.rotation, jnp.float64)

        from raymarch_tpu.ops import march as march_mod

        a64 = arrays_f64(arrays)

        def render(campos, camquat):
            o, d = rm.raygen_flat(idx, campos, camquat, W, H, CFG)
            colors = march_mod.render_rays(
                spec, a64, o, d, CFG, mode="implicit"
            )
            return colors.reshape(H, W, S, 3).mean(2)

        img_d, vjp = jax.vjp(render, pos64, quat64)

        o_dev, d_dev = rm.raygen_flat(idx, pos64, quat64, W, H, CFG)
        o_np = np.asarray(o_dev, np.float64)
        d_np = np.asarray(d_dev, np.float64)
        col, _dcol, dcam = pixel_grads(
            tape, o_np, d_np, CFG, cam_rotation=np.asarray(CAM.rotation)
        )
        img_o = col.reshape(H, W, S, 3).mean(2)
        dcam_px = dcam.reshape(H, W, S, 3, 7).mean(2)
        np.testing.assert_allclose(np.asarray(img_d), img_o, rtol=1e-4, atol=1e-6)

        hit_o = _march_hits(tape, o_np, d_np)
        march = march_mod.make_march(spec, CFG, "forward")
        _, hit_d, _ = march(o_dev, d_dev, a64)
        agree = (
            (np.asarray(hit_d) > 0.5).reshape(H, W, S)
            == hit_o.reshape(H, W, S)
        ).all(axis=2)
        hit_px = hit_o.reshape(H, W, S).any(2) & agree
        ys, xs = np.nonzero(hit_px)
        sel = list(zip(ys[:: max(1, len(ys) // 10)], xs[:: max(1, len(ys) // 10)]))
        checked = 0
        for (py, px) in sel[:10]:
            for ch in range(3):
                g = np.zeros((H, W, 3))
                g[py, px, ch] = 1.0
                dpos, dquat = vjp(jnp.asarray(g))
                dev = np.concatenate([np.asarray(dpos), np.asarray(dquat)])
                orc = dcam_px[py, px, ch]
                np.testing.assert_allclose(
                    dev, orc, rtol=1e-4, atol=1e-9,
                    err_msg=f"pixel ({py},{px}) ch {ch}",
                )
                checked += 1
        assert checked >= 24


class TestCameraPoseGradNonUnitQuat:
    def test_camera_pose_grads_off_unit_sphere(self, x64):
        """Same camera chain with |q| != 1: the device raygen rotates by the
        RAW quaternion, and fit_camera-style optimization drifts q off the
        unit sphere between projections. The oracle's view-dir recovery is
        now an explicit 3x3 solve of the raw rotation (the conjugate trick
        was exact only at |q| = 1 — round-4 advisor finding)."""
        import jax
        import jax.numpy as jnp

        W = H = 16
        tape = rm.encode_wire(SCENE)
        spec, arrays = rm.compile_scene(SCENE, rebalance=False)
        S = CFG.aa_samples**2
        idx = jnp.arange(W * H * S, dtype=jnp.int32)
        pos64 = jnp.asarray(CAM.position, jnp.float64)
        quat_raw = np.asarray(CAM.rotation, np.float64) * 1.08
        quat64 = jnp.asarray(quat_raw, jnp.float64)

        from raymarch_tpu.ops import march as march_mod

        a64 = arrays_f64(arrays)

        def render(campos, camquat):
            o, d = rm.raygen_flat(idx, campos, camquat, W, H, CFG)
            colors = march_mod.render_rays(
                spec, a64, o, d, CFG, mode="implicit"
            )
            return colors.reshape(H, W, S, 3).mean(2)

        img_d, vjp = jax.vjp(render, pos64, quat64)
        o_dev, d_dev = rm.raygen_flat(idx, pos64, quat64, W, H, CFG)
        o_np = np.asarray(o_dev, np.float64)
        d_np = np.asarray(d_dev, np.float64)
        col, _dcol, dcam = pixel_grads(
            tape, o_np, d_np, CFG, cam_rotation=quat_raw
        )
        img_o = col.reshape(H, W, S, 3).mean(2)
        dcam_px = dcam.reshape(H, W, S, 3, 7).mean(2)
        np.testing.assert_allclose(np.asarray(img_d), img_o, rtol=1e-4, atol=1e-6)

        hit_o = _march_hits(tape, o_np, d_np)
        march = march_mod.make_march(spec, CFG, "forward")
        _, hit_d, _ = march(o_dev, d_dev, a64)
        agree = (
            (np.asarray(hit_d) > 0.5).reshape(H, W, S)
            == hit_o.reshape(H, W, S)
        ).all(axis=2)
        hit_px = hit_o.reshape(H, W, S).any(2) & agree
        ys, xs = np.nonzero(hit_px)
        sel = list(zip(ys[:: max(1, len(ys) // 6)], xs[:: max(1, len(ys) // 6)]))
        checked = 0
        for (py, px) in sel[:6]:
            g = np.zeros((H, W, 3))
            g[py, px, 1] = 1.0
            dpos, dquat = vjp(jnp.asarray(g))
            dev = np.concatenate([np.asarray(dpos), np.asarray(dquat)])
            orc = dcam_px[py, px, 1]
            np.testing.assert_allclose(
                dev, orc, rtol=1e-4, atol=1e-9,
                err_msg=f"pixel ({py},{px})",
            )
            checked += 1
        assert checked >= 4


SCENE_MAT = (
    rm.sphere(center=(-0.55, 0.0, 0.1), radius=0.85, material=(0.8, 0.2, 0.1))
    .union(
        rm.box(
            center=(0.7, 0.05, -0.1),
            half_extents=(0.45, 0.5, 0.4),
            material=(0.1, 0.3, 0.9),
        ),
        k=0.35,
    )
    | rm.torus(center=(0.0, 0.85, 0.0), major_radius=0.6, minor_radius=0.2)
)


class TestMaterialGradRtol1em4:
    def test_albedo_color_grads_vs_fd(self):
        # Anchor eval_tape_color_grads against f64 central differences for
        # every param word (geometry words move blend weights; albedo words
        # move colors directly).
        tape = rm.encode_wire(SCENE_MAT).copy()
        rng = np.random.default_rng(17)
        pts = rng.uniform(-1.5, 1.5, (64, 3))
        from raymarch_tpu.ops.oracle_grad import eval_tape_color_grads

        _, _, drw = eval_tape_color_grads(tape, pts, CFG)
        f32 = tape.view(np.float32)
        for w in _param_words(tape):
            eps = 1e-4 * max(1.0, abs(float(f32[w])))
            t_hi = tape.copy()
            t_hi.view(np.float32)[w] = f32[w] + eps
            t_lo = tape.copy()
            t_lo.view(np.float32)[w] = f32[w] - eps
            hi, _, _ = eval_tape_color_grads(t_hi, pts, CFG)
            lo, _, _ = eval_tape_color_grads(t_lo, pts, CFG)
            step = float(t_hi.view(np.float32)[w]) - float(
                t_lo.view(np.float32)[w]
            )
            fd = (hi - lo) / step
            err = np.abs(drw[:, :, w] - fd)
            tol = 5e-4 * np.maximum(1.0, np.abs(fd))
            assert (err > tol).mean() < 0.06, (w, err.max())

    def test_material_pixel_grads_rtol1e4(self, x64):
        """Painted-material scene: device AD pixel gradients (incl. albedo
        words and the geometry->blend-weight chain) vs the analytic oracle
        at rtol 1e-4."""
        import jax
        import jax.numpy as jnp

        W = H = 24
        tape = rm.encode_wire(SCENE_MAT)
        # static=True: the unrolled color path (the dynamic fori_loop color
        # interpreter trips an XLA abort when toggled into x64 after f32
        # runs in the same process; lowering order is identical with
        # rebalance=False, so the word map is unchanged)
        spec, arrays = rm.compile_scene(SCENE_MAT, rebalance=False, static=True)
        assert spec.has_materials
        wmap = _word_map(tape, spec)
        S = CFG.aa_samples**2
        idx = jnp.arange(W * H * S, dtype=jnp.int32)
        o_dev, d_dev = rm.raygen_flat(
            idx,
            jnp.asarray(CAM.position, jnp.float64),
            jnp.asarray(CAM.rotation, jnp.float64),
            W,
            H,
            CFG,
        )
        o_np = np.asarray(o_dev, np.float64)
        d_np = np.asarray(d_dev, np.float64)
        col, dcol = pixel_grads(tape, o_np, d_np, CFG)
        Wt = len(tape)
        img_o = col.reshape(H, W, S, 3).mean(2)
        dimg_o = dcol.reshape(H, W, S, 3, Wt).mean(2)
        hit_o = _march_hits(tape, o_np, d_np)

        lp64 = jnp.asarray(arrays.leaf_params, jnp.float64)
        opp64 = jnp.asarray(arrays.op_param, jnp.float64)
        from raymarch_tpu.ops import march as march_mod

        def render(lp, opp):
            import dataclasses as dc

            a = dc.replace(arrays, leaf_params=lp, op_param=opp)
            colors = march_mod.render_rays(
                spec, a, o_dev, d_dev, CFG, mode="implicit"
            )
            return colors.reshape(H, W, S, 3).mean(2)

        img_d, vjp = jax.vjp(render, lp64, opp64)
        np.testing.assert_allclose(np.asarray(img_d), img_o, rtol=1e-4, atol=1e-6)

        march = march_mod.make_march(spec, CFG, "forward")
        _, hit_d, _ = march(o_dev, d_dev, arrays_f64(arrays))
        agree = (
            (np.asarray(hit_d) > 0.5).reshape(H, W, S)
            == hit_o.reshape(H, W, S)
        ).all(axis=2)
        hit_px = hit_o.reshape(H, W, S).any(2) & agree
        ys, xs = np.nonzero(hit_px)
        sel = list(zip(ys[:: max(1, len(ys) // 10)], xs[:: max(1, len(ys) // 10)]))
        checked = 0
        for (py, px) in sel[:10]:
            for ch in range(3):
                g = np.zeros((H, W, 3))
                g[py, px, ch] = 1.0
                dlp, dopp = vjp(jnp.asarray(g))
                dev = np.zeros(Wt)
                orc = np.zeros(Wt)
                for w, m in wmap.items():
                    if m[0] == "leaf":
                        dev[w] = float(np.asarray(dlp)[m[1], m[2]])
                    else:
                        dev[w] = float(np.asarray(dopp)[m[1]])
                    orc[w] = dimg_o[py, px, ch, w]
                np.testing.assert_allclose(
                    dev, orc, rtol=1e-4, atol=1e-9,
                    err_msg=f"pixel ({py},{px}) ch {ch}",
                )
                checked += 1
        assert checked >= 24

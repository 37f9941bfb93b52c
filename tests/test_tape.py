"""Tape encoder tests: golden wire sequences (reference ABI), transform
folding, device-program lowering invariants, bucketing stability."""

import numpy as np
import pytest

from raymarch_tpu import csg, compile_scene, compile_wire, encode_wire
from raymarch_tpu.models.csg import box, plane, sphere, torus
from raymarch_tpu.ops import opcodes as oc
from raymarch_tpu.ops.tape import wire_cmd_count


def bits(x):
    return np.float32(x).view(np.uint32)


class TestWireGolden:
    """Exact u32 sequences for known trees, mirroring the reference builder's
    output (reference src/ray_marching/csg/builder.rs:41-61; emission order
    per sphere.rs:16-21, box.rs:15-20, operations/mod.rs:13-17)."""

    def test_sphere(self):
        tape = encode_wire(sphere(center=(1.0, 2.0, 3.0), radius=0.5))
        expected = np.array(
            [0, bits(1.0), bits(2.0), bits(3.0), bits(0.5)], dtype=np.uint32
        )
        np.testing.assert_array_equal(tape, expected)

    def test_box(self):
        tape = encode_wire(box(center=(0.0, -1.0, 0.0), half_extents=(1.0, 2.0, 3.0)))
        expected = np.array(
            [1, bits(0.0), bits(-1.0), bits(0.0), bits(1.0), bits(2.0), bits(3.0)],
            dtype=np.uint32,
        )
        np.testing.assert_array_equal(tape, expected)

    def test_union_postorder(self):
        # left tape, right tape, then opcode 100 (operations/mod.rs:13-17).
        s = sphere(radius=1.0)
        b = box()
        tape = encode_wire(s | b)
        assert tape[0] == oc.OP_SPHERE
        assert tape[5] == oc.OP_BOX
        assert tape[-1] == oc.OP_UNION
        assert wire_cmd_count(tape) == 3

    def test_subtraction_opcode(self):
        tape = encode_wire(sphere() - box())
        assert tape[-1] == oc.OP_SUBTRACTION == 101

    def test_reference_opcode_values(self):
        assert oc.OP_SPHERE == 0
        assert oc.OP_BOX == 1
        assert oc.OP_UNION == 100
        assert oc.OP_SUBTRACTION == 101

    def test_empty_scene(self):
        assert encode_wire(None).size == 0

    def test_smooth_union_param(self):
        tape = encode_wire(sphere().union(box(), k=0.3))
        assert tape[-2] == oc.OP_SMOOTH_UNION
        assert tape[-1] == bits(0.3)


class TestTransformFolding:
    def test_translate_sphere_folds_to_center(self):
        tape = encode_wire(sphere(center=(1.0, 0.0, 0.0)).translate((0.0, 2.0, 0.0)))
        f = tape.view(np.float32)
        assert tape[0] == oc.OP_SPHERE
        np.testing.assert_allclose(f[1:4], [1.0, 2.0, 0.0])

    def test_scale_folds_into_params(self):
        tape = encode_wire(sphere(radius=1.0).scale(2.0))
        f = tape.view(np.float32)
        assert f[4] == pytest.approx(2.0)

    def test_scale_scales_smooth_k(self):
        t1 = encode_wire(sphere().union(box(), k=0.25).scale(4.0))
        assert t1.view(np.float32)[-1] == pytest.approx(1.0)

    def test_rotation_box_uses_rot_opcode(self):
        node = box().rotate_axis_angle((0, 1, 0), 0.7)
        tape = encode_wire(node)
        assert tape[0] == oc.OP_BOX_ROT

    def test_rotation_of_sphere_stays_plain(self):
        tape = encode_wire(sphere(center=(1, 0, 0)).rotate_axis_angle((0, 1, 0), np.pi / 2))
        assert tape[0] == oc.OP_SPHERE
        f = tape.view(np.float32)
        np.testing.assert_allclose(f[1:4], [0.0, 0.0, -1.0], atol=1e-6)

    def test_nested_transform_composition(self):
        # translate(rotate(translate(sphere))) composes into one center.
        node = (
            sphere(center=(1.0, 0.0, 0.0))
            .translate((0.0, 1.0, 0.0))
            .rotate_axis_angle((0.0, 0.0, 1.0), np.pi / 2)
            .translate((5.0, 0.0, 0.0))
        )
        tape = encode_wire(node)
        f = tape.view(np.float32)
        # inner center after +ty: (1,1,0); rot z 90deg: (-1,1,0); +tx5: (4,1,0)
        np.testing.assert_allclose(f[1:4], [4.0, 1.0, 0.0], atol=1e-6)

    def test_plane_folds_under_transform(self):
        node = plane(normal=(0, 1, 0), offset=1.5).translate((0.0, 2.0, 0.0))
        tape = encode_wire(node)
        assert tape[0] == oc.OP_PLANE
        f = tape.view(np.float32)
        np.testing.assert_allclose(f[1:4], [0.0, 1.0, 0.0], atol=1e-6)
        assert f[4] == pytest.approx(-0.5)  # dot(p,n) + 1.5 shifted down by 2


class TestDeviceProgram:
    def test_stack_slots_postorder(self):
        scene = (sphere() | box()) - torus()
        spec, arrays = compile_scene(scene)
        real = arrays.tape_ops != oc.COP_NOP
        ops = arrays.tape_ops[real]
        slots = arrays.out_slot[real]
        # push s0, push s1, union->s0, push s1, sub->s0
        np.testing.assert_array_equal(
            ops,
            [oc.COP_PUSH, oc.COP_PUSH, oc.COP_UNION, oc.COP_PUSH, oc.COP_SUBTRACTION],
        )
        np.testing.assert_array_equal(slots, [0, 1, 0, 1, 0])

    def test_leaves_grouped_by_type(self):
        scene = (torus() | sphere()) | (box() | sphere(center=(2, 0, 0)))
        spec, arrays = compile_scene(scene)
        types = [t for t, _, _ in spec.type_slices]
        assert types == sorted(types)
        # Both spheres land in the sphere bank.
        sl = [s for s in spec.type_slices if s[0] == oc.LEAF_SPHERE][0]
        assert sl[2] - sl[1] >= 2

    def test_bucketing_stability_under_edit(self):
        """Editing params or adding a node within capacity keeps TapeSpec
        identical => no recompilation (the reference's runtime-edit
        property, README.md:7)."""
        s1 = sphere(radius=1.0) | box()
        s2 = sphere(radius=1.7) | box(half_extents=(2, 1, 1))
        spec1, _ = compile_scene(s1)
        spec2, _ = compile_scene(s2)
        assert spec1 == spec2
        # add one more sphere: still within the bucket of 8
        s3 = (sphere() | box()) | sphere(center=(3, 0, 0))
        spec3, _ = compile_scene(s3)
        assert spec3.type_slices == spec1.type_slices  # same bank capacities

    def test_malformed_wire_raises(self):
        bad = np.array([oc.OP_UNION], dtype=np.uint32)
        with pytest.raises(ValueError):
            compile_wire(bad)

    def test_empty_tape_compiles(self):
        spec, arrays = compile_scene(None)
        assert (arrays.tape_ops == oc.COP_NOP).all()

    def test_stack_depth_deep_chain(self):
        scene = sphere()
        for i in range(1, 9):
            scene = scene | sphere(center=(float(i), 0, 0))
        spec, arrays = compile_scene(scene, rebalance=False)
        assert spec.stack_depth >= 2
        # Left-leaning chain needs depth 2 only (raw RPN lowering).
        assert arrays.out_slot[arrays.tape_ops != oc.COP_NOP].max() <= 1

    def test_right_leaning_needs_depth(self):
        def right_chain(k):
            if k == 0:
                return sphere(center=(float(k), 0, 0))
            return sphere(center=(float(k), 0, 0)) | right_chain(k - 1)

        spec, arrays = compile_scene(right_chain(6), rebalance=False)
        real = arrays.tape_ops != oc.COP_NOP
        assert arrays.out_slot[real].max() >= 6 - 1
        assert spec.stack_depth >= 7

    def test_rebalance_bounds_depth(self):
        # Default lowering rebalances associative chains: a 64-operand
        # right-leaning union chain needs only ~log2(64)+1 slots instead
        # of 64 (and its combine dependency chain shrinks the same way).
        def right_chain(k):
            if k == 0:
                return sphere(center=(float(k), 0, 0))
            return sphere(center=(float(k), 0, 0)) | right_chain(k - 1)

        spec, arrays = compile_scene(right_chain(63))
        real = arrays.tape_ops != oc.COP_NOP
        assert arrays.out_slot[real].max() <= 7
        # Same leaf/instruction populations as the unbalanced lowering.
        spec0, arrays0 = compile_scene(right_chain(63), rebalance=False)
        assert spec.type_slices == spec0.type_slices
        assert (arrays.tape_ops[real] == oc.COP_PUSH).sum() == 64
        assert (arrays.tape_ops[real] == oc.COP_UNION).sum() == 63


class TestMacroStream:
    """The fused push/push/combine MACRO encoding consumed by the Pallas
    dynamic-tape interpreter (ops.tape.macroize_streams)."""

    @staticmethod
    def _decode(arrays, spec):
        out = []
        for j in range(spec.n_macro):
            packed = int(arrays.macro_ops[j])
            marg = int(arrays.macro_arg[j])
            slotk = int(arrays.macro_slotk[j])
            out.append(
                dict(
                    pushA=packed & 1,
                    pushB=(packed >> 1) & 1,
                    cop=packed >> 2,
                    argA=marg >> 10,
                    argB=marg & 1023,
                    slot=slotk & 255,
                    kidx=slotk >> 8,
                )
            )
        return out

    def test_golden_config2(self):
        # (sphere | box) - torus: PUSH,PUSH,UNION,PUSH,SUB -> 2 macros.
        scene = (sphere(radius=0.9) | box(center=(0.8, 0, 0))) - torus(
            center=(0, 0.8, 0)
        )
        spec, arrays = compile_scene(scene)
        # Bucket floor is min_instr_bucket/2 = 4 so the macro bucket stays
        # stable across the same small structural edits the instruction
        # bucket absorbs (tests/test_viewer.py exercises this live).
        assert spec.n_macro == 4
        assert spec.macro_slot0
        m = self._decode(arrays, spec)
        assert m[0] == dict(
            pushA=1, pushB=1, cop=oc.COP_UNION, argA=0, argB=2, slot=0, kidx=2
        )
        assert m[1] == dict(
            pushA=0, pushB=1, cop=oc.COP_SUBTRACTION, argA=0, argB=4, slot=0,
            kidx=4,
        )

    def test_pushB_implies_combine(self):
        # Invariant the slot0 accumulator form relies on: a pushB value is
        # always consumed by the fused combine, never stored.
        import itertools

        rng = np.random.default_rng(3)
        for n in (1, 2, 3, 5, 9, 17):
            parts = [sphere(center=(float(i), 0, 0)) for i in range(n)]
            scene = parts[0]
            for p in parts[1:]:
                scene = (
                    scene | p if rng.random() < 0.5 else scene.subtract(p)
                )
            for rebalance in (False, True):
                spec, arrays = compile_scene(scene, rebalance=rebalance)
                for m in self._decode(arrays, spec):
                    if m["pushB"]:
                        assert m["cop"] in (
                            oc.COP_UNION,
                            oc.COP_INTERSECTION,
                            oc.COP_SUBTRACTION,
                            oc.COP_SMOOTH_UNION,
                            oc.COP_SMOOTH_INTERSECTION,
                            oc.COP_SMOOTH_SUBTRACTION,
                        )

    def test_macro_halves_entries(self):
        # A balanced 64-leaf union tree: 127 instructions -> <= 64 macros.
        parts = [sphere(center=(float(i), 0, 0)) for i in range(64)]
        scene = parts[0]
        for p in parts[1:]:
            scene = scene | p
        spec, arrays = compile_scene(scene)
        from raymarch_tpu.ops.tape import macroize_streams

        real = arrays.tape_ops != oc.COP_NOP
        n_real = int(real.sum())
        _, _, _, n_macro_real, _ = macroize_streams(
            arrays.tape_ops, arrays.tape_arg, arrays.out_slot, n_real
        )
        assert n_real == 127
        assert n_macro_real <= 64

    def test_unary_on_right_leaf_disables_slot0(self):
        scene = sphere(radius=0.5) | box(half_extents=(0.4,) * 3).round(0.1)
        spec, _ = compile_scene(scene, rebalance=False)
        assert spec.stack_depth == 2
        assert not spec.macro_slot0

    def test_replay_matches_instruction_stream(self):
        # Scalar replay of the macro stream == scalar replay of the
        # instruction stream, on random scenes with every op class.
        from raymarch_tpu.ops.tape import macroize_streams

        rng = np.random.default_rng(11)

        def rand_scene(n):
            prims = [
                sphere(center=tuple(rng.uniform(-2, 2, 3)), radius=0.3),
                box(center=tuple(rng.uniform(-2, 2, 3))),
                torus(center=tuple(rng.uniform(-2, 2, 3))),
            ]
            node = prims[rng.integers(len(prims))]
            for _ in range(n):
                other = prims[rng.integers(len(prims))]
                r = rng.random()
                if r < 0.2:
                    node = node.union(other, k=0.2)
                elif r < 0.4:
                    node = node | other
                elif r < 0.6:
                    node = node.subtract(other)
                elif r < 0.8:
                    node = other | node
                else:
                    node = node.round(0.05)
            return node

        def replay_instrs(arrays, sd, leaf_vals):
            stack = [100.0] * (sd + 1)
            for k in range(len(arrays.tape_ops)):
                op = int(arrays.tape_ops[k])
                arg = int(arrays.tape_arg[k])
                s = int(arrays.out_slot[k])
                kp = float(arrays.op_param[k])
                a, b = stack[s], stack[s + 1] if s + 1 <= sd else 100.0
                stack[s] = _apply_cop(op, a, b, kp, leaf_vals.get(arg, 100.0))
            return stack[0]

        def replay_macros(arrays, spec, sd, leaf_vals):
            stack = [100.0] * (sd + 1)
            for j in range(spec.n_macro):
                packed = int(arrays.macro_ops[j])
                marg = int(arrays.macro_arg[j])
                slotk = int(arrays.macro_slotk[j])
                s = slotk & 255
                kp = float(arrays.op_param[slotk >> 8])
                a = (
                    leaf_vals.get(marg >> 10, 100.0)
                    if packed & 1
                    else stack[s]
                )
                b = (
                    leaf_vals.get(marg & 1023, 100.0)
                    if packed & 2
                    else (stack[s + 1] if s + 1 <= sd else 100.0)
                )
                cop = packed >> 2
                if cop in (oc.COP_NOP, oc.COP_PUSH):
                    stack[s] = a
                else:
                    stack[s] = _apply_cop(cop, a, b, kp, None)
            return stack[0]

        def _apply_cop(op, a, b, kp, leaf):
            import math

            def smin(a, b, k):
                k = max(k, 1e-8)
                h = max(k - abs(a - b), 0.0) / k
                return min(a, b) - h * h * k * 0.25

            if op == oc.COP_NOP:
                return a
            if op == oc.COP_PUSH:
                return leaf
            if op == oc.COP_UNION:
                return min(a, b)
            if op == oc.COP_INTERSECTION:
                return max(a, b)
            if op == oc.COP_SUBTRACTION:
                return max(a, -b)
            if op == oc.COP_SMOOTH_UNION:
                return smin(a, b, kp)
            if op == oc.COP_SMOOTH_INTERSECTION:
                return -smin(-a, -b, kp)
            if op == oc.COP_SMOOTH_SUBTRACTION:
                return -smin(-a, b, kp)
            if op == oc.COP_ROUND:
                return a - kp
            if op == oc.COP_ONION:
                return abs(a) - kp
            raise AssertionError(op)

        for trial in range(20):
            scene = rand_scene(int(rng.integers(1, 10)))
            for rebalance in (False, True):
                spec, arrays = compile_scene(scene, rebalance=rebalance)
                sd = max(spec.stack_depth, 64)
                leaf_vals = {
                    r: float(rng.uniform(-1, 1))
                    for r in range(spec.n_leaves)
                }
                v1 = replay_instrs(arrays, sd, leaf_vals)
                v2 = replay_macros(arrays, spec, sd, leaf_vals)
                assert v1 == pytest.approx(v2, abs=1e-12), (trial, rebalance)

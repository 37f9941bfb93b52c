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

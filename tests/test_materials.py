"""Material system tests (reference roadmap item, README.md:10 unchecked).

Materials are per-primitive albedos attached with `material=` / `.paint()`,
encoded as postfix OP_MATERIAL wire attributes, stored in the leaf bank
(leaf_params[:, 12:15], flag at 15), and propagated through CSG ops to the
winning surface (smooth ops blend). Validated oracle-vs-device at every
level: tape ABI, point evaluation, full images (jnp + Pallas interpret),
and gradients w.r.t. albedo values.
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.models import csg
from raymarch_tpu.ops import opcodes as oc
from raymarch_tpu.ops import oracle

CFG = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80)
RED = (0.8, 0.1, 0.1)
BLUE = (0.1, 0.2, 0.9)

CAM = rm.Camera.looking_at(position=(0.0, 1.2, 4.0), target=(0.0, 0.0, 0.0))


def two_sphere_scene():
    return rm.sphere(center=(-0.8, 0, 0), radius=0.7, material=RED) | rm.sphere(
        center=(0.8, 0, 0), radius=0.7, material=BLUE
    )


class TestWireABI:
    def test_material_postfix_encoding(self):
        tape = rm.encode_wire(rm.sphere(radius=1.0, material=RED))
        assert int(tape[0]) == oc.OP_SPHERE
        assert int(tape[5]) == oc.OP_MATERIAL
        np.testing.assert_allclose(
            tape[6:9].view(np.float32), np.asarray(RED, np.float32)
        )

    def test_unpainted_tape_unchanged(self):
        # Scenes without materials emit byte-identical tapes to the
        # reference-compatible encoding (ABI preserved).
        s = rm.sphere(radius=1.0) | rm.box()
        tape = rm.encode_wire(s)
        assert oc.OP_MATERIAL not in set(int(x) for x in tape[:: 1])

    def test_native_validates_painted_tape(self):
        from raymarch_tpu import native

        if not native.available():
            pytest.skip("native core not built")
        tape = rm.encode_wire(two_sphere_scene())
        cmds, _ = native.validate(tape)
        assert cmds == 5  # 2 spheres + 2 materials + union
        # Distances unaffected by material attributes.
        pts = np.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], np.float32)
        d_nat = native.eval_tape(tape, pts)
        d_py = oracle.eval_tape(tape, pts, CFG)
        np.testing.assert_allclose(d_nat, d_py, atol=1e-6)

    def test_paint_dsl(self):
        s = (rm.sphere(material=RED) | rm.box()).paint(BLUE)
        a, b = s.a, s.b
        assert a.material == tuple(np.float64(RED))  # kept (no overwrite)
        assert b.material is not None
        s2 = s.paint((0.5, 0.5, 0.5), overwrite=True)
        assert s2.a.material == (0.5, 0.5, 0.5)

    def test_fold_transforms_preserves_material(self):
        s = rm.sphere(material=RED).translate((1, 0, 0)).scale(2.0)
        folded = csg.fold_transforms(s)
        assert folded.material == tuple(np.float64(RED))


class TestOracleColor:
    def test_union_picks_nearer(self):
        tape = rm.encode_wire(two_sphere_scene())
        pts = np.asarray([[-0.8, 0, 0.9], [0.8, 0, 0.9]], np.float32)
        _, rgb = oracle.eval_tape_color(tape, pts, CFG)
        np.testing.assert_allclose(rgb[0], RED, atol=1e-6)
        np.testing.assert_allclose(rgb[1], BLUE, atol=1e-6)

    def test_unpainted_leaf_uses_config_albedo(self):
        tape = rm.encode_wire(rm.sphere(radius=1.0))
        _, rgb = oracle.eval_tape_color(tape, [[0, 0, 0.5]], CFG)
        np.testing.assert_allclose(rgb[0], CFG.albedo, atol=1e-6)

    def test_subtraction_cut_surface_material(self):
        scene = rm.box(half_extents=(1, 1, 1), material=RED) - rm.sphere(
            radius=0.8, material=BLUE
        )
        tape = rm.encode_wire(scene)
        # Inside the carved hollow, near the spherical cut: sphere wins.
        _, rgb = oracle.eval_tape_color(tape, [[0.0, 0.0, 0.75]], CFG)
        np.testing.assert_allclose(rgb[0], BLUE, atol=1e-6)
        # On the outer box shell: box material.
        _, rgb = oracle.eval_tape_color(tape, [[0.0, 0.0, 1.0]], CFG)
        np.testing.assert_allclose(rgb[0], RED, atol=1e-6)

    def test_smooth_union_blends(self):
        scene = rm.sphere(center=(-0.5, 0, 0), material=RED).union(
            rm.sphere(center=(0.5, 0, 0), material=BLUE), k=0.5
        )
        tape = rm.encode_wire(scene)
        _, rgb = oracle.eval_tape_color(tape, [[0.0, 0.0, 0.0]], CFG)
        # Equidistant point: 50/50 blend.
        np.testing.assert_allclose(
            rgb[0], 0.5 * np.asarray(RED) + 0.5 * np.asarray(BLUE), atol=1e-5
        )


class TestDeviceColor:
    @pytest.mark.parametrize("static", [False, True])
    def test_scene_color_matches_oracle(self, static, rng):
        import jax

        from raymarch_tpu.ops.sdf import make_scene_color_fn

        scene = (
            two_sphere_scene()
            | rm.box(center=(0, -1.2, 0), half_extents=(2, 0.2, 2))
        ) - rm.torus(center=(0, 0.8, 0), material=(0.9, 0.9, 0.1))
        tape = rm.encode_wire(scene)
        spec, arrays = rm.compile_scene(scene, static=static)
        pts = rng.uniform(-2.5, 2.5, (256, 3)).astype(np.float32)
        d_o, rgb_o = oracle.eval_tape_color(tape, pts, CFG)
        fn = make_scene_color_fn(spec, CFG)
        d_d, rgb_d = jax.jit(fn)(pts, arrays)
        np.testing.assert_allclose(np.asarray(d_d), d_o, atol=2e-5)
        # Exclude points at selection boundaries (|a-b| tiny flips sides in
        # f32 vs f64); materials are piecewise constant elsewhere.
        stable = np.abs(np.asarray(d_d) - d_o) < 1e-5
        np.testing.assert_allclose(
            np.asarray(rgb_d)[stable], rgb_o[stable], atol=1e-4
        )

    def test_rendered_image_matches_oracle(self):
        import jax

        scene = two_sphere_scene()
        tape = rm.encode_wire(scene)
        spec, arrays = rm.compile_scene(scene)
        W = H = 40
        img_o = oracle.render(tape, CAM, W, H, CFG)
        render = rm.make_renderer(spec, W, H, CFG, mode="forward")
        img_d = np.asarray(jax.jit(render)(arrays, CAM))
        assert np.abs(img_d - img_o).max() < 2e-3

    def test_fused_pallas_kernel_materials(self):
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_march import make_pallas_image_render

        scene = two_sphere_scene()
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 40, 32
        img_o = oracle.render(rm.encode_wire(scene), CAM, W, H, CFG)
        rgb = make_pallas_image_render(spec, CFG, W, H, interpret=True)
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        r, g, b = rgb(arrays, cv)
        S = CFG.aa_samples**2
        img = np.stack(
            [np.asarray(v).reshape(H * W, S).mean(1) for v in (r, g, b)], -1
        ).reshape(H, W, 3)
        assert np.abs(img - img_o).mean() < 1e-3

    def test_prepass_renderer_materials(self):
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        scene = two_sphere_scene()
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 40, 32
        img_o = oracle.render(rm.encode_wire(scene), CAM, W, H, CFG)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        img = np.asarray(rnd(arrays, cv))
        assert np.abs(img - img_o).mean() < 1e-3

    def test_fused_dynamic_with_materials(self):
        # Dynamic tape + materials in the fused prepass renderer (the
        # 4-channel register-stack interpreter): image matches the oracle,
        # and a material edit is visible with zero retrace.
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        scene = two_sphere_scene()
        spec, arrays = rm.compile_scene(scene)  # dynamic tape
        W, H = 48, 32
        img_o = oracle.render(rm.encode_wire(scene), CAM, W, H, CFG)
        rnd = make_pallas_image_render_aa(
            spec, CFG, W, H, interpret=True, bm_coarse=8, bm_fine=8
        )
        cv = jnp.asarray(
            np.concatenate([CAM.position, CAM.rotation, [0.0]]).astype(np.float32)
        )
        traces = 0

        @jax.jit
        def render(a, c):
            nonlocal traces
            traces += 1
            return rnd(a, c)

        img = np.asarray(render(arrays, cv))
        assert np.abs(img - img_o).mean() < 1e-3

        lp = np.asarray(arrays.leaf_params).copy()
        lp[0, oc.LEAF_ALBEDO : oc.LEAF_ALBEDO + 3] = (0.9, 0.9, 0.1)
        arrays2 = dataclasses.replace(arrays, leaf_params=lp)
        img2 = np.asarray(render(arrays2, cv))
        assert traces == 1
        assert np.abs(img - img2).max() > 1e-3

    def test_albedo_gradient_flows(self):
        import jax
        import jax.numpy as jnp

        scene = two_sphere_scene()
        spec, arrays = rm.compile_scene(scene, static=True)
        W = H = 24
        render = rm.make_renderer(spec, W, H, CFG, mode="implicit")

        def loss(lp):
            img = render(dataclasses.replace(arrays, leaf_params=lp), CAM)
            return jnp.mean((img - 0.5) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(arrays.leaf_params)))
        # Gradient w.r.t. the red channel of the red sphere's albedo.
        assert np.abs(g[:, oc.LEAF_ALBEDO : oc.LEAF_ALBEDO + 3]).max() > 1e-6

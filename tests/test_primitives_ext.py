"""Extended primitives (cylinder, capsule, capped cone) — the reference's
"more SDF primitives" roadmap (README.md:9, unchecked).

Validated at every level: closed-form math, oracle vs jnp vs native C++
agreement (incl. rotated variants), Pallas kernel march agreement, transform
folding, bounding-sphere conservativeness, and gradient flow.
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.models import csg
from raymarch_tpu.ops import oracle

CFG = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80)


class TestClosedForm:
    def test_cylinder(self):
        tape = rm.encode_wire(rm.cylinder(radius=0.5, half_height=1.0))
        d = oracle.eval_tape(tape, [[2.0, 0, 0], [0, 2.0, 0], [0, 0, 0], [1.5, 2.0, 0]], CFG)
        np.testing.assert_allclose(d[0], 1.5, atol=1e-6)  # beside the wall
        np.testing.assert_allclose(d[1], 1.0, atol=1e-6)  # above the cap
        np.testing.assert_allclose(d[2], -0.5, atol=1e-6)  # inside (wall nearest)
        np.testing.assert_allclose(d[3], np.hypot(1.0, 1.0), atol=1e-6)  # edge

    def test_capsule(self):
        tape = rm.encode_wire(rm.capsule(radius=0.5, half_height=1.0))
        d = oracle.eval_tape(tape, [[0, 2.0, 0], [1.0, 0.5, 0], [0, 0, 0]], CFG)
        np.testing.assert_allclose(d[0], 0.5, atol=1e-6)  # above top cap
        np.testing.assert_allclose(d[1], 0.5, atol=1e-6)  # beside segment
        np.testing.assert_allclose(d[2], -0.5, atol=1e-6)  # center

    def test_cone(self):
        # Cylinder degenerate case: r_bottom == r_top.
        t_cone = rm.encode_wire(rm.cone(half_height=1.0, r_bottom=0.5, r_top=0.5))
        t_cyl = rm.encode_wire(rm.cylinder(radius=0.5, half_height=1.0))
        pts = np.random.default_rng(1).uniform(-2, 2, (64, 3)).astype(np.float32)
        np.testing.assert_allclose(
            oracle.eval_tape(t_cone, pts, CFG),
            oracle.eval_tape(t_cyl, pts, CFG),
            atol=1e-5,
        )
        # Sharp cone apex at y=+h.
        t_sharp = rm.encode_wire(rm.cone(half_height=1.0, r_bottom=1.0, r_top=0.0))
        d = oracle.eval_tape(t_sharp, [[0, 2.0, 0]], CFG)
        np.testing.assert_allclose(d[0], 1.0, atol=1e-6)


SCENE_EXT = (
    rm.cylinder(center=(-1.2, 0, 0), radius=0.4, half_height=0.8,
                material=(0.9, 0.3, 0.1))
    | rm.capsule(center=(0, 0, 0), radius=0.35, half_height=0.6,
                 rotation=(0.9238795, 0.0, 0.0, 0.3826834))
    | rm.cone(center=(1.2, 0, 0), half_height=0.7, r_bottom=0.6, r_top=0.15)
)


class TestCrossValidation:
    def test_oracle_vs_jnp_vs_native(self, rng):
        import jax

        from raymarch_tpu import native
        from raymarch_tpu.ops.sdf import make_scene_fn

        tape = rm.encode_wire(SCENE_EXT)
        pts = rng.uniform(-2.5, 2.5, (512, 3)).astype(np.float32)
        d_o = oracle.eval_tape(tape, pts, CFG)

        for static in (False, True):
            spec, arrays = rm.compile_scene(SCENE_EXT, static=static)
            d_j = np.asarray(jax.jit(make_scene_fn(spec, CFG))(pts, arrays))
            np.testing.assert_allclose(d_j, d_o, atol=3e-5)

        if native.available():
            d_n = native.eval_tape(tape, pts)
            np.testing.assert_allclose(d_n, d_o, atol=3e-5)

    def test_pallas_march_agrees(self):
        import jax

        from raymarch_tpu.ops.march import make_march
        from raymarch_tpu.ops.pallas_march import make_pallas_ray_march

        cam = rm.Camera.looking_at(position=(0, 1.2, 4.0), target=(0, 0, 0))
        spec, arrays = rm.compile_scene(SCENE_EXT, static=True)
        import jax.numpy as jnp

        idx = jnp.arange(1024, dtype=jnp.int32)
        o, d = rm.raygen_flat(idx, cam.position, cam.rotation, 32, 32, CFG)
        pm = make_pallas_ray_march(spec, CFG, True)
        t_p, hit_p, steps_p = map(np.asarray, jax.jit(lambda a, o, d: pm(a, o, d))(arrays, o, d))
        jm = make_march(spec, CFG, "forward")
        t_j, hit_j, steps_j = map(np.asarray, jax.jit(lambda o, d, a: jm(o, d, a))(o, d, arrays))
        assert (hit_p == hit_j).all()
        np.testing.assert_array_equal(steps_p, steps_j)
        m = hit_j > 0.5
        np.testing.assert_allclose(t_p[m], t_j[m], atol=1e-5)

    def test_bound_accel_conservative(self):
        import jax
        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_march import make_pallas_image_march

        cam = rm.Camera.looking_at(position=(0, 1.2, 4.0), target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
        )
        spec, arrays = rm.compile_scene(SCENE_EXT, static=True)
        cfg_b = dataclasses.replace(CFG, bound_accel=True)
        m0 = make_pallas_image_march(spec, CFG, 24, 24, interpret=True)
        m1 = make_pallas_image_march(spec, cfg_b, 24, 24, interpret=True)
        t0, h0, _ = map(np.asarray, m0(arrays, cv))
        t1, h1, _ = map(np.asarray, m1(arrays, cv))
        np.testing.assert_array_equal(h0, h1)
        m = h0 > 0.5
        # Starting at the bound entry changes the sample sequence, so hits
        # land anywhere within the min_dist band (reference hit semantics).
        np.testing.assert_allclose(t0[m], t1[m], atol=CFG.min_dist)

    def test_fold_transforms(self):
        s = rm.cone(half_height=1.0, r_bottom=0.5).scale(2.0).translate((0, 1, 0))
        f = csg.fold_transforms(s)
        assert isinstance(f, csg.Cone)
        np.testing.assert_allclose(f.half_height, 2.0)
        np.testing.assert_allclose(f.r_bottom, 1.0)
        np.testing.assert_allclose(f.center, (0, 1, 0))
        # Rotated capsule folds rotation into the leaf quaternion.
        c = csg.fold_transforms(
            rm.capsule().rotate_axis_angle((1, 0, 0), np.pi / 2)
        )
        assert isinstance(c, csg.Capsule)
        assert not np.allclose(c.rotation, (1, 0, 0, 0))

    def test_grad_flows_through_new_prims(self):
        import jax
        import jax.numpy as jnp

        spec, arrays = rm.compile_scene(SCENE_EXT, static=True)
        cam = rm.Camera.looking_at(position=(0, 1.2, 4.0), target=(0, 0, 0))
        render = rm.make_renderer(spec, 24, 24, CFG, mode="implicit")

        def loss(lp):
            img = render(dataclasses.replace(arrays, leaf_params=lp), cam)
            return jnp.mean(img**2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(arrays.leaf_params)))
        assert np.isfinite(g).all()
        assert np.abs(g[:, 7:10]).max() > 1e-6  # radii/heights get gradient

    def test_graph_templates(self):
        from raymarch_tpu.models.graph import CSGNodeGraph

        g = CSGNodeGraph()
        cyl = g.add_node("Cylinder", radius=0.4, half_height=0.8)
        mat = g.add_node("Material", albedo=(0.9, 0.1, 0.1))
        root = g.add_node("Root")
        g.connect(cyl, mat, "A")
        g.connect(mat, root, "SDF")
        scene = g.evaluate_root()
        assert isinstance(scene, csg.Cylinder)
        assert scene.material == (0.9, 0.1, 0.1)

    def test_image_oracle_vs_device(self):
        import jax

        cam = rm.Camera.looking_at(position=(0, 1.2, 4.0), target=(0, 0, 0))
        spec, arrays = rm.compile_scene(SCENE_EXT)
        W = H = 40
        img_o = oracle.render(rm.encode_wire(SCENE_EXT), cam, W, H, CFG)
        render = rm.make_renderer(spec, W, H, CFG, mode="forward")
        img_d = np.asarray(jax.jit(render)(arrays, cam))
        assert np.abs(img_d - img_o).max() < 2e-3

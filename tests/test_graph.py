"""Node-graph tests: editor semantics parity with the reference
(csg_node_graph.rs): evaluate_root, memoized shared subgraphs, None
propagation for incomplete graphs, runtime edit -> re-render cycle."""

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.models import csg
from raymarch_tpu.models.graph import CSGNodeGraph, all_templates


class TestGraphEvaluation:
    def test_templates_cover_reference_and_extensions(self):
        names = all_templates()
        for required in ("Root", "Sphere", "Box", "Union", "Subtraction"):
            assert required in names  # reference active set (csg/mod.rs:30-45)
        for ext in ("Torus", "Plane", "Intersection", "SmoothUnion", "Translate"):
            assert ext in names

    def test_simple_scene(self):
        g = CSGNodeGraph()
        root = g.add_root()
        s = g.add_node("Sphere", center=(1.0, 0.0, 0.0), radius=0.5)
        g.connect(s, root, "SDF")
        tree = g.evaluate_root()
        assert tree == csg.sphere((1.0, 0.0, 0.0), 0.5)

    def test_union_graph_matches_dsl(self):
        g = CSGNodeGraph()
        root = g.add_root()
        s = g.add_node("Sphere")
        b = g.add_node("Box", half_extents=(0.5, 0.5, 0.5))
        u = g.add_node("Union")
        g.connect(s, u, "A")
        g.connect(b, u, "B")
        g.connect(u, root, "SDF")
        tree = g.evaluate_root()
        expected = csg.sphere() | csg.box(half_extents=(0.5, 0.5, 0.5))
        np.testing.assert_array_equal(
            rm.encode_wire(tree), rm.encode_wire(expected)
        )

    def test_no_root_returns_none(self):
        g = CSGNodeGraph()
        g.add_node("Sphere")
        assert g.evaluate_root() is None

    def test_missing_operand_propagates_none(self):
        """Reference failure semantics: incomplete graph -> None -> empty
        tape -> background only (operations/mod.rs:47-48, wgsl:188-191)."""
        g = CSGNodeGraph()
        root = g.add_root()
        u = g.add_node("Union")
        s = g.add_node("Sphere")
        g.connect(s, u, "A")  # B left unconnected
        g.connect(u, root, "SDF")
        assert g.evaluate_root() is None
        assert rm.encode_wire(g.evaluate_root()).size == 0

    def test_shared_subgraph_memoized(self):
        """A node feeding two inputs evaluates once per evaluate_root call
        (per-OutputId cache, csg_node_graph.rs:266)."""
        g = CSGNodeGraph()
        calls = []
        from raymarch_tpu.models import graph as gmod

        orig = gmod.TEMPLATES["Sphere"].evaluate

        def counting(vals):
            calls.append(1)
            return orig(vals)

        gmod.TEMPLATES["Sphere"] = gmod.TEMPLATES["Sphere"].__class__(
            "Sphere", gmod.TEMPLATES["Sphere"].inputs, counting
        )
        try:
            root = g.add_root()
            s = g.add_node("Sphere")
            u = g.add_node("Union")
            g.connect(s, u, "A")
            g.connect(s, u, "B")  # same node on both inputs
            g.connect(u, root, "SDF")
            tree = g.evaluate_root()
            assert tree is not None
            assert len(calls) == 1
        finally:
            gmod.TEMPLATES["Sphere"] = gmod.TEMPLATES["Sphere"].__class__(
                "Sphere", gmod.TEMPLATES["Sphere"].inputs, orig
            )

    def test_cycle_raises(self):
        g = CSGNodeGraph()
        root = g.add_root()
        u1 = g.add_node("Union")
        u2 = g.add_node("Union")
        s = g.add_node("Sphere")
        g.connect(u2, u1, "A")
        g.connect(u1, u2, "A")
        g.connect(s, u1, "B")
        g.connect(s, u2, "B")
        g.connect(u1, root, "SDF")
        with pytest.raises(ValueError, match="cycle"):
            g.evaluate_root()

    def test_sdf_input_rejects_constant(self):
        g = CSGNodeGraph()
        u = g.add_node("Union")
        with pytest.raises(TypeError, match="SDF input"):
            g.set_input(u, "A", 1.0)

    def test_remove_node_drops_connections(self):
        g = CSGNodeGraph()
        root = g.add_root()
        s = g.add_node("Sphere")
        g.connect(s, root, "SDF")
        g.remove_node(s)
        assert g.evaluate_root() is None

    def test_transform_nodes(self):
        g = CSGNodeGraph()
        root = g.add_root()
        s = g.add_node("Sphere")
        t = g.add_node("Translate", offset=(1.0, 2.0, 3.0))
        g.connect(s, t, "A")
        g.connect(t, root, "SDF")
        tape = rm.encode_wire(g.evaluate_root())
        f = tape.view(np.float32)
        np.testing.assert_allclose(f[1:4], [1.0, 2.0, 3.0])

    def test_edit_rerender_no_recompile(self):
        """The full editor loop: evaluate -> compile -> render; param edit
        keeps the TapeSpec (one compiled program serves the session)."""
        import jax

        g = CSGNodeGraph()
        root = g.add_root()
        s = g.add_node("Sphere", radius=1.0)
        g.connect(s, root, "SDF")
        spec1, arrays1 = rm.compile_scene(g.evaluate_root())
        cam = rm.Camera.looking_at(position=(0, 0, 4), target=(0, 0, 0))
        cfg = rm.RenderConfig(aa_samples=1, max_iter=32)
        render = jax.jit(rm.make_renderer(spec1, 16, 16, cfg, mode="forward"))
        img1 = np.asarray(render(arrays1, cam))

        g.set_input(s, "radius", 0.6)  # runtime edit
        spec2, arrays2 = rm.compile_scene(g.evaluate_root())
        assert spec2 == spec1
        img2 = np.asarray(render(arrays2, cam))
        assert np.abs(img2 - img1).max() > 0.01
        assert render._cache_size() == 1

"""Per-tile leaf culling tests (ops.culling).

Culling substitutes FAR for leaves whose inflated bounding sphere misses a
kernel tile's view cone. Three layers of validation:

1. The substitution LEMMA (module docstring of ops.culling): with the culled
   operand >= sum|k| + min_dist, every combine op yields a field identical to
   the true field at all march-reachable points (other operand >= -min_dist),
   so hits, hit values, and shading taps are bitwise-equal.
2. Mask conservativeness: the packed per-tile masks, evaluated against a
   brute-force per-ray minimum leaf distance, never cull a leaf that gets
   anywhere near a tile's rays.
3. End-to-end: images with cfg.leaf_cull on/off agree to the prepass
   tolerance class (interpret mode) on multi-primitive scenes, materials,
   and dynamic tapes.
"""

import dataclasses

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.config import RenderConfig
from raymarch_tpu.ops import opcodes as oc
from raymarch_tpu.ops.culling import (
    FAR,
    leaf_bound_spheres,
    pack_mask_bits,
    tile_leaf_masks,
)
from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa
from raymarch_tpu.ops.sdf import smooth_max, smooth_min

CFG = dataclasses.replace(
    rm.DEFAULT_CONFIG, aa_samples=2, max_iter=80, bound_accel=True
)
CAM = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0.0, 0.0, 0.0))


def _cam_vec(cam):
    import jax.numpy as jnp

    return jnp.asarray(
        np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
    )


def _grid_scene(n=12, material=False):
    """A ring of spheres + boxes around a central smooth-blended pair: most
    leaves are far from most tiles, so culling has real work to do."""
    parts = []
    for i in range(n):
        ang = 2.0 * np.pi * i / n
        c = (3.0 * np.cos(ang), 0.4 * ((i % 3) - 1), 3.0 * np.sin(ang))
        mat = (
            (0.1 + 0.8 * (i / n), 0.3, 0.9 - 0.8 * (i / n)) if material else None
        )
        if i % 2 == 0:
            p = rm.sphere(center=c, radius=0.45, material=mat)
        else:
            p = rm.box(center=c, half_extents=(0.35, 0.35, 0.35), material=mat)
        parts.append(p)
    center = rm.sphere(center=(-0.4, 0, 0), radius=0.7).union(
        rm.sphere(center=(0.4, 0, 0), radius=0.7), k=0.3
    )
    scene = center
    for p in parts:
        scene = scene | p
    return scene


class TestLemma:
    """combine(FAR, b) vs combine(a, b) with a in the culled regime."""

    MIN_DIST = 0.01

    def _check(self, f, a_vals, b_vals, k):
        # a = culled operand's true value (>= k + min_dist), b = other
        # operand restricted to march-reachable values (>= -min_dist).
        A, B = np.meshgrid(a_vals, b_vals, indexing="ij")
        true = np.asarray(f(A, B, k))
        sub = np.asarray(f(np.full_like(A, FAR), B, k))
        md = self.MIN_DIST
        # (i) identical hit classification
        assert ((true < md) == (sub < md)).all()
        # (ii) exact equality everywhere either side is below the level set
        band = (true < md) | (sub < md)
        np.testing.assert_array_equal(true[band], sub[band])
        # (iii) substitution only ever over-estimates (march never stalls)
        assert (sub >= true - 1e-6).all()

    @pytest.mark.parametrize("k", [0.0, 0.05, 0.4, 1.0])
    def test_culled_a_side(self, k):
        a = np.linspace(k + self.MIN_DIST, 50.0, 301, dtype=np.float32)
        b = np.linspace(-self.MIN_DIST, 50.0, 301, dtype=np.float32)
        for f in (
            lambda a, b, k: np.minimum(a, b),  # union
            lambda a, b, k: np.maximum(a, b),  # intersection
            lambda a, b, k: np.maximum(a, -b),  # subtraction (culled = kept)
            lambda a, b, k: smooth_min(a, b, k) if k else np.minimum(a, b),
            lambda a, b, k: smooth_max(a, b, k) if k else np.maximum(a, b),
            lambda a, b, k: smooth_max(a, -b, k) if k else np.maximum(a, -b),
        ):
            self._check(f, a, b, k)

    @pytest.mark.parametrize("k", [0.0, 0.05, 0.4, 1.0])
    def test_culled_b_side(self, k):
        # Same ops with the culled leaf as the SECOND operand.
        c = np.linspace(k + self.MIN_DIST, 50.0, 301, dtype=np.float32)
        v = np.linspace(-self.MIN_DIST, 50.0, 301, dtype=np.float32)
        for f in (
            lambda c, v, k: np.minimum(v, c),
            lambda c, v, k: np.maximum(v, c),
            lambda c, v, k: np.maximum(v, -c),  # subtracting a culled leaf
            lambda c, v, k: smooth_min(v, c, k) if k else np.minimum(v, c),
            lambda c, v, k: smooth_max(v, c, k) if k else np.maximum(v, c),
            lambda c, v, k: smooth_max(v, -c, k) if k else np.maximum(v, -c),
        ):
            self._check(f, c, v, k)

    @pytest.mark.parametrize("k", [0.05, 0.4])
    def test_unary_ops(self, k):
        # round: d - r; onion: |d| - t. Culled operand >= k + min_dist (+ the
        # implementation's absolute _RADIUS_MARGIN, which absorbs exactly
        # this boundary's f32 slop).
        a = np.linspace(k + self.MIN_DIST + 1e-3, 50.0, 501, dtype=np.float32)
        for f in (lambda d: d - k, lambda d: np.abs(d) - k):
            true = f(a)
            sub = f(np.full_like(a, FAR))
            md = self.MIN_DIST
            assert ((true < md) == (sub < md)).all()
            assert (sub >= true - 1e-6).all()


class TestMaskBits:
    def test_pack_roundtrip(self, rng):
        import jax.numpy as jnp

        for L in (1, 31, 32, 33, 64, 100):
            active = rng.random((5, L)) < 0.5
            packed = np.asarray(pack_mask_bits(jnp.asarray(active)))
            assert packed.shape == (5, (L + 31) // 32)
            for t in range(5):
                for l in range(L):
                    bit = (packed[t, l // 32] >> (l % 32)) & 1
                    assert bool(bit) == bool(active[t, l]), (t, l)

    def test_bit31_survives(self):
        import jax.numpy as jnp

        active = np.zeros((1, 32), bool)
        active[0, 31] = True
        packed = np.asarray(pack_mask_bits(jnp.asarray(active)))
        # int32 bit-cast of 0x80000000
        assert packed[0, 0] == np.int32(-(2**31))


class TestMaskConservative:
    def test_never_culls_near_leaves(self):
        """Brute force: for every (tile, leaf) culled by the mask, the true
        leaf distance along every pixel-center ray of the tile must stay
        above the safety threshold (min_dist, with sum|k| and tap slack)."""
        import jax.numpy as jnp

        scene = _grid_scene(8)
        spec, arrays = rm.compile_scene(scene, static=True)
        W, H = 64, 48
        n_ty, n_tx = 6, 4  # 8x16-pixel tiles
        tile_h, tile_w = H / n_ty, W / n_tx
        bounds = leaf_bound_spheres(spec, arrays, CFG)
        cam_vec = _cam_vec(CAM)
        mask = np.asarray(
            tile_leaf_masks(
                bounds, cam_vec, CFG, W, H, n_ty, n_tx, tile_h, tile_w
            )
        )

        # Per-leaf distance fields via the oracle's leaf evaluators.
        from raymarch_tpu.ops import oracle as orc

        lp = np.asarray(arrays.leaf_params)
        # March-reachable sample points: dense t samples along every
        # pixel-center ray (camera to max visible range).
        idx = jnp.arange(W * H, dtype=jnp.int32)
        cfg1 = dataclasses.replace(CFG, aa_samples=1)
        o, d = rm.raygen_flat(idx, CAM.position, CAM.rotation, W, H, cfg1)
        o = np.asarray(o).reshape(H, W, 3)
        d = np.asarray(d).reshape(H, W, 3)
        ts = np.linspace(0.0, 12.0, 96, dtype=np.float32)
        # Per-leaf path-aware threshold (culling._leaf_op_incidence): a
        # culled leaf must clear min_dist plus the |k| of the ops on ITS
        # path to the root (ops elsewhere never see its value). Tap slack
        # not needed for ray points.
        from raymarch_tpu.ops.culling import _leaf_op_incidence

        M = np.asarray(_leaf_op_incidence(spec))
        k_leaf = M @ np.abs(np.asarray(arrays.op_param))
        thresh_leaf = CFG.min_dist + k_leaf

        for ty in range(n_ty):
            for tx in range(n_tx):
                tid = ty * n_tx + tx
                culled = [
                    l
                    for l in range(spec.n_leaves)
                    if not ((mask[tid, l // 32] >> (l % 32)) & 1)
                ]
                if not culled:
                    continue
                r0, r1 = int(ty * tile_h), int((ty + 1) * tile_h)
                c0, c1 = int(tx * tile_w), int((tx + 1) * tile_w)
                op = o[r0:r1, c0:c1].reshape(-1, 1, 3)
                dp = d[r0:r1, c0:c1].reshape(-1, 1, 3)
                pts = (op + dp * ts[None, :, None]).reshape(-1, 3)
                for l in culled:
                    dist = _leaf_dist_np(lp[l], _leaf_type(spec, l), pts)
                    assert dist.min() > thresh_leaf[l], (
                        f"tile ({ty},{tx}) culled leaf {l} but min dist "
                        f"{dist.min()} <= {thresh_leaf[l]}"
                    )


def _leaf_type(spec, row):
    for t, start, stop in spec.type_slices:
        if start <= row < stop:
            return t
    raise AssertionError(row)


def _leaf_dist_np(p, ltype, pts):
    """NumPy leaf distance (independent re-derivation for the test)."""
    q = pts - p[4:7]
    if ltype == oc.LEAF_SPHERE:
        return np.linalg.norm(q, axis=-1) - p[7]
    if ltype == oc.LEAF_BOX:
        a = np.abs(q) - p[7:10]
        return np.linalg.norm(np.maximum(a, 0), axis=-1) + np.minimum(
            np.max(a, axis=-1), 0.0
        )
    raise AssertionError(f"unsupported leaf type {ltype} in test scene")


def _assert_images_close(img, ref, mean=1e-3, frac=0.03):
    d = np.abs(img - ref)
    assert d.mean() < mean, f"mean diff {d.mean()}"
    assert (d > 1e-3).mean() < frac, f"frac>1e-3 {(d > 1e-3).mean()}"
    assert (d > 0.3).mean() == 0.0, f"max diff {d.max()}"


class TestCullRender:
    """cfg.leaf_cull on/off image equivalence (interpret mode)."""

    def _render_pair(self, scene, static=True, block=4, material=False,
                     W=64, H=48):
        spec, arrays = rm.compile_scene(scene, static=static)
        imgs = {}
        for cull in (False, True):
            cfg = dataclasses.replace(CFG, leaf_cull=cull)
            rnd = make_pallas_image_render_aa(
                spec, cfg, W, H, interpret=True, bm_coarse=8, bm_fine=8,
                prepass_block=block,
            )
            imgs[cull] = np.asarray(rnd(arrays, _cam_vec(CAM)))
        return imgs[False], imgs[True]

    def test_grid_scene_static(self):
        off, on = self._render_pair(_grid_scene(10))
        _assert_images_close(on, off)

    def test_grid_scene_dynamic_tape(self):
        off, on = self._render_pair(_grid_scene(6), static=False)
        _assert_images_close(on, off)

    def test_materials(self):
        off, on = self._render_pair(_grid_scene(8, material=True))
        _assert_images_close(on, off)

    def test_with_plane_unbounded(self):
        scene = _grid_scene(6) | rm.plane(normal=(0, 1, 0), offset=1.5)
        off, on = self._render_pair(scene)
        # Plane is unbounded -> always active; other leaves cull normally.
        _assert_images_close(on, off, mean=5e-3, frac=0.06)

    def test_subtraction_of_distant_leaf(self):
        # A distant subtracted leaf must not change carved geometry when
        # culled (exercises the b-side lemma path).
        scene = (
            rm.sphere(center=(0, 0, 0), radius=1.0)
            - rm.sphere(center=(6, 0, 0), radius=0.5)
        ) | rm.box(center=(6.5, 0, 0), half_extents=(0.4, 0.4, 0.4))
        off, on = self._render_pair(scene)
        _assert_images_close(on, off)

    def test_cull_masks_actually_cull(self):
        # Sanity: on the grid scene some (tile, leaf) pairs must be culled,
        # otherwise these tests prove nothing.
        scene = _grid_scene(10)
        spec, arrays = rm.compile_scene(scene, static=True)
        bounds = leaf_bound_spheres(spec, arrays, CFG)
        mask = np.asarray(
            tile_leaf_masks(bounds, _cam_vec(CAM), CFG, 64, 48, 6, 4, 8.0, 16.0)
        )
        total = mask.shape[0] * spec.n_leaves
        act = sum(
            1
            for t in range(mask.shape[0])
            for l in range(spec.n_leaves)
            if (mask[t, l // 32] >> (l % 32)) & 1
        )
        assert act < total, "no leaf was ever culled"
        assert act > 0, "every leaf culled everywhere"


class TestPairwiseCertificate:
    """Round-5 spatially gated blend inflation (culling._pairwise_path_ksum):
    leaf bounds keep |k| only for path ops whose sibling subtree can
    band-interact. Soundness is stress-checked against un-culled renders on
    chain topologies with MIXED spacing — touching links (bands chain and
    must be kept) and distant links (dropped)."""

    def _render_pair(self, scene, seed_cam=(0.0, 2.2, 7.5), W=160, H=100):
        import dataclasses as dc

        import jax.numpy as jnp

        from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

        spec, arrays = rm.compile_scene(scene, static=True)
        cam = rm.Camera.looking_at(position=seed_cam, target=(0, 0, 0))
        cv = jnp.asarray(
            np.concatenate([cam.position, cam.rotation, [0.0]]).astype(
                np.float32
            )
        )
        cfg_on = dc.replace(
            rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True, bound_accel=True
        )
        cfg_off = dc.replace(cfg_on, leaf_cull=False)
        kw = dict(no_prepass=True, aa_packed=False)
        a = np.asarray(
            make_pallas_image_render_aa(
                spec, cfg_on, W, H, interpret=True, **kw
            )(arrays, cv)
        )
        b = np.asarray(
            make_pallas_image_render_aa(
                spec, cfg_off, W, H, interpret=True, **kw
            )(arrays, cv)
        )
        return a, b

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_mixed_spacing_chain_matches_uncull(self, seed):
        rng = np.random.default_rng(100 + seed)
        # Chain of smooth unions: clusters of touching spheres (bands must
        # chain) separated by larger gaps (bands must NOT couple).
        x = -2.5
        scene = rm.sphere(center=(x, 0.0, 0.0), radius=0.45)
        for j in range(9):
            if j % 3 == 2:
                x += float(rng.uniform(1.8, 2.4))  # far link
            else:
                x += float(rng.uniform(0.75, 0.95))  # touching link
            y = float(rng.uniform(-0.3, 0.5))
            scene = scene.union(
                rm.sphere(center=(x, y, 0.0), radius=0.45),
                k=float(rng.uniform(0.15, 0.3)),
            )
        a, b = self._render_pair(scene)
        d = np.abs(a - b)
        assert d.mean() < 1e-5, d.mean()
        assert (d.max(axis=-1) > 5e-2).sum() == 0, d.max()
        assert (d.max(axis=-1) > 1e-2).sum() < 10, (d.max(), d.mean())

    def test_touching_chain_keeps_band_ks(self):
        # Fully touching chain: each leaf's NEIGHBOR bands overlap it, so
        # the certificate must keep those ks (middle leaves ~3 ks: their
        # own link + both adjacent links). A leaf's influence does NOT
        # crawl along a neighbor's surface to farther links — outside a
        # band the fold output equals the other operand exactly — so the
        # full path sum is NOT required (that is the certificate's win;
        # the render-level stress tests above pin its soundness).
        import dataclasses as dc

        from raymarch_tpu.ops import culling as cu

        scene = rm.sphere(center=(0.0, 0.0, 0.0), radius=0.5)
        for j in range(1, 6):
            scene = scene.union(
                rm.sphere(center=(j * 0.85, 0.0, 0.0), radius=0.5), k=0.3
            )
        spec, arrays = rm.compile_scene(scene, static=True)
        cfg = dc.replace(rm.DEFAULT_CONFIG, leaf_cull=True)
        bounds = np.asarray(cu.leaf_bound_spheres(spec, arrays, cfg))
        lp = np.asarray(arrays.leaf_params)
        pushed = cu._pushed_rows(spec)
        infl = bounds[pushed, 3] - np.abs(lp[pushed, 7])
        # middle leaves: >= ~3 adjacent ks kept; ends: >= their own k
        assert infl.max() > 0.8 * 3 * 0.3, infl
        assert infl.min() > 0.3, infl

    def test_separated_chain_drops_far_ks(self):
        import dataclasses as dc

        from raymarch_tpu.ops import culling as cu

        scene = rm.sphere(center=(0.0, 0.0, 0.0), radius=0.4)
        for j in range(1, 6):
            scene = scene.union(
                rm.sphere(center=(j * 4.0, 0.0, 0.0), radius=0.4), k=0.25
            )
        spec, arrays = rm.compile_scene(scene, static=True)
        cfg = dc.replace(rm.DEFAULT_CONFIG, leaf_cull=True)
        bounds = np.asarray(cu.leaf_bound_spheres(spec, arrays, cfg))
        lp = np.asarray(arrays.leaf_params)
        pushed = cu._pushed_rows(spec)
        infl = bounds[pushed, 3] - np.abs(lp[pushed, 7])
        # widely separated links: every leaf keeps at most ~2 ks
        assert infl.max() < 2.5 * 0.25 + 0.05, infl

    def test_subtraction_sibling_interaction_kept(self):
        # Smooth subtraction whose carving sphere overlaps the base: its k
        # must stay in the base leaves' inflation (carve region near base).
        import dataclasses as dc

        scene = (
            rm.sphere(center=(-0.4, 0.0, 0.0), radius=0.6)
            | rm.sphere(center=(0.8, 0.0, 0.0), radius=0.5)
        ).subtract(rm.sphere(center=(0.0, 0.4, 0.3), radius=0.35), k=0.2)
        a, b = self._render_pair(scene, seed_cam=(0.0, 1.6, 4.5))
        d = np.abs(a - b)
        assert d.mean() < 1e-5 and (d.max(axis=-1) > 1e-2).sum() < 10

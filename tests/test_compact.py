"""Compacted O(active)-leaf evaluation for union-of-primitives scenes.

The per-tile cull masks are compacted (host-side, jnp) into dense
active-leaf row lists and the Pallas kernels loop a RUNTIME per-tile count
instead of unrolling the O(n_leaves) static body — see
ops.pallas_march._make_scene_eval_compact for why branches around the
unrolled body do not shrink many-leaf kernels on TPU. Hard-union min is
order-exact in fp, so the compacted evaluation introduces no reorder error;
remaining differences vs the un-culled render come only from culling itself
(FAR substitution perturbs off-surface march SAMPLES within the
ops.culling lemma's tolerance class — hits and on-surface values agree),
so images match to the same tolerance the gated-cull tests use.
"""

import dataclasses as dc

import numpy as np
import jax.numpy as jnp
import pytest

import raymarch_tpu as rm
from raymarch_tpu.ops import culling
from raymarch_tpu.ops.pallas_march import compactable_spec
from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa


def _mixed_union_scene():
    return (
        rm.sphere(center=(-0.6, 0.0, 0.0), radius=0.9)
        | rm.box(center=(0.8, 0.0, 0.0), half_extents=(0.5, 0.5, 0.5))
        | rm.torus(center=(0.0, 0.9, 0.0), major_radius=0.6, minor_radius=0.2)
        | rm.capsule(center=(1.8, 0.3, -1.0), radius=0.25, half_height=0.5)
        | rm.box(
            center=(-1.8, 0.2, -0.8),
            half_extents=(0.3, 0.3, 0.3),
            rotation=(0.9238795, 0.0, 0.3826834, 0.0),
        )
    )


def _cam_vec(cam):
    return jnp.asarray(
        np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
    )


def test_compactable_detection():
    from raymarch_tpu.ops.pallas_march import build_compact_plan

    spec_u, _ = rm.compile_scene(_mixed_union_scene(), static=True)
    assert compactable_spec(spec_u)
    # pure union => ONE segment, all items order-free (round-3 fast path)
    plan_u = build_compact_plan(spec_u)
    assert plan_u["pool"] and plan_u["seg1"] is None
    assert plan_u["stream"] == () and not plan_u["residual_ops"]
    assert all(not g["ordered"] for g in plan_u["groups"])
    # subtraction linearizes too now (fold max(acc, -d), exact skip lemma)
    s = rm.sphere(radius=1.0) - rm.box(half_extents=(0.4, 0.4, 0.4))
    spec_s, _ = rm.compile_scene(s, static=True)
    assert compactable_spec(spec_s)
    plan_s = build_compact_plan(spec_s)
    og = [g for g in plan_s["groups"] if g["ordered"]]
    assert len(og) == 1  # the subtracted box rides the ordered fold
    assert plan_s["seg1"] is not None
    # smooth-INTERSECTION has no exact fold: lands in the residual, and a
    # scene that is mostly that is not worth compacting
    si = rm.sphere(radius=1.0).intersect(
        rm.box(half_extents=(0.8, 0.8, 0.8)), k=0.2
    )
    spec_i, _ = rm.compile_scene(si, static=True)
    assert not compactable_spec(spec_i)
    # dynamic tape has no static tree to compact
    spec_d, _ = rm.compile_scene(_mixed_union_scene(), static=False)
    assert not compactable_spec(spec_d)


def test_compact_rows_exclude_padding_and_order_active_first():
    spec, arrays = rm.compile_scene(_mixed_union_scene(), static=True)
    cfg = dc.replace(rm.DEFAULT_CONFIG, leaf_cull=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
    bounds = culling.leaf_bound_spheres(spec, arrays, cfg)
    masks = culling.tile_leaf_masks(
        bounds, _cam_vec(cam), cfg, 256, 144, 3, 2, 48.0, 128.0
    )
    rows, counts = culling.compact_active_rows(spec, masks)
    rows = np.asarray(rows)
    counts = np.asarray(counts)
    pushed = culling._pushed_rows(spec)
    assert counts.shape == (6, len(spec.type_slices))
    for t_idx in range(rows.shape[0]):
        for si, (_t, r0, r1) in enumerate(spec.type_slices):
            seg = rows[t_idx, r0:r1]
            c = counts[t_idx, si]
            assert 0 <= c <= r1 - r0
            # the first c entries are real (pushed) rows of this slice;
            # padding rows (never pushed) must not be listed as active
            assert all(r0 <= r < r1 for r in seg[:c])
            assert all(pushed[r] for r in seg[:c])
            # no row may be listed twice (count inflation)
            assert len(set(seg[:c])) == c


@pytest.mark.parametrize(
    "kw",
    [
        dict(prepass_block=1, n_intervals=2, aa_packed=True),
        dict(prepass_block=1, aa_packed=True),
        dict(prepass_block=1, n_intervals=2, aa_packed=False),
        dict(no_prepass=True, aa_packed=True),
    ],
)
def test_compact_render_matches_uncull(kw):
    spec, arrays = rm.compile_scene(_mixed_union_scene(), static=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG,
        bound_accel=True,
        exit_check_every=4,
        relax=1.6,
        leaf_cull=True,
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 256, 144, interpret=True, **kw
    )
    r_off = make_pallas_image_render_aa(
        spec, cfg_off, 256, 144, interpret=True, **kw
    )
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(r_off(arrays, cv))
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_compact_render_64_spheres_matches():
    rng = np.random.default_rng(7)
    parts = []
    for _ in range(24):
        c = rng.uniform(-3, 3, 3)
        c[1] = rng.uniform(-1.0, 1.5)
        parts.append(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.15, 0.5)))
        )
    scene = parts[0]
    for p in parts[1:]:
        scene = scene | p
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 2.5, 9.0), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG,
        bound_accel=True,
        exit_check_every=4,
        relax=1.6,
        leaf_cull=True,
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    kw = dict(prepass_block=1, n_intervals=2, aa_packed=True)
    a = np.asarray(
        make_pallas_image_render_aa(spec, cfg_on, 192, 108, interpret=True, **kw)(
            arrays, cv
        )
    )
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 192, 108, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def _two_band_scene():
    """Two spheres whose cull footprints are confined to pixel rows
    [64, 128) and [160, 208) of a 256-row image seen from (0, 0, 5):
    regression scene for the list-super-tile indexing bug (a 128-row kernel
    tile consulting only the 64-row list of its UPPER half silently dropped
    leaves visible in the lower half)."""
    return rm.sphere(center=(0.0, 0.5, 0.0), radius=0.15) | rm.sphere(
        center=(0.0, -0.55, 0.0), radius=0.15
    )


def _band_cam_vec():
    cam = rm.Camera.looking_at(position=(0.0, 0.0, 5.0), target=(0, 0, 0))
    return _cam_vec(cam)


def test_compact_list_supertile_covers_full_unpacked_tile():
    # bm_fine = 128 (small scene) but fine-list super-tiles used to start at
    # 64 pixel rows: the tile's lower half read the WRONG list and dropped
    # leaves confined there. Height 256 = 2 kernel tiles; sphere B sits in
    # rows [64, 128) -- the failing half under the old indexing.
    spec, arrays = rm.compile_scene(_two_band_scene(), static=True)
    cv = _band_cam_vec()
    import dataclasses as _dc

    cfg_on = _dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True)
    cfg_off = _dc.replace(cfg_on, leaf_cull=False)
    kw = dict(no_prepass=True, aa_packed=False)
    r_on = make_pallas_image_render_aa(spec, cfg_on, 128, 256, interpret=True, **kw)
    assert r_on.compact
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 128, 256, interpret=True, **kw)(
            arrays, cv
        )
    )
    # Both spheres must be present: the scene is dark-on-dark if dropped.
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_compact_list_supertile_covers_full_packed_strip_aa1():
    # aa_samples=1 => aa_pack = 128 pixel rows per packed strip, which used
    # to exceed both the mask (MH=64) and list (MHL=64) super-tile heights:
    # the strip's lower half consulted the wrong tile's mask/list.
    spec, arrays = rm.compile_scene(_two_band_scene(), static=True)
    cv = _band_cam_vec()
    import dataclasses as _dc

    cfg_on = _dc.replace(rm.DEFAULT_CONFIG, aa_samples=1, leaf_cull=True)
    cfg_off = _dc.replace(cfg_on, leaf_cull=False)
    kw = dict(no_prepass=True, aa_packed=True)
    r_on = make_pallas_image_render_aa(spec, cfg_on, 128, 256, interpret=True, **kw)
    assert r_on.compact
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 128, 256, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_compact_1000_leaf_wide_image_stays_compact():
    # Round 4 fell back to the gated O(L) evaluator here: with row-only
    # list coarsening the ONE-row fine-list floor was 96 cols x 1001 x 4
    # = 384 KB, over every budget tier. Round-5 x-coarsening keeps the
    # compact path alive (the builder coarsens list super-tiles in BOTH
    # dimensions down to whole-grid tiles if needed) — the advisor's
    # "~1000-leaf scene at 4K silently loses compaction" example.
    rng = np.random.default_rng(3)
    parts = [
        rm.sphere(center=tuple(rng.uniform(-8, 8, 3)), radius=0.3)
        for _ in range(1000)
    ]
    while len(parts) > 1:  # balanced tree: a 1000-deep chain blows recursion
        parts = [
            parts[i] | parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    spec, _arrays = rm.compile_scene(parts[0], static=True)
    import dataclasses as _dc

    cfg = _dc.replace(rm.DEFAULT_CONFIG, leaf_cull=True)
    r = make_pallas_image_render_aa(
        spec, cfg, 12288, 128, interpret=True, no_prepass=True, aa_packed=False
    )
    assert r.compact
    clg, clw, mhl, cwl = r.compact_geometry
    assert cwl > 1  # x-coarsening is what made it fit


def test_1024_leaf_compact_matches_oracle():
    # Scale ceiling: 1024 leaves through the compacted path at a 4K-class
    # width, validated against the NumPy oracle on a crop-height image
    # (full 4K through the interpret-mode kernel would take minutes; the
    # list/tile geometry stress is the WIDTH).
    scene = _many_sphere_scene(1024, seed=33, spread=12.0)
    spec, arrays = rm.compile_scene(scene, static=True)
    assert spec.n_leaves == 1024
    cam = rm.Camera.looking_at(position=(0.0, 6.0, 26.0), target=(0, 0, 0))
    cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=1, leaf_cull=True)
    r = make_pallas_image_render_aa(
        spec, cfg, 256, 96, interpret=True, no_prepass=True, aa_packed=False
    )
    assert r.compact
    img = np.asarray(r(arrays, _cam_vec(cam)))
    img_o = rm.oracle.render(rm.encode_wire(scene), cam, 256, 96, cfg=cfg)
    d = np.abs(img - img_o)
    # aa_samples=1 leaves silhouette pixels binary (no AA mean to smooth
    # the f32-vs-f64 edge class), so the mean bound is looser than the
    # AA'd oracle tests. Verified stronger property: the compact render is
    # BITWISE equal to the unculled f32 kernel on this scene (the whole
    # oracle diff is edge pixels: frac > 0.01 is ~0.1%).
    assert d.mean() < 5e-4, d.mean()
    assert (d.max(axis=-1) > 0.01).mean() < 0.005, (d.max(), d.mean())


def _mixed_ops_scene(n_hard=16, n_smooth=4, n_sub=2, n_ssub=2, seed=11):
    """Hard-union bulk + smooth-union blobs + hard and smooth subtractions:
    the general scene class the segmented compact plan exists for."""
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(n_hard):
        c = rng.uniform(-2.5, 2.5, 3)
        c[1] = rng.uniform(-0.8, 1.2)
        parts.append(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.2, 0.5)))
        )
    scene = parts[0]
    for p in parts[1:]:
        scene = scene | p
    for _ in range(n_smooth):
        c = rng.uniform(-2.0, 2.0, 3)
        c[1] = rng.uniform(-0.5, 1.0)
        scene = scene.union(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.25, 0.45))),
            k=float(rng.uniform(0.1, 0.3)),
        )
    for _ in range(n_sub):
        c = rng.uniform(-2.0, 2.0, 3)
        c[1] = rng.uniform(-0.5, 1.0)
        scene = scene - rm.sphere(
            center=tuple(c), radius=float(rng.uniform(0.3, 0.6))
        )
    for _ in range(n_ssub):
        c = rng.uniform(-2.0, 2.0, 3)
        c[1] = rng.uniform(-0.5, 1.0)
        scene = scene.subtract(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.3, 0.6))),
            k=float(rng.uniform(0.1, 0.25)),
        )
    return scene


def test_mixed_ops_scene_is_one_segment():
    from raymarch_tpu.ops.pallas_march import build_compact_plan

    spec, _ = rm.compile_scene(_mixed_ops_scene(), static=True)
    plan = build_compact_plan(spec)
    assert plan is not None
    assert plan["seg1"] is not None and plan["stream"] == ()
    assert not plan["residual_ops"]
    free = [g for g in plan["groups"] if not g["ordered"]]
    ordered = [g for g in plan["groups"] if g["ordered"]]
    # the 16 hard-union spheres ride the type-grouped free prefix; the
    # smooth/sub tail (8 items) rides the ordered fold
    assert sum(len(g["rows"]) for g in free) == 16
    assert len(ordered) == 1 and len(ordered[0]["rows"]) == 8


def _cluster_scene(n_clusters=6, seed=13):
    """Hard union of spatially-local smooth clusters: base sphere +
    smooth-union blob + smooth-subtract dent each. The representative
    mixed-op scene class: blends are local design features, so the plan
    takes the multi-segment STREAM path and path-aware inflation keeps
    each leaf's cull bound at its own cluster's k."""
    rng = np.random.default_rng(seed)
    clusters = []
    for _ in range(n_clusters):
        c = rng.uniform(-2.5, 2.5, 3)
        c[1] = rng.uniform(-0.5, 1.0)
        base = rm.sphere(center=tuple(c), radius=float(rng.uniform(0.3, 0.5)))
        off = rng.uniform(-0.4, 0.4, 3)
        blob = rm.sphere(
            center=tuple(c + off), radius=float(rng.uniform(0.15, 0.3))
        )
        dent = rm.sphere(
            center=tuple(c - off), radius=float(rng.uniform(0.15, 0.3))
        )
        cl = base.union(blob, k=float(rng.uniform(0.1, 0.25))).subtract(
            dent, k=float(rng.uniform(0.1, 0.2))
        )
        clusters.append(cl)
    scene = clusters[0]
    for cl in clusters[1:]:
        scene = scene | cl
    return scene


def test_cluster_scene_takes_stream_path():
    from raymarch_tpu.ops.pallas_march import build_compact_plan

    spec, arrays = rm.compile_scene(_cluster_scene(), static=True)
    plan = build_compact_plan(spec)
    assert plan is not None
    assert len(plan["stream"]) == 1 and plan["seg1"] is None
    sg = plan["groups"][plan["stream"][0]]
    assert sg["stream"] and len(sg["rows"]) == 18  # 6 clusters x 3 items
    # path-aware inflation: each leaf's bound carries its OWN cluster's
    # two ks, not the scene-wide sum
    cfg = dc.replace(rm.DEFAULT_CONFIG, leaf_cull=True)
    bounds = np.asarray(culling.leaf_bound_spheres(spec, arrays, cfg))
    ksum_all = float(np.abs(arrays.op_param).sum())
    lp = np.asarray(arrays.leaf_params)
    pushed = culling._pushed_rows(spec)
    infl = bounds[pushed, 3] - lp[pushed, 7]  # sphere radius @7
    assert infl.max() < 0.5 * ksum_all  # far below the global sum
    assert infl.min() > 0.0


@pytest.mark.parametrize(
    "kw",
    [
        dict(prepass_block=1, n_intervals=2, aa_packed=True),
        dict(no_prepass=True, aa_packed=False),
    ],
)
def test_compact_render_cluster_scene_matches_uncull(kw):
    spec, arrays = rm.compile_scene(_cluster_scene(), static=True)
    cam = rm.Camera.looking_at(position=(0.0, 2.0, 7.0), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG,
        bound_accel=True,
        exit_check_every=4,
        relax=1.6,
        leaf_cull=True,
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 192, 108, interpret=True, **kw
    )
    assert r_on.compact
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 192, 108, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    # Same tolerance class as the chain-topology test: smooth culling (and
    # relax=1.6 fallback decisions) perturb off-surface march SAMPLES, so
    # grazing/blend-surface hits shift within the min_dist band and shade
    # in the third decimal. Verified: at these pixels the culled image is
    # as close to the f64 oracle as the uncull image (often closer).
    assert d.mean() < 1e-5, d.mean()
    assert (d.max(axis=-1) > 5e-2).sum() == 0, d.max()
    assert (d.max(axis=-1) > 1e-2).sum() < 10, (d.max(), d.mean())


@pytest.mark.parametrize(
    "kw",
    [
        dict(prepass_block=1, n_intervals=2, aa_packed=True),
        dict(no_prepass=True, aa_packed=False),
    ],
)
def test_compact_render_mixed_ops_matches_uncull(kw):
    spec, arrays = rm.compile_scene(_mixed_ops_scene(), static=True)
    cam = rm.Camera.looking_at(position=(0.0, 2.0, 7.0), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG,
        bound_accel=True,
        exit_check_every=4,
        relax=1.6,
        leaf_cull=True,
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 192, 108, interpret=True, **kw
    )
    assert r_on.compact
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 192, 108, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    # Smooth blends make culling perturb the OFF-surface field by up to k/4
    # (the ops.culling lemma is exact only below the min_dist level set), so
    # a few grazing AA samples may land on different march sequences —
    # slightly looser max than the pure-union tests, with a tight mean
    # pinning the difference to isolated edge subpixels.
    assert d.max() < 5e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_compact_render_mixed_ops_matches_oracle():
    scene = _mixed_ops_scene(n_hard=6, n_smooth=2, n_sub=1, n_ssub=1, seed=5)
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 2.0, 7.0), target=(0, 0, 0))
    cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True)
    r = make_pallas_image_render_aa(
        spec, cfg, 128, 96, interpret=True, no_prepass=True, aa_packed=False
    )
    assert r.compact
    img = np.asarray(r(arrays, _cam_vec(cam)))
    img_o = rm.oracle.render(rm.encode_wire(scene), cam, 128, 96, cfg=cfg)
    d = np.abs(img - img_o)
    # f32 kernel vs f64 oracle diverge on a handful of grazing silhouette
    # samples (verified: the compact path is BITWISE equal to the gated
    # kernel on this scene; the residual is the standard kernel-vs-oracle
    # edge class). Bound the mean and the count of edge pixels.
    assert d.mean() < 1e-4, d.mean()
    assert (d.max(axis=-1) > 0.01).mean() < 0.005, (d.max(), d.mean())


def _many_sphere_scene(n, seed=21, spread=6.0):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(n):
        c = rng.uniform(-spread, spread, 3)
        c[1] = rng.uniform(-1.0, 2.0)
        parts.append(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.15, 0.45)))
        )
    while len(parts) > 1:
        parts = [
            parts[i] | parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def test_256_leaf_compact_matches_oracle():
    # Scale test past the BASELINE config-5 size: 256 leaves through the
    # compacted path, validated against the NumPy oracle. (The gated
    # comparison path would unroll 256 leaves in interpret mode - the
    # oracle is the practical ground truth at this size.)
    scene = _many_sphere_scene(256)
    spec, arrays = rm.compile_scene(scene, static=True)
    assert spec.n_leaves == 256  # power-of-two bucket, no padding rows
    cam = rm.Camera.looking_at(position=(0.0, 4.0, 16.0), target=(0, 0, 0))
    cfg = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True)
    r = make_pallas_image_render_aa(
        spec, cfg, 128, 96, interpret=True, no_prepass=True, aa_packed=False
    )
    assert r.compact
    img = np.asarray(r(arrays, _cam_vec(cam)))
    img_o = rm.oracle.render(rm.encode_wire(scene), cam, 128, 96, cfg=cfg)
    d = np.abs(img - img_o)
    assert d.mean() < 1e-4, d.mean()
    assert (d.max(axis=-1) > 0.01).mean() < 0.005, (d.max(), d.mean())


def _nine_segment_scene():
    """9 sensitive root operands (sphere - carve each): a STREAM plan with
    more segments than the 3-bit sid field. Operands 1..7 and operand 8's
    BASE sphere sit far off-screen (culled for every visible tile), while
    operand 8's carve sphere overlaps operand 0's front surface. Under the
    round-4 packing (sid stored mod 8 over one unbounded stream) segments 0
    and 8 shared sid 0: with the middle segments culled away their items
    became list-adjacent, run_stream missed the boundary, and segment 8's
    subtraction carved segment 0's surface (advisor finding, round 4).
    The fix chunks streams into <= 8-segment groups with unique sids."""
    ops = []
    for i in range(9):
        if i == 0:
            base = rm.sphere(center=(0.0, 0.0, 0.0), radius=1.0)
            carve = rm.sphere(center=(320.0, 0.0, 0.0), radius=0.1)
        elif i == 8:
            base = rm.sphere(center=(640.0, 0.0, 0.0), radius=0.3)
            carve = rm.sphere(center=(0.0, 0.0, 1.0), radius=0.5)
        else:
            base = rm.sphere(center=(300.0 + 40.0 * i, 0.0, 0.0), radius=0.3)
            carve = rm.sphere(center=(300.0 + 40.0 * i, 0.0, 0.3), radius=0.1)
        ops.append(base - carve)
    scene = ops[0]
    for o in ops[1:]:
        scene = scene | o
    return scene


def test_stream_sid_unique_per_group():
    from raymarch_tpu.ops.pallas_march import build_compact_plan

    spec, _ = rm.compile_scene(_nine_segment_scene(), static=True)
    plan = build_compact_plan(spec)
    assert plan is not None and len(plan["stream"]) == 2  # 8 + 1 segments
    for gi in plan["stream"]:
        g = plan["groups"][gi]
        # every segment id used in this group maps to ONE segment: the items
        # of a segment are contiguous, so the sid sequence must never revisit
        # a value after leaving it
        sids = [(e >> 15) & 7 for e in g["entries"]]
        seen, prev = set(), None
        for s in sids:
            if s != prev:
                assert s not in seen, "sid reused within a stream group"
                seen.add(s)
            prev = s


def test_stream_sid_collision_culled_segments_render():
    # The advisor's repro: segments 1..7 (and segment 8's base) culled for
    # every visible tile, leaving segment 0's items adjacent to segment 8's
    # carve. The compact render must match the un-culled render (which does
    # NOT carve: the carve belongs to segment 8's own fold, whose base is
    # far away, so max(FAR, -d) = FAR contributes nothing).
    scene = _nine_segment_scene()
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 0.0, 5.0), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True)
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    kw = dict(no_prepass=True, aa_packed=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 128, 96, interpret=True, **kw
    )
    assert r_on.compact
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 128, 96, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_256_leaf_1080p_geometry_coarsens_within_budget():
    # At 1080p a 256-leaf list at base granularity exceeds the SMEM budget;
    # the builder must coarsen list super-tiles (not fall back) and stay on
    # the compacted path.
    scene = _many_sphere_scene(256)
    spec, _ = rm.compile_scene(scene, static=True)
    cfg = dc.replace(
        rm.DEFAULT_CONFIG,
        bound_accel=True,
        exit_check_every=4,
        relax=1.6,
        leaf_cull=True,
    )
    r = make_pallas_image_render_aa(
        spec, cfg, 1920, 1080, interpret=True, prepass_block=1,
        n_intervals=2, aa_packed=True,
    )
    assert r.compact
    clg, clw, mhl, cwl = r.compact_geometry
    assert clg > 1 or clw > 1 or mhl > 64 or cwl > 1  # coarsening happened


@pytest.mark.parametrize(
    "kw",
    [
        dict(no_prepass=True, aa_packed=False),
        dict(no_prepass=True, aa_packed=True),
        dict(prepass_block=1, n_intervals=2, aa_packed=True),
    ],
)
def test_refined_lists_match_uncull(kw):
    # Round-5 second-level refinement: a tiny SMEM budget forces the list
    # super-tiles to coarsen far beyond the mask granularity, so the
    # kernels re-compact their lists in-kernel against the per-tile
    # bitmask (pallas_march.make_compact_refiner). Results must match the
    # un-culled render exactly as the unrefined compact path does.
    scene = _mixed_union_scene()
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True, bound_accel=True
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 256, 144, interpret=True, list_smem_budget=128, **kw
    )
    assert r_on.compact
    assert r_on.compact_refined[0]  # in-kernel refinement engaged
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 256, 144, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    assert d.max() < 1e-3 and d.mean() < 1e-5, (d.max(), d.mean())


def test_refined_lists_stream_scene_matches():
    # Refinement must preserve ordered/stream fold order and sid boundaries
    # (dropout via the mask is the same class as host compaction dropout).
    scene = _cluster_scene()
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 2.0, 7.0), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True, bound_accel=True
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False)
    kw = dict(no_prepass=True, aa_packed=False)
    r_on = make_pallas_image_render_aa(
        spec, cfg_on, 192, 108, interpret=True, list_smem_budget=160, **kw
    )
    assert r_on.compact
    assert r_on.compact_refined[0]
    a = np.asarray(r_on(arrays, cv))
    b = np.asarray(
        make_pallas_image_render_aa(spec, cfg_off, 192, 108, interpret=True, **kw)(
            arrays, cv
        )
    )
    d = np.abs(a - b)
    assert d.mean() < 1e-5, d.mean()
    assert (d.max(axis=-1) > 5e-2).sum() == 0, d.max()
    assert (d.max(axis=-1) > 1e-2).sum() < 10, (d.max(), d.mean())


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_mixed_topology_fuzz_vs_uncull(seed):
    """Randomized topology fuzz: random mixes of hard/smooth unions,
    subtractions, intersections, round/onion over random primitives must
    render identically (tolerance class) with the full cull/compact/
    certificate/refinement machinery on vs everything off. Broad insurance
    behind the targeted regression tests."""
    rng = np.random.default_rng(seed)

    def prim():
        c = tuple(rng.uniform(-2.0, 2.0, 3) * [1, 0.6, 1])
        kind = rng.integers(0, 4)
        if kind == 0:
            return rm.sphere(center=c, radius=float(rng.uniform(0.2, 0.5)))
        if kind == 1:
            return rm.box(
                center=c, half_extents=tuple(rng.uniform(0.15, 0.4, 3))
            )
        if kind == 2:
            return rm.torus(
                center=c,
                major_radius=float(rng.uniform(0.3, 0.5)),
                minor_radius=float(rng.uniform(0.1, 0.2)),
            )
        return rm.capsule(
            center=c,
            radius=float(rng.uniform(0.12, 0.25)),
            half_height=float(rng.uniform(0.2, 0.4)),
        )

    scene = prim()
    for _ in range(int(rng.integers(6, 12))):
        p = prim()
        op = rng.integers(0, 6)
        k = float(rng.uniform(0.08, 0.25))
        if op == 0:
            scene = scene | p
        elif op == 1:
            scene = scene.union(p, k=k)
        elif op == 2:
            scene = scene - p
        elif op == 3:
            scene = scene.subtract(p, k=k)
        elif op == 4:
            scene = scene & p
        else:
            scene = scene | p.round(float(rng.uniform(0.02, 0.08)))
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.3, 1.8, 5.5), target=(0, 0, 0))
    cv = _cam_vec(cam)
    cfg_on = dc.replace(
        rm.DEFAULT_CONFIG, aa_samples=2, leaf_cull=True, bound_accel=True,
        exit_check_every=4,
    )
    cfg_off = dc.replace(cfg_on, leaf_cull=False, bound_accel=False)
    kw = dict(no_prepass=True, aa_packed=False)
    a = np.asarray(
        make_pallas_image_render_aa(spec, cfg_on, 160, 96, interpret=True, **kw)(
            arrays, cv
        )
    )
    b = np.asarray(
        make_pallas_image_render_aa(
            spec, cfg_off, 160, 96, interpret=True, **kw
        )(arrays, cv)
    )
    d = np.abs(a - b)
    assert d.mean() < 2e-5, (d.mean(), d.max())
    assert (d.max(axis=-1) > 5e-2).sum() == 0, d.max()
    assert (d.max(axis=-1) > 1e-2).sum() < 12, (d.max(), d.mean())

"""Per-tile leaf culling: conservative cone/sphere active-leaf masks.

The two-phase device program (ops.tape) evaluates EVERY leaf of the scene at
every distance query — the same O(n_commands)-per-query cost model as the
reference's tape interpreter (reference src/ray_marching/ray_marching.wgsl:
197-202, which loops over all commands per query). That is fine at 3 leaves
and 25x off the throughput target at 64 (ARCHITECTURE.md, many-primitive
scaling). This module removes the O(L) from the hot loop:

- Every Pallas kernel instance processes a localized RECTANGLE of image
  pixels (the 2D image-block tiling), so all of its rays live inside one
  circular view cone (apex = camera, axis = tile-center direction,
  half-angle = max angle to the tile's pixel-rect corners).
- Each leaf gets a conservative bounding sphere, inflated by everything that
  can extend its influence beyond its own surface:
    + sum |op_param|     (smooth-blend bulge <= k/4, round radius, onion
                          thickness — all bounded by their |param|),
    + cfg.min_dist       (proximity hits trigger at d < min_dist),
    + 8 * normal_eps     (shading taps sample at hit +- eps),
    + a small absolute margin for f32 slop.
- A leaf whose inflated sphere does not intersect the tile's cone is
  *culled for that tile*: its distance is replaced by a constant FAR
  (> max_dist, so a fully-culled tile escapes immediately).

Why this is exact (not approximate) for hit/miss and gradients: for any
query point p on a ray of the tile, a culled leaf satisfies
d_leaf(p) >= sum_k + min_dist (+ taps margin). Lemma (checked in
tests/test_culling.py): if a >= k + min_dist then for every combine op in
the instruction set, combine(a, b) < min_dist  <=>  combine(FAR, b) <
min_dist, and in that regime the two are EQUAL (the smooth-blend h-term
vanishes because |a - b| >= k). So the culled field agrees with the true
field everywhere below the min_dist level set along tile rays: identical
hits, identical shading values at hit points, and *exactly zero* gradient
w.r.t. culled leaves' parameters. Above that level the culled field only
over-estimates distance — but it is still a valid SDF lower bound of the
culled scene, whose surface intersects the tile cone identically, so sphere
tracing it is safe (at worst the sample sequence differs, the same
tolerance class as the cone prepass).

Everything here is jnp on dynamic arrays (leaf_params, op_param, cam_vec),
so runtime scene edits and camera motion update the masks with zero
recompilation — masks are *data*, like the tape itself.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from . import opcodes as oc
from .tape import TapeArrays, TapeSpec

# Distance substituted for culled leaves. Must exceed max_dist so a tile in
# which every leaf is culled escapes on its first march step, and must be
# large enough that smooth blends against it vanish (FAR - d >> k always).
FAR = 1.0e4

# Safety margins (see module docstring).
_ANGLE_MARGIN = 1e-4  # radians, absorbs f32 trig slop
_RADIUS_MARGIN = 1e-3


@functools.lru_cache(maxsize=None)
def _leaf_path_data(spec: TapeSpec):
    """Static per-leaf root-path data for the PAIRWISE (spatially gated)
    blend inflation — see leaf_bound_spheres.

    Returns None for dynamic tapes / paths longer than the vectorization
    cap, else a dict of numpy arrays:
      path_op   [L, P] int32 — instr index of the t-th op on leaf l's path
                 (bottom-up, leaf to root; -1 padding)
      path_side [L, P] int8  — operand side leaf l sits on (0 left, 1 right)
      path_un   [L, P] bool  — unary op (round/onion): no sibling, its k
                 shifts the level set unconditionally
      sib_mask  [I, 2, L] bool — per (op, side): leaf rows of that operand
      sib_slack [I, 2] f32-mask rows [I, 2, I] — ops INSIDE that operand
                 subtree (their |k| bounds the operand's value-below-
                 geometric-distance slack)
    """
    if spec.static_tape is None:
        return None
    from .sdf import _static_tree

    root = _static_tree(spec)
    if root is None:
        return None
    L, I = spec.n_leaves, spec.n_instr
    paths: dict[int, list] = {}
    sib_mask = np.zeros((I, 2, L), bool)
    sub_ops = np.zeros((I, 2, I), bool)

    def subtree_ops(node, out):
        kind, i, payload, _rows = node
        if kind == "leaf":
            return
        out[i] = True
        for c in payload:
            subtree_ops(c, out)

    def walk(node, path):
        # path: list of (op_idx, side, unary) from ROOT to here.
        kind, i, payload, rows = node
        if kind == "leaf":
            paths[payload] = list(reversed(path))  # bottom-up
            return
        if kind in (oc.COP_ROUND, oc.COP_ONION):
            walk(payload[0], path + [(i, 0, True)])
            return
        for side, child in enumerate(payload):
            for r in child[3]:
                sib_mask[i, side, r] = True
            subtree_ops(child, sub_ops[i, side])
            walk(child, path + [(i, side, False)])

    walk(root, [])
    P = max((len(p) for p in paths.values()), default=0)
    if P == 0 or P > 256:
        return None
    path_op = np.full((L, P), -1, np.int32)
    path_side = np.zeros((L, P), np.int8)
    path_un = np.zeros((L, P), bool)
    for leaf, p in paths.items():
        for t, (op, side, un) in enumerate(p):
            path_op[leaf, t] = op
            path_side[leaf, t] = side
            path_un[leaf, t] = un
    return dict(
        path_op=path_op, path_side=path_side, path_un=path_un,
        sib_mask=sib_mask, sub_ops=sub_ops,
    )


@functools.lru_cache(maxsize=None)
def _leaf_op_incidence(spec: TapeSpec):
    """Static f32[n_leaves, n_instr] incidence: op i lies on the path from
    leaf row r to the tape root. A culled leaf's FAR substitute flows ONLY
    through its path ops — every other op combines operands that do not
    contain the leaf's value at all — so the blend-radius inflation a leaf
    needs (module docstring) is the sum of |op_param| over its PATH, not
    over the whole tape. For scenes whose smooth blends are local design
    features (a blob smoothed onto one cluster) this collapses the
    inflation from sum-of-all-k to the cluster's own k, which is what keeps
    O(active) evaluation O(active) on mixed-op many-primitive scenes.
    Returns None for dynamic tapes (no static tree — callers fall back to
    the global sum, the old conservative behavior)."""
    if spec.static_tape is None:
        return None
    from .sdf import _static_tree

    root = _static_tree(spec)
    if root is None:
        return None
    M = np.zeros((spec.n_leaves, spec.n_instr), np.float32)

    def walk(node, path):
        kind, i, payload, _rows = node
        if kind == "leaf":
            M[payload, path] = 1.0
            return
        # Hard binary ops carry op_param == 0, so including every path op
        # (not just smooth ones) adds nothing for them and stays correct
        # if a param class is ever added.
        if kind in (oc.COP_ROUND, oc.COP_ONION):
            walk(payload[0], path + [i])
            return
        for c in payload:
            walk(c, path + [i])

    walk(root, [])
    return M


def _pairwise_path_ksum(spec, centers, geo_r, opp_abs, cfg):
    """Spatially gated per-leaf blend inflation (round-5 'pairwise
    certificate'): leaf i's bound inflates by |k_m| only for path ops m
    whose SIBLING subtree can actually band-interact with i.

    Why this is sound (refining the module-docstring lemma): culling leaf
    i perturbs the scene field only through the fold steps on its root
    path, and the sub-min_dist-relevant region of that perturbation can
    cross op m only via m's k-band, which requires a point p where BOTH
    operand values are ~simultaneously small (within rho + k_m + level-set
    slack). Operand values lower-bound their subtree's geometric distance
    minus the subtree's own smooth slack (sum |k| inside it: each smooth
    blend lowers by <= k/4, round/onion shift by k — sum |k| covers both),
    so small values pin p near BOTH operand geometries. If the sibling's
    enclosing sphere (geometric radii + its slack) stays farther than
    reach = geo_r_i + rho_i + k_m + sibling_reach + 2*(min_dist + taps)
    from leaf i's sphere, the band never touches i's influence region
    anywhere in space and m behaves exactly hard w.r.t. the substitution
    — its k drops from i's inflation. rho accumulates bottom-up so chained
    bands (the honest worst case) still sum. Unary round/onion shift the
    level set unconditionally and always count. Strictly conservative
    refinement of the path-sum: rho_i <= sum |k| over path(i) always.

    Returns f32[n_leaves] rho, or None (dynamic tape / deep-path cap) —
    callers fall back to the path-sum/global-sum behavior.
    """
    import jax.numpy as _jnp

    pd = _leaf_path_data(spec)
    if pd is None:
        return None
    P = pd["path_op"].shape[1]
    sm = _jnp.asarray(pd["sib_mask"], _jnp.float32)  # [I,2,L]
    cnt = _jnp.maximum(_jnp.sum(sm, axis=-1), 1.0)  # [I,2]
    cc = _jnp.einsum("isl,lc->isc", sm, centers) / cnt[:, :, None]
    d2cc = _jnp.sqrt(
        _jnp.sum(
            (centers[None, None, :, :] - cc[:, :, None, :]) ** 2, axis=-1
        )
        + 1e-20
    )  # [I,2,L]
    rad = _jnp.max(sm * (d2cc + geo_r[None, None, :]), axis=-1)  # [I,2]
    slack = _jnp.einsum(
        "isj,j->is", _jnp.asarray(pd["sub_ops"], _jnp.float32), opp_abs
    )  # [I,2]
    L0 = cfg.min_dist + 8.0 * cfg.normal_eps + _RADIUS_MARGIN
    path_op = _jnp.asarray(pd["path_op"])
    path_side = _jnp.asarray(pd["path_side"], _jnp.int32)
    path_un = _jnp.asarray(pd["path_un"])
    rho = _jnp.zeros(centers.shape[0], _jnp.float32)
    for t in range(P):
        opix = path_op[:, t]
        valid = opix >= 0
        o = _jnp.clip(opix, 0, None)
        k_t = _jnp.where(valid, opp_abs[o], 0.0)
        sib = 1 - path_side[:, t]
        sc = cc[o, sib]  # [L,3]
        sr = rad[o, sib] + slack[o, sib]
        dist = _jnp.sqrt(_jnp.sum((centers - sc) ** 2, axis=-1) + 1e-20)
        reach = geo_r + rho + k_t + sr + 2.0 * L0
        inter = _jnp.logical_or(dist <= reach, path_un[:, t])
        rho = rho + _jnp.where(_jnp.logical_and(valid, inter), k_t, 0.0)
    return rho


def leaf_bound_spheres(spec: TapeSpec, arrays: TapeArrays, cfg: RenderConfig,
                       soft: bool = False):
    """Conservative inflated bounding spheres for every leaf bank row.

    Returns f32[n_leaves, 5] rows (cx, cy, cz, r_inflated, bounded) where
    bounded=0 marks leaves with no finite bound (planes) — those are always
    active. Same per-type radii as ops.pallas_march.compute_bound; rotation
    never changes them (all formulas are rotation-invariant norms). The
    blend-radius inflation is PER LEAF (path ops only, _leaf_op_incidence)
    for static tapes; dynamic tapes use the global sum.

    `soft=True` (coverage rendering, ops.march shade_soft semantics)
    additionally inflates every bound by 104 * cfg.coverage_beta: a culled
    leaf then satisfies d_leaf >= min_dist + 104*beta along every tile ray,
    so wherever its FAR substitution could raise the scene min, the true
    coverage alpha = exp(-(s_min - min_dist)/beta) <= exp(-104) underflows
    to exactly 0.0 in f32 on BOTH paths — the same exactness argument as
    the soft scene-bound acceleration (ops.pallas_prepass
    _fine_march_tile_soft), applied per leaf.
    """
    lp = jnp.asarray(arrays.leaf_params)
    n = spec.n_leaves
    types = np.zeros(n, np.int32)
    for t, start, stop in spec.type_slices:
        types[start:stop] = t
    types_a = jnp.asarray(types)

    r_sphere = lp[:, 7]
    r_box = jnp.sqrt(jnp.sum(lp[:, 7:10] ** 2, axis=-1))
    r_torus = lp[:, 7] + lp[:, 8]
    r_cyl = jnp.sqrt(lp[:, 7] ** 2 + lp[:, 8] ** 2)
    r_cap = lp[:, 7] + lp[:, 8]
    r_cone = jnp.sqrt(jnp.maximum(lp[:, 8], lp[:, 9]) ** 2 + lp[:, 7] ** 2)
    radii = jnp.select(
        [
            types_a == oc.LEAF_SPHERE,
            types_a == oc.LEAF_BOX,
            types_a == oc.LEAF_TORUS,
            types_a == oc.LEAF_CYLINDER,
            types_a == oc.LEAF_CAPSULE,
            types_a == oc.LEAF_CONE,
        ],
        [r_sphere, r_box, r_torus, r_cyl, r_cap, r_cone],
        default=r_sphere,
    )
    opp_abs = jnp.abs(jnp.asarray(arrays.op_param))
    # Spatially gated pairwise inflation (strictly tighter than the path
    # sum); falls back to path-sum (static) then global-sum (dynamic).
    ksum = _pairwise_path_ksum(spec, lp[:, 4:7], jnp.abs(radii), opp_abs, cfg)
    if ksum is None:
        M = _leaf_op_incidence(spec)
        ksum = jnp.sum(opp_abs) if M is None else jnp.asarray(M) @ opp_abs
    expand = ksum + cfg.min_dist + 8.0 * cfg.normal_eps + _RADIUS_MARGIN
    if soft:
        expand = expand + cfg.soft_cull_log_alpha * cfg.coverage_beta
    bounded = jnp.where(types_a == oc.LEAF_PLANE, 0.0, 1.0)
    return jnp.concatenate(
        [
            lp[:, 4:7],
            (jnp.abs(radii) + expand)[:, None],
            bounded[:, None],
        ],
        axis=-1,
    ).astype(jnp.float32)


def _tile_axes_and_angles(
    cfg: RenderConfig,
    width: int,
    height: int,
    n_ty: int,
    n_tx: int,
    tile_h: float,
    tile_w: float,
    cam_vec,
    extra_angle: float = 0.0,
):
    """Per-tile world-space cone (axis[T,3], cos/sin of half-angle[T]) for a
    grid of n_ty x n_tx tiles of tile_h x tile_w PIXELS, the tile at (ty,tx)
    covering pixel rows [ty*tile_h, (ty+1)*tile_h] (+ the band row offset
    cam_vec[7]) and cols [tx*tile_w, (tx+1)*tile_w]. All AA sample rays of a
    pixel lie strictly inside the pixel's unit square, so rect-corner rays
    bound every ray of the tile; the half-angle is the exact max corner angle
    plus `extra_angle` (for enclosing per-ray cones, e.g. the coarse
    prepass's block cones) plus a small margin."""
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    i0 = jnp.asarray(cam_vec, jnp.float32)[7]

    ty = jnp.arange(n_ty, dtype=jnp.float32)[:, None]  # [n_ty,1]
    tx = jnp.arange(n_tx, dtype=jnp.float32)[None, :]  # [1,n_tx]
    rows_lo = ty * tile_h + i0
    rows_hi = rows_lo + tile_h
    cols_lo = tx * tile_w
    cols_hi = cols_lo + tile_w

    def view_dir(prow, pcol):
        # prow/pcol broadcast to [n_ty, n_tx]; screen coords at pixel-coord
        # boundaries (pixel j's center sits at coord j+0.5).
        x = 2.0 * pcol / width - 1.0
        y = 1.0 - 2.0 * prow / height
        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full(jnp.broadcast_shapes(x.shape, y.shape), -1.0, jnp.float32)
        x_b = jnp.broadcast_to(vx, vz.shape)
        y_b = jnp.broadcast_to(vy, vz.shape)
        inv = jax.lax.rsqrt(x_b * x_b + y_b * y_b + 1.0)
        return x_b * inv, y_b * inv, vz * inv

    cx, cy, cz = view_dir((rows_lo + rows_hi) * 0.5, (cols_lo + cols_hi) * 0.5)
    cos_min = jnp.ones_like(cx)
    for pr, pc in (
        (rows_lo, cols_lo),
        (rows_lo, cols_hi),
        (rows_hi, cols_lo),
        (rows_hi, cols_hi),
    ):
        kx, ky, kz = view_dir(pr, pc)
        cos_min = jnp.minimum(cos_min, cx * kx + cy * ky + cz * kz)
    theta = (
        jnp.arccos(jnp.clip(cos_min, -1.0, 1.0)) + extra_angle + _ANGLE_MARGIN
    )

    # Rotate axes into world space by the camera quaternion.
    cam = jnp.asarray(cam_vec, jnp.float32)
    qw, qx, qy, qz = cam[3], cam[4], cam[5], cam[6]
    tx_ = 2.0 * (qy * cz - qz * cy)
    ty_ = 2.0 * (qz * cx - qx * cz)
    tz_ = 2.0 * (qx * cy - qy * cx)
    ax = cx + qw * tx_ + (qy * tz_ - qz * ty_)
    ay = cy + qw * ty_ + (qz * tx_ - qx * tz_)
    az = cz + qw * tz_ + (qx * ty_ - qy * tx_)
    axes = jnp.stack([ax, ay, az], axis=-1).reshape(-1, 3)  # [T,3]
    return axes, theta.reshape(-1)


def pack_mask_bits(active):
    """active bool[T, L] -> i32[T, ceil(L/32)] bitmask (leaf l = bit l%32 of
    word l//32), bit-cast so bit 31 survives the int32 output."""
    t, l = active.shape
    words = (l + 31) // 32
    pad = words * 32 - l
    a = jnp.pad(active.astype(jnp.uint32), ((0, 0), (0, pad)))
    a = a.reshape(t, words, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(a * weights, axis=-1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def tile_leaf_masks(
    bounds,
    cam_vec,
    cfg: RenderConfig,
    width: int,
    height: int,
    n_ty: int,
    n_tx: int,
    tile_h: float,
    tile_w: float,
    extra_angle: float = 0.0,
):
    """Packed per-tile active-leaf bitmasks i32[n_ty*n_tx, ceil(L/32)].

    A leaf is active for a tile iff its inflated bounding sphere intersects
    the tile's forward view cone (or the leaf is unbounded). Standard
    cone/sphere test: with v = center - apex, the sphere intersects iff
    |v| <= r or angle(v, axis) <= theta + asin(min(r/|v|, 1)).
    """
    axes, theta = _tile_axes_and_angles(
        cfg, width, height, n_ty, n_tx, tile_h, tile_w, cam_vec, extra_angle
    )
    cam = jnp.asarray(cam_vec, jnp.float32)
    o = cam[0:3]
    c = bounds[:, 0:3]  # [L,3]
    r = bounds[:, 3]  # [L]
    unbounded = bounds[:, 4] < 0.5

    v = c[None, :, :] - o[None, None, :]  # [1,L,3]
    dist = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-20)  # [1,L]
    vdot = jnp.einsum("tld,tad->tl", jnp.broadcast_to(v, (axes.shape[0],) + v.shape[1:]),
                      axes[:, None, :])  # [T,L]
    beta = jnp.arccos(jnp.clip(vdot / dist, -1.0, 1.0))  # [T,L]
    alpha = jnp.arcsin(jnp.clip(r[None, :] / dist, 0.0, 1.0))
    inside = dist[0] <= r[None, :]
    active = (beta <= theta[:, None] + alpha) | inside | unbounded[None, :]
    return pack_mask_bits(active)


def _pushed_rows(spec: TapeSpec) -> np.ndarray:
    """Static bool[n_leaves]: rows actually referenced by a COP_PUSH in the
    static tape. Bank PADDING rows (bucketed capacity beyond the real
    leaves) carry zero params — a phantom radius-0 sphere at the origin —
    and their bounding spheres can test active, so compaction must never
    emit them."""
    from . import opcodes as oc_

    pushed = np.zeros(spec.n_leaves, bool)
    for cop, arg, _slot in spec.static_tape or ():
        if cop == oc_.COP_PUSH:
            pushed[arg] = True
    return pushed


def _active_from_mask(spec: TapeSpec, mask_bits):
    """Unpack tile bitmasks to bool[T, n_leaves], padding rows forced off."""
    t_tiles = mask_bits.shape[0]
    words = jax.lax.bitcast_convert_type(mask_bits, jnp.uint32)
    bits = (
        words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    ) & jnp.uint32(1)
    active = bits.reshape(t_tiles, -1)[:, : spec.n_leaves] > 0
    return jnp.logical_and(active, jnp.asarray(_pushed_rows(spec))[None, :])


def compact_plan_rows(spec: TapeSpec, plan, mask_bits):
    """Per-tile compacted active-item lists for a segmented compact plan
    (pallas_march.build_compact_plan).

    mask_bits: i32[T, ceil(L/32)] from tile_leaf_masks. Returns
    (entries s32[T, plan.n_items], counts s32[T, plan.n_counts]): group g's
    columns [offset, offset+len) hold its packed entries with the tile's
    ACTIVE items first in their original order (stable compaction — the
    ordered-fold groups rely on relative order being preserved), and
    counts[:, g] how many are active. Pure jnp on the runtime masks: scene
    edits and camera motion recompact with zero recompilation."""
    active = _active_from_mask(spec, mask_bits)
    lists = []
    counts = []
    for g in plan["groups"]:
        idx = jnp.asarray(np.asarray(g["rows"], np.int32))
        a = active[:, idx]  # [T, G]
        order = jnp.argsort(
            jnp.logical_not(a), axis=1, stable=True
        ).astype(jnp.int32)
        ent = jnp.asarray(np.asarray(g["entries"], np.int32))
        lists.append(jnp.take(ent, order, axis=0))
        counts.append(jnp.sum(a, axis=1, dtype=jnp.int32))
    return (
        jnp.concatenate(lists, axis=1),
        jnp.stack(counts, axis=1),
    )


def compact_active_rows(spec: TapeSpec, mask_bits):
    """Per-tile compacted active-leaf lists from packed bitmasks.

    mask_bits: i32[T, ceil(L/32)] from tile_leaf_masks. Returns
    (rows s32[T, n_leaves], counts s32[T, n_slices]): for type slice s =
    (t, r0, r1), rows[:, r0:r1] holds that slice's row ids with the tile's
    ACTIVE rows first (stable order), and counts[:, s] how many are active.
    Kernels loop each slice to its runtime count (O(active) work; see
    pallas_march._make_scene_eval_compact). Pure jnp on the runtime masks:
    scene edits and camera motion recompact with zero recompilation."""
    t_tiles = mask_bits.shape[0]
    words = jax.lax.bitcast_convert_type(mask_bits, jnp.uint32)
    bits = (
        words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    ) & jnp.uint32(1)
    active = bits.reshape(t_tiles, -1)[:, : spec.n_leaves] > 0
    active = jnp.logical_and(active, jnp.asarray(_pushed_rows(spec))[None, :])
    rows = jnp.zeros((t_tiles, spec.n_leaves), jnp.int32)
    counts = []
    for _t, r0, r1 in spec.type_slices:
        a = active[:, r0:r1]
        order = (
            jnp.argsort(jnp.logical_not(a), axis=1, stable=True).astype(
                jnp.int32
            )
            + r0
        )
        rows = rows.at[:, r0:r1].set(order)
        counts.append(jnp.sum(a, axis=1, dtype=jnp.int32))
    return rows, jnp.stack(counts, axis=1)


# Max leaves per cull gate. The static-tape applier (ops.sdf) gates whole
# SUBTREES of up to this many leaves with ONE scalar `lax.cond` each, not one
# per leaf: scalar branches cost ~tens of ns each on the TPU scalar core, and
# at 64 leaves x ~20 scene evals per tile a per-leaf cond chain costs more
# than the leaf math it skips (measured: per-leaf gating 45 ms vs ungated
# 115 ms at 64 leaves/1080p — branch overhead was most of the 45). Chain
# rebalancing (ops.tape._rebalance_instrs) makes subtrees spatially coherent
# so a gate's leaves cull together.
GATE_MAX_LEAVES = 8


class CullReader:
    """Per-tile mask accessors bound to one kernel tile."""

    def __init__(self, cull_ref, tid):
        self._ref = cull_ref
        self._tid = tid

    def leaf(self, row: int):
        word = self._ref[self._tid, row // 32]
        return ((word >> (row % 32)) & 1) > 0

    def any_active(self, rows):
        """Scalar bool: is ANY of the given leaf rows active for this tile?
        One AND+compare per touched mask word."""
        by_word: dict[int, int] = {}
        for r in rows:
            by_word[r // 32] = by_word.get(r // 32, 0) | (1 << (r % 32))
        acc = None
        for w, m in sorted(by_word.items()):
            mi = m if m < 2**31 else m - 2**32  # i32 bit pattern
            t = (self._ref[self._tid, w] & mi) != 0
            acc = t if acc is None else jnp.logical_or(acc, t)
        return acc


def make_cull_reader(spec: TapeSpec, n_tx: int, enabled: bool):
    """Returns cull(cull_ref, ty, tx) -> CullReader | None.

    `cull_ref` is the scalar-prefetched i32[T, W32] bitmask; (ty, tx) are
    grid coordinates (tx may be 0 for 1D grids with n_tx=1). With
    enabled=False returns None so kernels compile with zero culling code.
    """
    if not enabled:
        return lambda cull_ref, ty, tx: None

    def reader(cull_ref, ty, tx):
        return CullReader(cull_ref, ty * n_tx + tx)

    return reader

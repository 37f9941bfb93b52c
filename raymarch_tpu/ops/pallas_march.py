"""Pallas TPU sphere-tracing march kernel — the hot loop of the framework.

This is the TPU-native replacement for the reference's per-fragment march +
tape interpreter (reference src/ray_marching/ray_marching.wgsl:87-227). Design
points, mapped to the hardware:

- **Tile of rays per program instance**: each grid step marches a
  (BM, 128)-shaped tile of rays (f32 native tile is (8,128)); all math is
  VPU-vectorized over the tile.
- **Scene data in SMEM via scalar prefetch**: the combine tape (opcodes,
  leaf args, stack slots, op params) and the leaf parameter bank are scalar-
  prefetched, so per-instruction control flow (lax.switch) runs off scalar
  memory while the value stack lives in VMEM scratch. The tape is *data*:
  scene edits re-upload buffers, the compiled kernel is reused.
- **Phase-1 leaf evaluation is fully unrolled**: the per-leaf primitive type
  is static (TapeSpec), so each leaf's distance is an inline straight-line
  VPU block with scalar params from SMEM — no branching at all in phase 1.
- **Tile-granularity early exit**: the march is a lax.while_loop on
  "any ray in tile live AND iter < max_iter", reproducing the reference's
  per-pixel break at the granularity a SIMD machine can (SURVEY.md §7
  "Divergence").
- **In-kernel ray generation** (`make_pallas_image_march`): rays are derived
  from the flat ray index and 8 camera scalars, so the kernel reads only the
  scene (a few KB) from HBM and writes 3 words/ray — HBM traffic is
  output-only.

The backward pass reuses the implicit-function VJP from ops.march (one extra
jnp scene evaluation at the hit points); see `make_march_pallas`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from . import opcodes as oc
from .tape import TapeArrays, TapeSpec

# f32 native tile: 8 sublanes x 128 lanes. BM (tile height in sublanes) is
# tunable: bigger tiles amortize per-grid-step dispatch overhead, smaller
# tiles exit the march earlier on coherent regions.
BM = 128
LANES = 128
TILE = BM * LANES


def _leaf_static_rows(spec: TapeSpec):
    """Static (row, leaf_type, rotated) list covering every bank row."""
    rows = []
    for t, start, stop in spec.type_slices:
        for r in range(start, stop):
            rows.append((r, t, bool(spec.rotated_types[t])))
    return rows


def _leaf_distance_tile(lp_ref, row, ltype, rotated, px, py, pz):
    """Distance of one leaf to a (BM,128) tile of points; straight-line VPU
    code with scalar params read from the scalar-prefetched leaf bank."""
    cx, cy, cz = lp_ref[row, 4], lp_ref[row, 5], lp_ref[row, 6]
    x = px - cx
    y = py - cy
    z = pz - cz
    if rotated:
        # Inverse-rotate by the unit quaternion (w,x,y,z): q* p q.
        qw, qx, qy, qz = lp_ref[row, 0], lp_ref[row, 1], lp_ref[row, 2], lp_ref[row, 3]
        qx, qy, qz = -qx, -qy, -qz
        # t = 2 * (u x v); v' = v + w*t + u x t
        tx = 2.0 * (qy * z - qz * y)
        ty = 2.0 * (qz * x - qx * z)
        tz = 2.0 * (qx * y - qy * x)
        x, y, z = (
            x + qw * tx + (qy * tz - qz * ty),
            y + qw * ty + (qz * tx - qx * tz),
            z + qw * tz + (qx * ty - qy * tx),
        )
    if ltype == oc.LEAF_SPHERE:
        r = lp_ref[row, 7]
        return jnp.sqrt(x * x + y * y + z * z + 1e-20) - r
    if ltype == oc.LEAF_BOX:
        hx, hy, hz = lp_ref[row, 7], lp_ref[row, 8], lp_ref[row, 9]
        qx_ = jnp.abs(x) - hx
        qy_ = jnp.abs(y) - hy
        qz_ = jnp.abs(z) - hz
        ox = jnp.maximum(qx_, 0.0)
        oy = jnp.maximum(qy_, 0.0)
        oz = jnp.maximum(qz_, 0.0)
        outside = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-20)
        inside = jnp.minimum(jnp.maximum(qx_, jnp.maximum(qy_, qz_)), 0.0)
        return outside + inside
    if ltype == oc.LEAF_PLANE:
        nx, ny, nz, off = lp_ref[row, 7], lp_ref[row, 8], lp_ref[row, 9], lp_ref[row, 10]
        # plane ignores center/rotation (folded at compile time)
        return px * nx + py * ny + pz * nz + off
    if ltype == oc.LEAF_TORUS:
        rr, sr = lp_ref[row, 7], lp_ref[row, 8]
        ring = jnp.sqrt(x * x + z * z + 1e-20) - rr
        return jnp.sqrt(ring * ring + y * y + 1e-20) - sr
    if ltype == oc.LEAF_CYLINDER:
        r, h = lp_ref[row, 7], lp_ref[row, 8]
        qx = jnp.sqrt(x * x + z * z + 1e-20) - r
        qy = jnp.abs(y) - h
        ox_ = jnp.maximum(qx, 0.0)
        oy_ = jnp.maximum(qy, 0.0)
        return jnp.sqrt(ox_ * ox_ + oy_ * oy_ + 1e-20) + jnp.minimum(
            jnp.maximum(qx, qy), 0.0
        )
    if ltype == oc.LEAF_CAPSULE:
        r, h = lp_ref[row, 7], lp_ref[row, 8]
        yy = y - jnp.clip(y, -h, h)
        return jnp.sqrt(x * x + yy * yy + z * z + 1e-20) - r
    if ltype == oc.LEAF_CONE:
        h, r1, r2 = lp_ref[row, 7], lp_ref[row, 8], lp_ref[row, 9]
        qx = jnp.sqrt(x * x + z * z + 1e-20)
        k2x = r2 - r1
        k2y = 2.0 * h
        cax = qx - jnp.minimum(qx, jnp.where(y < 0.0, r1, r2))
        cay = jnp.abs(y) - h
        denom = jnp.maximum(k2x * k2x + k2y * k2y, 1e-20)
        tt = jnp.clip(((r2 - qx) * k2x + (h - y) * k2y) / denom, 0.0, 1.0)
        cbx = qx - r2 + k2x * tt
        cby = y - h + k2y * tt
        s = jnp.where(jnp.logical_and(cbx < 0.0, cay < 0.0), -1.0, 1.0)
        return s * jnp.sqrt(
            jnp.minimum(cax * cax + cay * cay, cbx * cbx + cby * cby) + 1e-20
        )
    raise ValueError(f"unknown leaf type {ltype}")


# --- segmented O(active) compaction plan -----------------------------------
#
# Generalization of the round-3 pure-union compacted evaluator: the static
# tape is SEGMENTED into maximal subtrees expressible as a LEFT-FOLD
#
#     acc_0 = FAR;  acc_{j+1} = step(acc_j, leaf(row_j), mode_j, k_j)
#
# where step is one of
#     mode 0 (hard union):        min(acc, d)
#     mode 1 (smooth union):      smooth_min(acc, d, k)
#     mode 2 (hard subtraction):  max(acc, -d)
#     mode 3 (smooth subtraction): smooth_max(acc, -d, k)
#
# and the residual combine structure around the segments stays unrolled.
# The fold admits exact per-item SKIPPING of culled leaves, which is what
# makes a per-tile compacted active-item list valid:
#     min(acc, FAR) = acc;  max(acc, -FAR) = acc;
#     smooth_min(acc, FAR, k) = acc and smooth_max(acc, -FAR, k) = acc
#       exactly, because |FAR -+ acc| >= k always (iq's quadratic blends
#       equal the hard op outside the k-band; ops.culling FAR >> max k),
# so dropping a culled item leaves every later fold step bitwise unchanged.
# A subtree linearizes iff:
#   - hard-union joins have at most ONE order-sensitive side (the fold is
#     a single accumulator; two smooth/sub-containing operands would need
#     two). Plain sides reorder freely: fp min is associative+commutative.
#   - each smooth op's RIGHT operand is a bare leaf (the blend applies to
#     the whole accumulator, so the right side cannot itself be a fold).
#   - a hard subtraction's right operand folds to plain-union items
#     (max(acc, -min(c, d)) == max(max(acc, -c), -d) bitwise).
# Items before the first / after the last order-sensitive item are
# order-FREE and get type-grouped straight-line loop bodies (the fast
# path); the sensitive middle runs an ordered fold with a per-item
# lax.switch over leaf types. Pure-union scenes produce exactly one
# all-free segment — the round-3 behavior and performance.

_SEG_PLAIN, _SEG_SMOOTH, _SEG_SUB, _SEG_SSUB = 0, 1, 2, 3


def _pack_seg_entry(row: int, tsel: int, mode: int, sid: int, kidx: int) -> int:
    """List-entry packing: row | tsel<<10 | mode<<13 | sid<<15 | (kidx+1)<<18.
    kidx = -1 marks "no op_param" (hard modes). `sid` is the segment id
    WITHIN one stream group. The 3-bit field is only boundary-exact if every
    segment in the group has a DISTINCT sid: per-tile culling can drop every
    item of intervening segments, making any two of a group's segments
    adjacent in the compacted list (a round-4 advisor finding: with sid
    taken mod 8 over an unbounded segment count, segments i and i+8 merged
    folds when 1..7 culled away). build_compact_plan therefore CHUNKS
    multi-segment streams into groups of <= 8 segments each — sids unique
    per group, boundaries between groups structural (separate fori_loops
    with fresh carries)."""
    assert 0 <= row < 1024 and 0 <= tsel < 8 and 0 <= mode < 4
    assert 0 <= sid < 8 and -1 <= kidx < (1 << 13) - 1
    return (
        row | (tsel << 10) | (mode << 13) | (sid << 15) | ((kidx + 1) << 18)
    )


def _lin_subtree(node):
    """Try to linearize a static-tree node into fold items.

    Returns (items, sensitive) with items = [(row, kidx, mode)], or None
    when the subtree has no exact fold (see the module comment)."""
    kind, i, payload, _rows = node
    if kind == "leaf":
        return [(payload, -1, _SEG_PLAIN)], False
    if kind == oc.COP_UNION:
        la = _lin_subtree(payload[0])
        lb = _lin_subtree(payload[1])
        if la is None or lb is None:
            return None
        ia, sa = la
        ib, sb = lb
        if sa and sb:
            return None
        if sb:
            ia, ib, sa = ib, ia, sb
        return ia + ib, sa
    if kind == oc.COP_SMOOTH_UNION:
        b = payload[1]
        if b[0] != "leaf":
            return None
        la = _lin_subtree(payload[0])
        if la is None:
            return None
        return la[0] + [(b[2], i, _SEG_SMOOTH)], True
    if kind == oc.COP_SUBTRACTION:
        lb = _lin_subtree(payload[1])
        if lb is None or lb[1]:  # right side must be plain-union items
            return None
        la = _lin_subtree(payload[0])
        if la is None:
            return None
        return la[0] + [(r, -1, _SEG_SUB) for (r, _k, _m) in lb[0]], True
    if kind == oc.COP_SMOOTH_SUBTRACTION:
        b = payload[1]
        if b[0] != "leaf":
            return None
        la = _lin_subtree(payload[0])
        if la is None:
            return None
        return la[0] + [(b[2], i, _SEG_SSUB)], True
    return None


def _split_sensitive(items):
    """items -> (plain_prefix, sensitive_middle, plain_suffix)."""
    sens = [j for j, (_r, _k, m) in enumerate(items) if m != _SEG_PLAIN]
    if not sens:
        return items, [], []
    return items[: sens[0]], items[sens[0] : sens[-1] + 1], items[sens[-1] + 1 :]


@functools.lru_cache(maxsize=None)
def build_compact_plan(spec: TapeSpec):
    """Static analysis: tape -> compact plan dict, or None.

    Plan layout (all leaf/row/op content static; only the per-tile active
    sets are runtime data):
      pool     — group indices of the GLOBAL free pool: every root-level
                 hard-union operand that folds to plain items, plus the
                 plain SUFFIXES of sensitive root operands (a suffix
                 commutes out through the root min). One type-grouped
                 straight-line loop each — the fast path.
      seg1     — single sensitive root operand: its plain prefix as
                 per-segment free groups + one ordered group (the prefix
                 must finish before the ordered fold, so it cannot join
                 the global pool).
      stream   — >=2 sensitive root operands: their prefix+ordered items
                 in sid-tagged ordered groups of <= 8 segments each (a
                 tuple of group indices; sids must be UNIQUE within a
                 group — see _pack_seg_entry); each group's evaluator is
                 one fori_loop with (acc_out, acc_seg) carries, folding
                 acc_seg into acc_out at each segment boundary (sid
                 change). N spatially-local smooth clusters therefore cost
                 ceil(N/8) loops of O(total active), not N loops.
      residual_ops — root operands with no exact fold (intersections,
                 round/onion, double-sensitive unions): unrolled trees in
                 which fully-foldable subtrees still become ISO segments
                 ("seg" pseudo-leaves) with their own groups.

    Returns None when the scene has no static tape or segmentation covers
    too few leaves to pay for itself (then the gated O(L) evaluator runs).
    """
    if not spec.static_tape:
        return None
    from .sdf import _static_tree

    root = _static_tree(spec)
    if root is None:
        return None

    row_types = {r: (t, rot) for r, t, rot in _leaf_static_rows(spec)}
    groups: list[dict] = []
    segments: list[tuple[int, ...]] = []  # iso segments (group idx tuples)
    offset = 0

    def add_free_groups(items):
        nonlocal offset
        idxs = []
        by_type: dict[int, list[int]] = {}
        for row, _k, _m in items:
            by_type.setdefault(row_types[row][0], []).append(row)
        for t in sorted(by_type):
            rows = tuple(by_type[t])
            groups.append(
                dict(
                    ordered=False,
                    rows=rows,
                    entries=rows,
                    offset=offset,
                    count_idx=len(groups),
                    ltype=t,
                    rotated=bool(spec.rotated_types[t]),
                    types=(),
                    stream=False,
                )
            )
            idxs.append(len(groups) - 1)
            offset += len(rows)
        return idxs

    def add_ordered_group(tagged_items, stream):
        """tagged_items = [(row, kidx, mode, sid)] in fold order."""
        nonlocal offset
        types: list[int] = []
        rows, entries = [], []
        for row, kidx, mode, sid in tagged_items:
            t, _rot = row_types[row]
            if t not in types:
                types.append(t)
            rows.append(row)
            entries.append(
                _pack_seg_entry(row, types.index(t), mode, sid % 8, kidx)
            )
        groups.append(
            dict(
                ordered=True,
                rows=tuple(rows),
                entries=tuple(entries),
                offset=offset,
                count_idx=len(groups),
                ltype=-1,
                rotated=False,
                types=tuple((t, bool(spec.rotated_types[t])) for t in types),
                stream=stream,
            )
        )
        offset += len(tagged_items)
        return len(groups) - 1

    def walk(node):
        """Residual-subtree walk: foldable subtrees become ISO segments."""
        kind, i, payload, _rows = node
        if kind == "leaf":
            return ("leaf", payload)
        r = _lin_subtree(node)
        if r is not None and len(r[0]) >= 2:
            pre, mid, suf = _split_sensitive(r[0])
            idxs = add_free_groups(pre)
            if mid:
                idxs.append(
                    add_ordered_group(
                        [(ro, k, m, 0) for (ro, k, m) in mid], stream=False
                    )
                )
            idxs += add_free_groups(suf)
            segments.append(tuple(idxs))
            return ("seg", len(segments) - 1)
        if kind in (oc.COP_ROUND, oc.COP_ONION):
            return (kind, i, (walk(payload[0]),))
        return (kind, i, (walk(payload[0]), walk(payload[1])))

    def flatten_union(node):
        if node[0] == oc.COP_UNION:
            return flatten_union(node[2][0]) + flatten_union(node[2][1])
        return [node]

    # Root-level hard-union flatten + operand classification.
    plain_items: list = []
    sensitive: list = []  # per sensitive operand: its prefix+ordered items
    residual_nodes: list = []
    for nd in flatten_union(root):
        r = _lin_subtree(nd)
        if r is None:
            residual_nodes.append(nd)
            continue
        items, sens = r
        if not sens:
            plain_items += items
            continue
        pre, mid, suf = _split_sensitive(items)
        plain_items += suf  # commutes out through the root min
        sensitive.append(pre + mid)

    pool = tuple(add_free_groups(plain_items))
    seg1 = None
    stream: tuple = ()
    if len(sensitive) == 1:
        pre, mid, _ = _split_sensitive(sensitive[0])
        idxs = add_free_groups(pre)
        idxs.append(
            add_ordered_group(
                [(ro, k, m, 0) for (ro, k, m) in mid], stream=False
            )
        )
        seg1 = tuple(idxs)
    elif len(sensitive) > 1:
        # Chunk into groups of <= 8 segments so every segment in a group
        # has a unique 3-bit sid: boundary detection in run_stream compares
        # sids of list-ADJACENT items, and per-tile culling can make ANY
        # two of a group's segments adjacent (see _pack_seg_entry).
        stream_idxs = []
        for c0 in range(0, len(sensitive), 8):
            chunk = sensitive[c0 : c0 + 8]
            tagged = [
                (ro, k, m, si)
                for si, items in enumerate(chunk)
                for (ro, k, m) in items
            ]
            stream_idxs.append(add_ordered_group(tagged, stream=True))
        stream = tuple(stream_idxs)

    residual_ops = tuple(walk(nd) for nd in residual_nodes)

    seg_leaves = offset
    n_pushed = sum(
        1 for (cop, _a, _s) in spec.static_tape if cop == oc.COP_PUSH
    )
    # Worth compacting only when segments carry the bulk of the leaves;
    # otherwise the plan is the unrolled path plus loop overhead.
    if seg_leaves < max(2, n_pushed // 2):
        return None

    return dict(
        groups=tuple(groups),
        segments=tuple(segments),
        pool=pool,
        seg1=seg1,
        stream=stream,
        residual_ops=residual_ops,
        n_items=offset,
        n_counts=len(groups),
    )


def compactable_spec(spec: TapeSpec) -> bool:
    """True when the static tape admits a useful segmented compact plan
    (see build_compact_plan) — the O(active) evaluation path. Materials
    don't matter here: this path only computes distances; the color winner
    runs through the static color tree at hit pixels as before."""
    return build_compact_plan(spec) is not None


def make_compact_refiner(plan):
    """Second-level list refinement (round 5): kernels whose SMEM list
    super-tiles were budget-coarsened far beyond the kernel tile re-compact
    the tile's list ONCE per kernel invocation against the per-tile cull
    BITMASK (which lives at much finer granularity than the big lists —
    masks are a few words/tile, lists are n_items words/tile). The refined
    list lands in per-invocation SMEM scratch; every march step then loops
    the tile's TRUE active count instead of the super-tile's inflated one
    (at 1024 leaves/1080p the budget forces 256x256-px list tiles whose
    mean active count is 28 with p90=150 — the refiner collapses that back
    to the fine-mask activity, measured mean ~2).

    Returns refine(clist_ref, ccount_ref, tid, cull, rlist_ref, rcount_ref)
    writing rlist (s32[n_items] scratch) / rcount (s32[n_counts] scratch).
    Exactness: refined = coarse-tile list ∩ fine-mask active set, order
    preserved — the same active set (and fold-order) the host would have
    produced at mask granularity, so the FAR-substitution lemma applies
    unchanged.
    """
    groups = plan["groups"]

    def refine(clist_ref, ccount_ref, tid, cull, rlist_ref, rcount_ref):
        for g in groups:
            off = g["offset"]
            cidx = g["count_idx"]

            def body(j, cnt, _off=off):
                # Branchless compaction: always store at the write cursor,
                # advance it only for kept items — dropped entries are
                # overwritten by the next kept one and trailing garbage
                # past the final count is never read.
                e = clist_ref[tid, _off + j]
                rlist_ref[_off + cnt] = e
                keep = cull.leaf(e & 1023)
                return cnt + jnp.where(keep, 1, 0)

            cnt = jax.lax.fori_loop(
                0, ccount_ref[tid, cidx], body, jnp.int32(0)
            )
            rcount_ref[cidx] = cnt

    return refine


def _make_scene_eval_compact(spec: TapeSpec, cfg: RenderConfig, plan,
                             refined: bool = False):
    """O(active-leaves) distance evaluator over a segmented compact plan.

    Why this exists: per-tile leaf culling via scalar `lax.cond` gates does
    not actually shrink the many-leaf kernels — measured at 64 leaves the
    packed fine kernel costs the same ~10 us/grid-step whether the tile's
    mask is full, empty, or the gates are restructured (GATE_MAX 4..64),
    i.e. the O(n_leaves) unrolled body is paid regardless of the branches
    around it. The robust fix is to make the work O(active) through DATA
    instead of branches: the host compacts each tile's active-leaf mask
    into dense per-group item lists (culling.compact_plan_rows) and the
    kernel runs fori_loops with RUNTIME trip counts = the tile's active
    counts. Code size is O(groups + residual), executed work O(active).

    Exactness: identical active set as the gated path (same masks), and
    per-item skipping of culled leaves is bitwise-exact for every fold
    mode (see the module comment above build_compact_plan). The residual
    combine structure replays sdf._combine_static exactly.

    Returns scene_eval(lp_ref, opp_ref, clist_ref, ccount_ref, tid,
    px, py, pz). `clist_ref` is s32[T, plan.n_items] (group g's entries at
    columns [offset, offset+len), active-first, relative order preserved);
    `ccount_ref` is s32[T, plan.n_counts]."""
    from .culling import FAR

    row_types = {r: (t, rot) for r, t, rot in _leaf_static_rows(spec)}

    def scene_eval(lp_ref, opp_ref, clist_ref, ccount_ref, tid, px, py, pz):
        far_tile = px * 0.0 + FAR

        # List accessors: 2-D host lists indexed by the tile id, or the
        # 1-D per-invocation refined scratch (make_compact_refiner).
        if refined:
            def LST(k):
                return clist_ref[k]

            def CNT(ci):
                return ccount_ref[ci]
        else:
            def LST(k):
                return clist_ref[tid, k]

            def CNT(ci):
                return ccount_ref[tid, ci]

        def run_free(g, d):
            def body(j, acc, _g=g):
                row = LST(_g["offset"] + j)
                dv = _leaf_distance_tile(
                    lp_ref, row, _g["ltype"], _g["rotated"], px, py, pz
                )
                return jnp.minimum(acc, dv)

            return jax.lax.fori_loop(
                0, CNT(g["count_idx"]), body, d
            )

        def item_leaf(g, e):
            """Leaf distance for one ordered entry (static type table)."""
            row = e & 1023
            types = g["types"]
            if len(types) == 1:
                t0, rot0 = types[0]
                return _leaf_distance_tile(lp_ref, row, t0, rot0, px, py, pz)
            tsel = (e >> 10) & 7
            return jax.lax.switch(
                tsel,
                [
                    (
                        lambda _t=t, _ro=ro: _leaf_distance_tile(
                            lp_ref, row, _t, _ro, px, py, pz
                        )
                    )
                    for (t, ro) in types
                ],
            )

        def fold_step(acc, e, dv):
            """One fold step; exact hard op for mode 0/2, iq blend else."""
            mode = (e >> 13) & 3
            ki = e >> 18
            kp = opp_ref[jnp.maximum(ki - 1, 0)]
            kk = jnp.maximum(kp, 1e-8)
            is_sub = mode >= 2
            is_smooth = (mode & 1) == 1
            hard = jnp.where(
                is_sub, jnp.maximum(acc, -dv), jnp.minimum(acc, dv)
            )
            diff = jnp.where(is_sub, acc + dv, acc - dv)
            h = jnp.maximum(kk - jnp.abs(diff), 0.0) / kk
            corr = h * h * kk * 0.25
            soft = jnp.where(is_sub, hard + corr, hard - corr)
            return jnp.where(is_smooth, soft, hard)

        def run_ordered(g, d):
            def body(j, acc, _g=g):
                e = LST(_g["offset"] + j)
                return fold_step(acc, e, item_leaf(_g, e))

            return jax.lax.fori_loop(
                0, CNT(g["count_idx"]), body, d
            )

        def run_stream(g, d_out):
            # Multi-segment stream: fold acc_seg across items, flushing it
            # into acc_out at each segment boundary (sid change). Item
            # dropout (culling) never loses a boundary: sid is per-item.
            def body(j, carry, _g=g):
                acc_out, acc_seg, prev = carry
                e = LST(_g["offset"] + j)
                sid = (e >> 15) & 7
                new_seg = sid != prev
                acc_out = jnp.where(
                    new_seg, jnp.minimum(acc_out, acc_seg), acc_out
                )
                acc_seg = jnp.where(new_seg, far_tile, acc_seg)
                acc_seg = fold_step(acc_seg, e, item_leaf(_g, e))
                return (acc_out, acc_seg, sid)

            acc_out, acc_seg, _ = jax.lax.fori_loop(
                0,
                CNT(g["count_idx"]),
                body,
                (d_out, far_tile, jnp.int32(-1)),
            )
            return jnp.minimum(acc_out, acc_seg)

        def eval_group_chain(idxs):
            d = far_tile
            for gi in idxs:
                g = plan["groups"][gi]
                d = run_ordered(g, d) if g["ordered"] else run_free(g, d)
            return d

        def eval_node(node):
            kind = node[0]
            if kind == "leaf":
                t, rot = row_types[node[1]]
                return _leaf_distance_tile(
                    lp_ref, node[1], t, rot, px, py, pz
                )
            if kind == "seg":
                return eval_group_chain(plan["segments"][node[1]])
            cop, i, children = node
            kp = opp_ref[i]
            if cop == oc.COP_ROUND:
                return eval_node(children[0]) - kp
            if cop == oc.COP_ONION:
                return jnp.abs(eval_node(children[0])) - kp
            a = eval_node(children[0])
            b = eval_node(children[1])
            from .sdf import _combine_static

            return _combine_static(cop, a, b, kp)

        d = far_tile
        for gi in plan["pool"]:
            d = run_free(plan["groups"][gi], d)
        if plan["seg1"] is not None:
            d = jnp.minimum(d, eval_group_chain(plan["seg1"]))
        for gi in plan["stream"]:
            d = run_stream(plan["groups"][gi], d)
        for nd in plan["residual_ops"]:
            d = jnp.minimum(d, eval_node(nd))
        return d

    return scene_eval


def _combine_branches():
    """Combine-op branch table, indexed by COP_* (pure; operates on tiles)."""

    def smin(a, b, k):
        k = jnp.maximum(k, 1e-8)
        h = jnp.maximum(k - jnp.abs(a - b), 0.0) / k
        return jnp.minimum(a, b) - h * h * k * 0.25

    return [
        lambda a, b, leaf, k: a,  # NOP
        lambda a, b, leaf, k: leaf,  # PUSH
        lambda a, b, leaf, k: jnp.minimum(a, b),  # UNION
        lambda a, b, leaf, k: jnp.maximum(a, b),  # INTERSECTION
        lambda a, b, leaf, k: jnp.maximum(a, -b),  # SUBTRACTION
        lambda a, b, leaf, k: smin(a, b, k),  # SMOOTH_UNION
        lambda a, b, leaf, k: -smin(-a, -b, k),  # SMOOTH_INTERSECTION
        lambda a, b, leaf, k: -smin(-a, b, k),  # SMOOTH_SUBTRACTION
        lambda a, b, leaf, k: a - k,  # ROUND
        lambda a, b, leaf, k: jnp.abs(a) - k,  # ONION
    ]


def _make_scene_eval(spec: TapeSpec, cfg: RenderConfig, leaf_rows, bm: int = BM):
    """Build scene_eval(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
    scratch, px, py, pz[, cull]) -> d tile. `scratch` is (D_ref,)
    for the dynamic tape, or () for a static tape (pure register dataflow).
    `cull` (optional) is a per-tile active-leaf accessor row -> scalar bool
    from ops.culling.make_cull_reader."""
    if spec.static_tape is not None:
        row_types = {r: (t, rot) for r, t, rot in leaf_rows}
        from .sdf import _apply_static_tape

        def scene_eval_static(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz, cull=None):
            # Leaves evaluated lazily at their PUSH site; the whole combine
            # phase unrolls into straight-line VPU code, params from SMEM.
            # `cull` gates whole subtrees inside the applier (ops.sdf).
            def leaf_fn(row):
                t, rot = row_types[row]
                return _leaf_distance_tile(lp_ref, row, t, rot, px, py, pz)

            return _apply_static_tape(
                spec, opp_ref, leaf_fn, cfg.max_dist, px, cull=cull
            )

        return scene_eval_static

    sd = spec.stack_depth
    rows_sorted = sorted(leaf_rows, key=lambda r: r[0])
    branches = _combine_branches()

    # MACRO interpreter for dynamic tapes. The kernels prefetch the fused
    # macro streams (ops.tape.macroize_streams) instead of the raw
    # instruction streams: each entry is (pushA?, pushB?, combine) — a
    # push/push/combine triple costs ONE entry. Per-entry fixed cost
    # (branch constructs + stack-slot vselects) is what the dynamic path
    # pays over the static unroll per distance query, measured ~3 ms/entry
    # at 1080p march-only, so halving entries halves the gap.
    #
    # Two forms, chosen statically from the spec:
    # - macro_slot0 (depth<=2 trees, the common interactive case): every
    #   real macro writes slot 0 and every binary's right operand is a
    #   fresh push (encoder invariant), so the whole stack collapses to one
    #   register accumulator — ZERO slot selects.
    # - general: slot-selected reads/writes like the classic form, over
    #   ~half the entries.
    #
    # Leaves are evaluated lazily inside the push branches (lax.switch over
    # the static rows), so each eval pays only the leaves it uses and
    # `cull` gates whole rows. The loop unrolls the PADDED macro bucket:
    # topology edits recompile nothing.
    # (init derived from px, not jnp.full: Mosaic rejects replicated-
    # constant vectors meeting data-dependent layouts, see _march_tile)
    def scene_eval(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz, cull=None):
        def leaf_closure(row, ltype, rotated):
            def run():
                return _leaf_distance_tile(
                    lp_ref, row, ltype, rotated, px, py, pz
                )

            if cull is None:
                return run
            from .culling import FAR

            return lambda: jax.lax.cond(
                cull.leaf(row), run, lambda: px * 0.0 + FAR
            )

        leaf_fns = [leaf_closure(r, t, ro) for r, t, ro in rows_sorted]

        far = px * 0.0 + cfg.max_dist

        def leaf_switch(arg):
            if not leaf_fns:  # empty scene: push flags are never set
                return far
            if len(leaf_fns) == 1:
                return leaf_fns[0]()
            return jax.lax.switch(arg, leaf_fns)

        def combine(cop, a, b, kp):
            return jax.lax.switch(
                cop,
                [
                    lambda: a,  # NOP (pure-push / padding macros)
                    lambda: a,  # (PUSH never appears as a macro combine)
                    lambda: jnp.minimum(a, b),
                    lambda: jnp.maximum(a, b),
                    lambda: jnp.maximum(a, -b),
                    lambda: branches[oc.COP_SMOOTH_UNION](a, b, None, kp),
                    lambda: branches[oc.COP_SMOOTH_INTERSECTION](a, b, None, kp),
                    lambda: branches[oc.COP_SMOOTH_SUBTRACTION](a, b, None, kp),
                    lambda: a - kp,
                    lambda: jnp.abs(a) - kp,
                ],
            )

        # EARLY EXIT at the padding tail: bucketed macro streams pad with
        # all-zero entries (no pushes, COP_NOP — a real macro always has a
        # push bit or cop >= 2), and padding is CONTIGUOUS at the end. The
        # entries nest: entry k's guard `packed != 0` either stops (one
        # scalar branch pays for the WHOLE tail) or runs entry k and the
        # nested remainder. Executed per-query cost is therefore
        # O(real entries), not O(bucket) — at the default bucket slack
        # (up to 2x) this halves the dynamic interpreter's dispatch bill.
        # Program size still covers the full bucket: edits never recompile.
        if spec.macro_slot0:
            # Accumulator interpreter (depth<=2 tapes, the common
            # interactive case). Scalar-core branch constructs stall the
            # vector pipeline per entry, so each operand's push-cond FUSES
            # into its leaf switch: one lax.switch whose extra final branch
            # returns the accumulator (resp. far) when the push flag is
            # clear — 3 constructs per entry (a-switch, b-switch, combine)
            # instead of 5. (Two fully-vectorized alternatives — upfront
            # all-leaf tiles + vselect operand/combine selection — were
            # measured SLOWER: padding bank rows make the eager leaf evals
            # O(bucket) per query, and the all-candidate combine wastes
            # ~25 vector ops/entry. The lazy switch evaluates only the
            # leaf it uses.)
            n_fns = len(leaf_fns)

            def entry_slot0(k, acc):
                packed = ops_ref[k]
                marg = arg_ref[k]
                kp = opp_ref[slot_ref[k] >> 8]
                a_idx = jnp.where((packed & 1) > 0, marg >> 10, n_fns)
                a = jax.lax.switch(
                    a_idx, leaf_fns + [lambda acc=acc: acc]
                )
                # b is only consumed by binary combines, which always carry
                # pushB in slot0 tapes (see macroize_streams).
                b_idx = jnp.where((packed & 2) > 0, marg & 1023, n_fns)
                b = jax.lax.switch(b_idx, leaf_fns + [lambda: far])
                return combine(packed >> 2, a, b, kp)

            def run_from_slot0(k, acc):
                if k == spec.n_macro:
                    return acc
                return jax.lax.cond(
                    ops_ref[k] == 0,
                    lambda acc=acc: acc,
                    lambda k=k, acc=acc: run_from_slot0(
                        k + 1, entry_slot0(k, acc)
                    ),
                )

            return run_from_slot0(0, far)

        def entry_gen(k, stack):
            packed = ops_ref[k]
            marg = arg_ref[k]
            slotk = slot_ref[k]
            slot = slotk & 255
            kp = opp_ref[slotk >> 8]
            a0 = stack[0]
            b0 = stack[1]
            for i in range(1, sd):
                sel = slot == i
                a0 = jnp.where(sel, stack[i], a0)
                b0 = jnp.where(sel, stack[i + 1], b0)
            a = jax.lax.cond(
                (packed & 1) > 0,
                lambda marg=marg: leaf_switch(marg >> 10),
                lambda a0=a0: a0,
            )
            b = jax.lax.cond(
                (packed & 2) > 0,
                lambda marg=marg: leaf_switch(marg & 1023),
                lambda b0=b0: b0,
            )
            val = combine(packed >> 2, a, b, kp)
            return tuple(
                jnp.where(slot == i, val, stack[i]) for i in range(sd)
            ) + (stack[sd],)

        def run_from_gen(k, stack):
            if k == spec.n_macro:
                return stack
            return jax.lax.cond(
                ops_ref[k] == 0,
                lambda stack=stack: stack,
                lambda k=k, stack=stack: run_from_gen(
                    k + 1, entry_gen(k, stack)
                ),
            )

        stack0 = tuple(far for _ in range(sd + 1))
        return run_from_gen(0, stack0)[0]

    return scene_eval


def _make_scene_color_eval(spec: TapeSpec, cfg: RenderConfig, leaf_rows, bm: int = BM):
    """Scene evaluation WITH material propagation:
    color_eval(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, px, py, pz)
    -> (d, r, g, b) tiles/scalars. Selection/blend rules mirror
    oracle.eval_tape_color. Static tapes unroll (ops.sdf); dynamic tapes run
    the register-stack interpreter below with a 4-channel stack — the
    kernels call this once per hit tile (not per march step), so the
    interpreter overhead is immaterial here."""
    row_types = {r: (t, rot) for r, t, rot in leaf_rows}
    ax, ay, az = cfg.albedo
    A0 = oc.LEAF_ALBEDO
    AF = oc.LEAF_MAT_FLAG

    def leaf_rgb_scalars(lp_ref, row):
        flag = lp_ref[row, AF]
        r = flag * lp_ref[row, A0] + (1.0 - flag) * ax
        g = flag * lp_ref[row, A0 + 1] + (1.0 - flag) * ay
        b = flag * lp_ref[row, A0 + 2] + (1.0 - flag) * az
        return r, g, b

    if spec.static_tape is not None:
        from .sdf import _apply_static_tape_color

        def color_eval(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                       px, py, pz, cull=None):
            def leaf_fn(row):
                t, rot = row_types[row]
                d = _leaf_distance_tile(lp_ref, row, t, rot, px, py, pz)
                return d, leaf_rgb_scalars(lp_ref, row)

            d, (r, g, b) = _apply_static_tape_color(
                spec, opp_ref, leaf_fn, cfg.max_dist, px, (ax, ay, az),
                cull=cull,
            )
            return d, r, g, b

        return color_eval

    from .sdf import _mat_weight_smooth, smooth_max, smooth_min

    sd = spec.stack_depth
    rows_sorted = sorted(leaf_rows, key=lambda r: r[0])

    def color_eval(lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                   px, py, pz, cull=None):
        # Dynamic-tape MACRO interpreter with a 4-channel (d, r, g, b)
        # register stack; consumes the same fused macro streams as
        # _make_scene_eval (general form only — this runs once per hit tile,
        # so the slot0 specialization is not worth a second code path).
        # Winner/blend weights mirror oracle.eval_tape_color.
        def leaf_closure(row, ltype, rotated):
            def run():
                d = _leaf_distance_tile(lp_ref, row, ltype, rotated, px, py, pz)
                r, g, b = leaf_rgb_scalars(lp_ref, row)
                z = d * 0.0
                return d, z + r, z + g, z + b

            if cull is None:
                return run
            from .culling import FAR

            def culled():
                z = px * 0.0
                return z + FAR, z + ax, z + ay, z + az

            return lambda: jax.lax.cond(cull.leaf(row), run, culled)

        leaf_fns = [leaf_closure(r, t, ro) for r, t, ro in rows_sorted]

        far = px * 0.0 + cfg.max_dist
        zero = px * 0.0
        stack = [
            (far, zero + ax, zero + ay, zero + az) for _ in range(sd + 1)
        ]

        def blend(v, w, ca, cb):
            return (
                v,
                w * ca[0] + (1.0 - w) * cb[0],
                w * ca[1] + (1.0 - w) * cb[1],
                w * ca[2] + (1.0 - w) * cb[2],
            )

        def leaf_switch(arg):
            if not leaf_fns:  # empty scene: push flags are never set
                return stack[0]
            if len(leaf_fns) == 1:
                return leaf_fns[0]()
            return jax.lax.switch(arg, leaf_fns)

        for k in range(spec.n_macro):
            packed = ops_ref[k]
            marg = arg_ref[k]
            slotk = slot_ref[k]
            slot = slotk & 255
            kp = opp_ref[slotk >> 8]
            a = stack[0]
            b = stack[1]
            for i in range(1, sd):
                sel = slot == i
                a = tuple(
                    jnp.where(sel, x, y) for x, y in zip(stack[i], a)
                )
                b = tuple(
                    jnp.where(sel, x, y) for x, y in zip(stack[i + 1], b)
                )
            a = jax.lax.cond(
                (packed & 1) > 0,
                lambda marg=marg: leaf_switch(marg >> 10),
                lambda a=a: a,
            )
            b = jax.lax.cond(
                (packed & 2) > 0,
                lambda marg=marg: leaf_switch(marg & 1023),
                lambda b=b: b,
            )
            da, ca = a[0], a[1:]
            db, cb = b[0], b[1:]

            val = jax.lax.switch(
                packed >> 2,
                [
                    lambda: a,  # NOP (pure-push / padding macros)
                    lambda: a,  # (PUSH never appears as a macro combine)
                    lambda: blend(
                        jnp.minimum(da, db),
                        jnp.where(da <= db, 1.0, 0.0), ca, cb,
                    ),
                    lambda: blend(
                        jnp.maximum(da, db),
                        jnp.where(da >= db, 1.0, 0.0), ca, cb,
                    ),
                    lambda: blend(
                        jnp.maximum(da, -db),
                        jnp.where(da >= -db, 1.0, 0.0), ca, cb,
                    ),
                    lambda: blend(
                        smooth_min(da, db, kp),
                        _mat_weight_smooth(da, db, kp), ca, cb,
                    ),
                    lambda: blend(
                        smooth_max(da, db, kp),
                        _mat_weight_smooth(db, da, kp), ca, cb,
                    ),
                    lambda: blend(
                        smooth_max(da, -db, kp),
                        _mat_weight_smooth(-db, da, kp), ca, cb,
                    ),
                    lambda: (da - kp,) + ca,  # ROUND
                    lambda: (jnp.abs(da) - kp,) + ca,  # ONION
                ],
            )
            for i in range(sd):
                sel = slot == i
                stack[i] = tuple(
                    jnp.where(sel, x, y) for x, y in zip(val, stack[i])
                )
        d, r, g, b = stack[0]
        return d, r, g, b

    return color_eval


# Leaf count at and above which kernels trace the 4 tetrahedron normal taps
# through ONE fori_loop body instead of unrolling 4 copies of the (gated,
# O(n_leaves)-sized) scene evaluation. Mosaic inlines everything — there are
# no subroutine calls — so each extra scene instantiation grows the program
# linearly, and past IMEM capacity the core streams instructions per grid
# step: at 64 leaves the packed fine kernel costs ~10 us/step even for tiles
# whose every leaf is culled (measured; see ARCHITECTURE.md many-primitive
# notes). Below the threshold the unrolled form stays: it lets Mosaic
# software-pipeline the taps and the loop's carried tiles cost more than the
# duplicated small-scene code.
TAP_LOOP_MIN_LEAVES = 16


def _tet_taps(scene, px, py, pz, eps, loop):
    """Tetrahedron normal-gradient taps (reference wgsl:135-144): returns
    unnormalized (nx, ny, nz) = sum_k k * scene(p + k*eps) over the 4
    even-parity cube corners k. `loop=True` evaluates the 4 taps in a
    fori_loop so the scene body is traced (and codegen'd) once; the
    accumulation order and per-tap float ops match the unrolled form
    exactly, so both forms produce bitwise-identical normals."""
    if not loop:
        nx = px * 0.0
        ny = nx
        nz = nx
        for kx, ky, kz in (
            (1.0, -1.0, -1.0),
            (-1.0, -1.0, 1.0),
            (-1.0, 1.0, -1.0),
            (1.0, 1.0, 1.0),
        ):
            dval = scene(px + kx * eps, py + ky * eps, pz + kz * eps)
            nx = nx + kx * dval
            ny = ny + ky * dval
            nz = nz + kz * dval
        return nx, ny, nz

    def body(i, acc):
        nx, ny, nz = acc
        # Corner signs from the tap index: i=0 -> (+,-,-), 1 -> (-,-,+),
        # 2 -> (-,+,-), 3 -> (+,+,+).
        b0 = i & 1
        b1 = i >> 1
        kx = jnp.where(b0 == b1, 1.0, -1.0)
        ky = jnp.where(b1 == 1, 1.0, -1.0)
        kz = jnp.where(b0 == 1, 1.0, -1.0)
        dval = scene(px + kx * eps, py + ky * eps, pz + kz * eps)
        return (nx + kx * dval, ny + ky * dval, nz + kz * dval)

    z = px * 0.0
    return jax.lax.fori_loop(0, 4, body, (z, z, z))


def _march_tile(
    scene_eval_bound, ox, oy, oz, dx, dy, dz, cfg: RenderConfig, bound=None
):
    """Masked sphere tracing for one tile; returns (t, hit, steps) f32 tiles.

    All loop-carried state is f32 ({0,1} masks as floats) and every carried
    vector is initialized FROM THE RAY DATA (`ox * 0.0`), not from
    jnp.zeros/ones: Mosaic's layout inference assigns replicated layouts to
    broadcast constants and then fails with "Invalid relayout: ... replicated
    in destination but not in source" when the loop body produces a normal
    (non-replicated) layout for the same carry slot.

    `bound` = (bcx, bcy, bcz, bR, bvalid) scalars: a conservative scene
    bounding sphere (see `compute_bound`). Rays missing it never march
    (0 scene evals); the rest start at the bound entry and escape at its
    exit. With bvalid == 0 (or bound=None) behavior is exactly the plain
    march, so hit/t results are identical either way — the bound is
    conservative and the SDF is globally valid outside the surface.
    """
    zero = dx * 0.0  # dx is data/iota-derived in both kernels (never replicated)

    t_init = zero
    live_init = zero + 1.0
    # No t-based escape unless the bound is active (the reference escapes on
    # d > max_dist only; e.g. plane scenes march with small d while t grows).
    t_cap = zero + 3.0e38
    if bound is not None:
        bcx, bcy, bcz, br, bvalid = bound
        ocx = ox - bcx
        ocy = oy - bcy
        ocz = oz - bcz
        bq = dx * ocx + dy * ocy + dz * ocz
        c2 = ocx * ocx + ocy * ocy + ocz * ocz - br * br
        disc = bq * bq - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_enter = -bq - sq
        t_exit = -bq + sq
        hit_bound = jnp.where(
            jnp.logical_and(disc > 0.0, t_exit > 0.0), live_init, 0.0
        )
        use = bvalid > 0.0  # traced scalar -> jnp.where on tiles
        live_init = jnp.where(use, hit_bound, live_init)
        t_init = jnp.where(use, jnp.maximum(t_enter, 0.0) * hit_bound, t_init)
        t_cap = jnp.where(use, t_exit + cfg.min_dist, t_cap)

    if cfg.relax > 1.0:
        # Over-relaxed sphere tracing (Keinert et al. 2014, alg. 2): step
        # omega*d; if the consecutive safe spheres stop overlapping
        # (d + d_prev < step), the relaxed step overshot — step back and
        # drop that ray to omega=1 for the rest of the march. Hits are
        # detected only at non-overshot samples, so results stay exact
        # sphere tracing (modulo sample-sequence sensitivity at grazing).
        def cond_r(state):
            k, _, _, _, _, live, _, _ = state
            return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

        def body_r(state):
            k, t, prev_r, step_len, omega, live, hit, steps = state
            px = ox + dx * t
            py = oy + dy * t
            pz = oz + dz * t
            d = scene_eval_bound(px, py, pz)
            fail = jnp.where(
                jnp.logical_and(omega > 1.0, d + prev_r < step_len), live, 0.0
            )
            ok = live - fail
            new_step = jnp.where(fail > 0.0, (1.0 - cfg.relax) * step_len, omega * d)
            omega2 = jnp.where(fail > 0.0, 1.0, omega)
            hit_now = jnp.where(d < cfg.min_dist, ok, 0.0)
            escaped = jnp.where(
                jnp.logical_or(d > cfg.max_dist, t > t_cap), ok, 0.0
            )
            escaped = escaped - escaped * hit_now
            live2 = live - hit_now - escaped
            t2 = t + new_step * live2
            return (k + 1, t2, d, new_step, omega2, live2, hit + hit_now, steps + live)

        state = (
            jnp.int32(0),
            t_init,
            zero,  # prev_radius
            zero,  # step_length
            zero + cfg.relax,  # per-ray omega
            live_init,
            zero,
            zero,
        )
        _, t, _, _, _, _, hit, steps = jax.lax.while_loop(cond_r, body_r, state)
        return t, hit, steps

    def cond(state):
        k, _, live, _, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    def step(state):
        k, t, live, hit, steps = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene_eval_bound(px, py, pz)
        # act: live rays within the iteration budget (the inner K-block can
        # run past max_iter; those steps must be no-ops for exact parity
        # with the reference's <= max_iter evaluations).
        act = jnp.where(k < cfg.max_iter, live, live * 0.0)
        hit_now = jnp.where(d < cfg.min_dist, act, 0.0)
        escaped = jnp.where(
            jnp.logical_or(d > cfg.max_dist, t > t_cap), act, 0.0
        )
        escaped = escaped - escaped * hit_now  # hit wins on the boundary
        advance = act - hit_now - escaped
        t2 = t + d * advance
        return (k + 1, t2, live - hit_now - escaped, hit + hit_now, steps + act)

    K = max(1, int(cfg.exit_check_every))

    if K == 1:
        body = step
    else:
        # Amortize the exit-check reduction + scalar branch over K pure
        # vector steps (masked lanes are no-ops, so extra steps are cheap;
        # the reduction stall is not).
        def body(state):
            return jax.lax.fori_loop(0, K, lambda _, s: step(s), state)

    state = (jnp.int32(0), t_init, live_init, zero, zero)
    _, t, _, hit, steps = jax.lax.while_loop(cond, body, state)
    return t, hit, steps


def compute_bound(spec: TapeSpec, arrays: TapeArrays):
    """Conservative scene bounding sphere -> f32[8] = (cx,cy,cz,R,valid,0,0,0).

    Built from the leaf banks with jnp ops (so runtime edits update it with
    no recompilation). Per-leaf conservative radius: sphere r; box |he|;
    torus R+r. Smooth/round/onion op params can push the surface outward, so
    the sum of |op_param| is added. Planes are unbounded => valid=0 and the
    acceleration disables itself. Subtraction/intersection only shrink.
    """
    import numpy as _np

    rows = []  # (row, leaf_type)
    if spec.static_tape is not None:
        pushed = {arg for cop, arg, _ in spec.static_tape if cop == oc.COP_PUSH}
    else:
        pushed = None
    has_plane = False
    for t, start, stop in spec.type_slices:
        for r in range(start, stop):
            if pushed is not None and r not in pushed:
                continue
            if t == oc.LEAF_PLANE:
                has_plane = True
            rows.append((r, t))

    lp = jnp.asarray(arrays.leaf_params)
    if not rows or has_plane:
        return jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)

    idx = _np.asarray([r for r, _ in rows])
    types = _np.asarray([t for _, t in rows])
    centers = lp[idx, 4:7]
    r_sphere = lp[idx, 7]
    r_box = jnp.sqrt(jnp.sum(lp[idx, 7:10] ** 2, axis=-1))
    r_torus = lp[idx, 7] + lp[idx, 8]
    r_cyl = jnp.sqrt(lp[idx, 7] ** 2 + lp[idx, 8] ** 2)
    r_cap = lp[idx, 7] + lp[idx, 8]
    r_cone = jnp.sqrt(jnp.maximum(lp[idx, 8], lp[idx, 9]) ** 2 + lp[idx, 7] ** 2)
    types_a = jnp.asarray(types)
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
    center = jnp.mean(centers, axis=0)
    expand = jnp.sum(jnp.abs(jnp.asarray(arrays.op_param)))
    radius = (
        jnp.max(jnp.sqrt(jnp.sum((centers - center) ** 2, axis=-1)) + radii)
        + expand
        + 0.05
    )
    return jnp.concatenate(
        [center, radius[None], jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)]
    ).astype(jnp.float32)


def _scratch_shapes(spec: TapeSpec, bm: int = BM):
    # Both tape forms now evaluate in pure register dataflow: the static
    # tape by construction, the dynamic interpreter via its register stack
    # and lazy in-branch leaf evaluation (see _make_scene_eval).
    return []


@functools.lru_cache(maxsize=None)
def make_pallas_ray_march(
    spec: TapeSpec, cfg: RenderConfig, interpret: bool = False, bm: int = BM
):
    """March explicit rays: fn(arrays, origins[N,3], dirs[N,3]) ->
    (t[N], hit[N], steps[N]). N is padded to a TILE multiple internally."""
    leaf_rows = _leaf_static_rows(spec)
    scene_eval = _make_scene_eval(spec, cfg, leaf_rows, bm)
    tile = bm * LANES

    def kernel(ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, rays_ref, t_ref, hit_ref, steps_ref, *scratch):
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

        def scene(px, py, pz):
            return scene_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz
            )

        bnd = (
            (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            if cfg.bound_accel
            else None
        )
        t, hit, steps = _march_tile(scene, ox, oy, oz, dx, dy, dz, cfg, bnd)
        t_ref[:] = t
        hit_ref[:] = hit
        steps_ref[:] = steps

    def march(arrays: TapeArrays, origins, dirs):
        n = origins.shape[0]
        n_pad = ((n + tile - 1) // tile) * tile
        rays = jnp.concatenate(
            [
                jnp.pad(jnp.asarray(origins, jnp.float32), ((0, n_pad - n), (0, 0))).T,
                jnp.pad(jnp.asarray(dirs, jnp.float32), ((0, n_pad - n), (0, 0))).T,
            ],
            axis=0,
        ).reshape(6, n_pad // LANES, LANES)
        grid = (n_pad // tile,)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (6, bm, LANES), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=_scratch_shapes(spec, bm),
        )
        out_shape = [
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ]
        t, hit, steps = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            jnp.asarray(arrays.macro_ops),
            jnp.asarray(arrays.macro_arg),
            jnp.asarray(arrays.macro_slotk),
            jnp.asarray(arrays.op_param),
            jnp.asarray(arrays.leaf_params),
            compute_bound(spec, arrays),
            rays,
        )
        flat = lambda x: x.reshape(-1)[:n]
        return flat(t), flat(hit), flat(steps).astype(jnp.int32)

    return march


@functools.lru_cache(maxsize=None)
def make_pallas_image_march(
    spec: TapeSpec,
    cfg: RenderConfig,
    width: int,
    height: int,
    interpret: bool = False,
    bm: int = BM,
):
    """March every AA ray of a width x height image with in-kernel raygen:
    fn(arrays, cam_vec f32[8]=(pos3, quat4, 0)) -> (t[N], hit[N], steps[N])
    with N = aa^2 * H * W rays in flat index order (see ops.raygen)."""
    leaf_rows = _leaf_static_rows(spec)
    scene_eval = _make_scene_eval(spec, cfg, leaf_rows, bm)
    tile = bm * LANES
    naa = cfg.aa_samples
    hw = height * width
    total = naa * naa * hw
    n_pad = ((total + tile - 1) // tile) * tile
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height

    def kernel(ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref, t_ref, hit_ref, steps_ref, *scratch):
        pid = pl.program_id(0)
        base = pid * tile
        lin = (
            base
            + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)
        )
        # Decompose pixel-major flat ray index (see ops.raygen):
        # lin = (i*W + j)*S + s.
        S = naa * naa
        p = lin // S
        s = lin - p * S
        i = p // width
        j = p - i * width
        a = s // naa
        b = s - a * naa

        fa = (a.astype(jnp.float32) + 0.5) / naa - 0.5
        fb = (b.astype(jnp.float32) + 0.5) / naa - 0.5
        x = (
            2.0 * (j.astype(jnp.float32) + 0.5) / width
            - 1.0
            + fa * (2.0 / width)
        )
        y = (
            1.0
            - 2.0 * (i.astype(jnp.float32) + 0.5) / height
            + fb * (2.0 / height)
        )

        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full((bm, LANES), -1.0, jnp.float32)
        inv_norm = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        vx = vx * inv_norm
        vy = vy * inv_norm
        vz = vz * inv_norm

        # Rotate view dir into world by camera quaternion (scalars from SMEM).
        qw, qx, qy, qz = cam_ref[3], cam_ref[4], cam_ref[5], cam_ref[6]
        tx = 2.0 * (qy * vz - qz * vy)
        ty = 2.0 * (qz * vx - qx * vz)
        tz = 2.0 * (qx * vy - qy * vx)
        dx = vx + qw * tx + (qy * tz - qz * ty)
        dy = vy + qw * ty + (qz * tx - qx * tz)
        dz = vz + qw * tz + (qx * ty - qy * tx)

        ox = jnp.full((bm, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((bm, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((bm, LANES), cam_ref[2], jnp.float32)

        def scene(px, py, pz):
            return scene_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz
            )

        bnd = (
            (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            if cfg.bound_accel
            else None
        )
        t, hit, steps = _march_tile(scene, ox, oy, oz, dx, dy, dz, cfg, bnd)
        t_ref[:] = t
        hit_ref[:] = hit
        steps_ref[:] = steps

    def march_image(arrays: TapeArrays, cam_vec):
        grid = (n_pad // tile,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[],
            out_specs=[
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=_scratch_shapes(spec, bm),
        )
        out_shape = [
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ]
        t, hit, steps = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            jnp.asarray(arrays.macro_ops),
            jnp.asarray(arrays.macro_arg),
            jnp.asarray(arrays.macro_slotk),
            jnp.asarray(arrays.op_param),
            jnp.asarray(arrays.leaf_params),
            compute_bound(spec, arrays),
            jnp.asarray(cam_vec, jnp.float32),
        )
        flat = lambda x: x.reshape(-1)[:total]
        return flat(t), flat(hit), flat(steps).astype(jnp.int32)

    return march_image


def make_march_pallas(spec: TapeSpec, cfg: RenderConfig, interpret: bool = False):
    """Drop-in replacement for ops.march.make_march with the Pallas forward:
    march(origins, dirs, arrays) -> (t, hit, steps), with the implicit-
    function VJP (jnp scene eval at hit points) for the backward pass."""
    from .sdf import make_scene_fn

    pallas_march = make_pallas_ray_march(spec, cfg, interpret)
    scene = make_scene_fn(spec, cfg)

    @jax.custom_vjp
    def march(origins, dirs, arrays):
        return pallas_march(arrays, origins, dirs)

    def march_fwd(origins, dirs, arrays):
        out = march(origins, dirs, arrays)
        t, hit, _ = out
        return out, (origins, dirs, arrays, t, hit)

    def march_bwd(res, cotangents):
        origins, dirs, arrays, t, hit = res
        gt = cotangents[0]
        pos = origins + dirs * t[:, None]
        _, fdot = jax.jvp(lambda p: scene(p, arrays), (pos,), (dirs,))
        c = cfg.grad_denom_clamp
        denom = jnp.where(jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c))
        w = -gt * hit / denom
        _, vjp_fn = jax.vjp(lambda p, a: scene(p, a), pos, arrays)
        gpos, garrays = vjp_fn(w)
        return gpos, gpos * t[:, None], garrays

    march.defvjp(march_fwd, march_bwd)
    return march


@functools.lru_cache(maxsize=None)
def make_pallas_image_render(
    spec: TapeSpec,
    cfg: RenderConfig,
    width: int,
    height: int,
    interpret: bool = False,
    bm: int = BM,
):
    """Fully fused forward renderer: raygen + march + shading + gamma in ONE
    kernel, RGB out. fn(arrays, cam_vec f32[8]) -> (r, g, b) flat f32[N]
    arrays in pixel-major ray order; the caller AA-averages.

    Shading matches ops.march.shade / the reference (wgsl:96-130): tetrahedron
    4-tap normals, Lambertian with fixed light, analytic checkerboard floor on
    miss, sqrt gamma. Forward-only (the differentiable path pairs the plain
    march kernel with the implicit VJP and jnp shading).
    """
    leaf_rows = _leaf_static_rows(spec)
    scene_eval = _make_scene_eval(spec, cfg, leaf_rows, bm)
    color_eval = (
        _make_scene_color_eval(spec, cfg, leaf_rows, bm)
        if spec.has_materials
        else None
    )
    tile = bm * LANES
    naa = cfg.aa_samples
    hw = height * width
    total = naa * naa * hw
    n_pad = ((total + tile - 1) // tile) * tile
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    lx_, ly_, lz_ = cfg.light_position
    ax_, ay_, az_ = cfg.albedo
    fb_r, fb_g, fb_b = cfg.floor_base
    eps = cfg.normal_eps

    def kernel(ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref, r_ref, g_ref, b_ref, *scratch):
        pid = pl.program_id(0)
        base = pid * tile
        lin = (
            base
            + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)
        )
        S = naa * naa
        p = lin // S
        s = lin - p * S
        i = p // width
        j = p - i * width
        a = s // naa
        b = s - a * naa

        fa = (a.astype(jnp.float32) + 0.5) / naa - 0.5
        fbo = (b.astype(jnp.float32) + 0.5) / naa - 0.5
        x = 2.0 * (j.astype(jnp.float32) + 0.5) / width - 1.0 + fa * (2.0 / width)
        y = 1.0 - 2.0 * (i.astype(jnp.float32) + 0.5) / height + fbo * (2.0 / height)

        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full((bm, LANES), -1.0, jnp.float32)
        inv_norm = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        vx = vx * inv_norm
        vy = vy * inv_norm
        vz = vz * inv_norm

        qw, qx, qy, qz = cam_ref[3], cam_ref[4], cam_ref[5], cam_ref[6]
        tx = 2.0 * (qy * vz - qz * vy)
        ty = 2.0 * (qz * vx - qx * vz)
        tz = 2.0 * (qx * vy - qy * vx)
        dx = vx + qw * tx + (qy * tz - qz * ty)
        dy = vy + qw * ty + (qz * tx - qx * tz)
        dz = vz + qw * tz + (qx * ty - qy * tx)

        ox = jnp.full((bm, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((bm, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((bm, LANES), cam_ref[2], jnp.float32)

        def scene(px, py, pz):
            return scene_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz
            )

        bnd = (
            (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            if cfg.bound_accel
            else None
        )
        t, hit, _steps = _march_tile(scene, ox, oy, oz, dx, dy, dz, cfg, bnd)

        # Hit positions (benign origin for non-hit lanes).
        px = ox + dx * t * hit
        py = oy + dy * t * hit
        pz = oz + dz * t * hit

        # Tetrahedron normals: 4 taps (reference wgsl:135-144).
        nx, ny, nz = _tet_taps(
            scene, px, py, pz, eps, spec.n_leaves >= TAP_LOOP_MIN_LEAVES
        )
        ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
        nx = nx * ninv
        ny = ny * ninv
        nz = nz * ninv

        tlx = px - lx_
        tly = py - ly_
        tlz = pz - lz_
        linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
        diff = nx * tlx * linv + ny * tly * linv + nz * tlz * linv
        diff = jnp.maximum(diff, cfg.ambient)

        # Per-hit albedo from the material system (one extra scene eval at
        # the hit points; material-free scenes keep the fixed albedo).
        if color_eval is not None:
            _, mar, mag, mab = color_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, px, py, pz
            )
        else:
            mar, mag, mab = ax_, ay_, az_

        # Analytic checkerboard floor on miss (reference wgsl:117-128).
        dy_abs_ok = jnp.where(jnp.abs(dy) > 1e-8, 1.0, 0.0)
        dy_safe = jnp.where(jnp.abs(dy) > 1e-8, dy, 1e-8)
        ft = (cfg.floor_y - oy) / dy_safe
        fx = jnp.clip(ox + dx * ft, -1e7, 1e7)
        fz = jnp.clip(oz + dz * ft, -1e7, 1e7)
        ipx = jnp.round(fx + 0.5).astype(jnp.int32)
        ipz = jnp.round(fz + 0.5).astype(jnp.int32)
        parity = (jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)).astype(jnp.float32)
        on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
        fcol_r = (fb_r + cfg.floor_checker * parity) * on_floor
        fcol_g = (fb_g + cfg.floor_checker * parity) * on_floor
        fcol_b = (fb_b + cfg.floor_checker * parity) * on_floor

        miss = 1.0 - hit
        cr = hit * (mar * diff) + miss * fcol_r
        cg = hit * (mag * diff) + miss * fcol_g
        cb = hit * (mab * diff) + miss * fcol_b

        # sqrt gamma (wgsl:68).
        r_ref[:] = jnp.sqrt(jnp.maximum(cr, 0.0) + 1e-12)
        g_ref[:] = jnp.sqrt(jnp.maximum(cg, 0.0) + 1e-12)
        b_ref[:] = jnp.sqrt(jnp.maximum(cb, 0.0) + 1e-12)

    def render_rgb(arrays: TapeArrays, cam_vec):
        grid = (n_pad // tile,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[],
            out_specs=[
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=_scratch_shapes(spec, bm),
        )
        out_shape = [
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ]
        r, g, b = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            jnp.asarray(arrays.macro_ops),
            jnp.asarray(arrays.macro_arg),
            jnp.asarray(arrays.macro_slotk),
            jnp.asarray(arrays.op_param),
            jnp.asarray(arrays.leaf_params),
            compute_bound(spec, arrays),
            jnp.asarray(cam_vec, jnp.float32),
        )
        flat = lambda v: v.reshape(-1)[:total]
        return flat(r), flat(g), flat(b)

    return render_rgb

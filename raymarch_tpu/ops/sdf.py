"""Device-side (jnp) scene SDF evaluation over the two-phase device program.

Phase 1 evaluates all primitive leaves **vectorized over leaves x points**
from the struct-of-arrays banks (`TapeArrays.leaf_params`); phase 2 folds the
leaf-distance matrix through the data-driven combine tape with
compile-time-precomputed stack slots (see raymarch_tpu.ops.tape).

This replaces the reference's per-query scalar stack interpreter
(reference src/ray_marching/ray_marching.wgsl:187-227) with a formulation the
VPU/MXU can chew on: big contiguous elementwise blocks per primitive type and
a short `fori_loop` of row ops. SDF formulas match the reference kernels
(wgsl:229-252) and their standard extensions (torus, smooth ops).

Everything here is differentiable w.r.t. `leaf_params` and `op_param` (and
the query points), which is what makes the whole renderer trainable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from . import opcodes as oc
from .tape import TapeArrays, TapeSpec


def _safe_norm(v, axis=-1):
    """L2 norm with a tiny floor so gradients are finite at the origin
    (error ~1e-20/|v|, far below f32 resolution)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + 1e-20)


def quat_rotate(q, v):
    """Rotate vectors v[..., 3] by unit quaternions q[..., 4] (w,x,y,z)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inv(q, v):
    return quat_rotate(q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype), v)


def smooth_min(a, b, k):
    """iq's quadratic polynomial smooth-min; C1, differentiable a.e.,
    equals min(a,b) when |a-b| >= k."""
    k = jnp.maximum(k, 1e-8)
    h = jnp.maximum(k - jnp.abs(a - b), 0.0) / k
    return jnp.minimum(a, b) - h * h * k * 0.25


def smooth_max(a, b, k):
    return -smooth_min(-a, -b, k)


# --- per-type leaf distance kernels ----------------------------------------
# local: [C, N, 3] leaf-local query points; P: [C, LEAF_PARAM_WIDTH] params.


def _leaf_sphere(local, P):
    return _safe_norm(local) - P[:, 7:8]


def _leaf_box(local, P):
    q = jnp.abs(local) - P[:, None, 7:10]
    outside = _safe_norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.maximum(q[..., 0], jnp.maximum(q[..., 1], q[..., 2])), 0.0)
    return outside + inside


def _leaf_plane(local, P):
    # local already has (zero) center subtracted; plane ignores rotation/center.
    return jnp.einsum("cnd,cd->cn", local, P[:, 7:10]) + P[:, 10:11]


def _leaf_torus(local, P):
    ring = jnp.sqrt(local[..., 0] ** 2 + local[..., 2] ** 2 + 1e-20) - P[:, 7:8]
    return jnp.sqrt(ring * ring + local[..., 1] ** 2 + 1e-20) - P[:, 8:9]


def _leaf_cylinder(local, P):
    """Capped y-axis cylinder (iq sdCappedCylinder, exact): radius @7, h @8."""
    qx = jnp.sqrt(local[..., 0] ** 2 + local[..., 2] ** 2 + 1e-20) - P[:, 7:8]
    qy = jnp.abs(local[..., 1]) - P[:, 8:9]
    outside = jnp.sqrt(
        jnp.maximum(qx, 0.0) ** 2 + jnp.maximum(qy, 0.0) ** 2 + 1e-20
    )
    inside = jnp.minimum(jnp.maximum(qx, qy), 0.0)
    return outside + inside


def _leaf_capsule(local, P):
    """Vertical capsule (iq sdVerticalCapsule, exact): radius @7, h @8."""
    y = local[..., 1]
    y = y - jnp.clip(y, -P[:, 8:9], P[:, 8:9])
    return (
        jnp.sqrt(local[..., 0] ** 2 + y * y + local[..., 2] ** 2 + 1e-20)
        - P[:, 7:8]
    )


def _leaf_cone(local, P):
    """Capped y-axis cone (iq sdCappedCone, exact): h @7, r_bottom @8,
    r_top @9 (radii at y = -h and y = +h)."""
    h = P[:, 7:8]
    r1 = P[:, 8:9]
    r2 = P[:, 9:10]
    qx = jnp.sqrt(local[..., 0] ** 2 + local[..., 2] ** 2 + 1e-20)
    qy = local[..., 1]
    k2x = r2 - r1
    k2y = 2.0 * h
    cax = qx - jnp.minimum(qx, jnp.where(qy < 0.0, r1, r2))
    cay = jnp.abs(qy) - h
    denom = jnp.maximum(k2x * k2x + k2y * k2y, 1e-20)
    tt = jnp.clip(((r2 - qx) * k2x + (h - qy) * k2y) / denom, 0.0, 1.0)
    cbx = qx - r2 + k2x * tt
    cby = qy - h + k2y * tt
    s = jnp.where(jnp.logical_and(cbx < 0.0, cay < 0.0), -1.0, 1.0)
    return s * jnp.sqrt(
        jnp.minimum(cax * cax + cay * cay, cbx * cbx + cby * cby) + 1e-20
    )


_LEAF_FNS = {
    oc.LEAF_SPHERE: _leaf_sphere,
    oc.LEAF_BOX: _leaf_box,
    oc.LEAF_PLANE: _leaf_plane,
    oc.LEAF_TORUS: _leaf_torus,
    oc.LEAF_CYLINDER: _leaf_cylinder,
    oc.LEAF_CAPSULE: _leaf_capsule,
    oc.LEAF_CONE: _leaf_cone,
}


def leaf_distances(points, spec: TapeSpec, leaf_params):
    """points[N,3] -> D[n_leaves, N]: distance from every ray point to every
    primitive leaf, computed bank-by-bank (static slices, so XLA sees one
    fused vector block per primitive type)."""
    n = points.shape[0]
    blocks = []
    covered = 0
    for t, start, stop in spec.type_slices:
        P = leaf_params[start:stop]
        local = points[None, :, :] - P[:, None, 4:7]
        if spec.rotated_types[t]:
            local = quat_rotate_inv(P[:, None, 0:4], local)
        blocks.append(_LEAF_FNS[t](local, P))
        covered = stop
    if covered < spec.n_leaves:  # trailing padding rows (leafless scenes)
        blocks.append(jnp.zeros((spec.n_leaves - covered, n), points.dtype))
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _leaf_row_types(spec: TapeSpec):
    """row -> (leaf_type, rotated) map from the static bank layout."""
    out = {}
    for t, start, stop in spec.type_slices:
        for r in range(start, stop):
            out[r] = (t, bool(spec.rotated_types[t]))
    return out


def _single_leaf_distance(points, row_params, ltype, rotated):
    """Distance from points[N,3] to one leaf (row_params f32[12])."""
    local = points - row_params[4:7]
    if rotated:
        local = quat_rotate_inv(row_params[0:4], local)
    return _LEAF_FNS[ltype](local[None, :, :], row_params[None, :])[0]


def _static_tree(spec: TapeSpec):
    """Static tape (RPN) -> expression tree. Node = (cop_or_"leaf",
    instr_index, payload, leaf_row_frozenset); payload is the leaf row for
    leaves, else the child tuple. Returns None for the empty tape."""
    from . import opcodes as oc_

    stack: list = []
    for i, (cop, arg, _slot) in enumerate(spec.static_tape):
        if cop == oc_.COP_PUSH:
            stack.append(("leaf", i, arg, frozenset((arg,))))
        elif cop in (oc_.COP_ROUND, oc_.COP_ONION):
            a = stack.pop()
            stack.append((cop, i, (a,), a[3]))
        else:
            b = stack.pop()
            a = stack.pop()
            stack.append((cop, i, (a, b), a[3] | b[3]))
    return stack[0] if stack else None


def _combine_static(cop, a, b, kp):
    from . import opcodes as oc_

    if cop == oc_.COP_UNION:
        return jnp.minimum(a, b)
    if cop == oc_.COP_INTERSECTION:
        return jnp.maximum(a, b)
    if cop == oc_.COP_SUBTRACTION:
        return jnp.maximum(a, -b)
    if cop == oc_.COP_SMOOTH_UNION:
        return smooth_min(a, b, kp)
    if cop == oc_.COP_SMOOTH_INTERSECTION:
        return smooth_max(a, b, kp)
    if cop == oc_.COP_SMOOTH_SUBTRACTION:
        return smooth_max(a, -b, kp)
    raise ValueError(f"bad static op {cop}")


def _apply_static_tape(spec: TapeSpec, op_param, leaf_fn, max_dist, like,
                       cull=None):
    """Unrolled combine phase over the static tape. `leaf_fn(row)` yields a
    leaf-distance vector/tile; `like` provides shape/dtype for the empty
    scene. Smooth params come from the dynamic `op_param` (indexed
    statically), so param edits never recompile.

    `cull` (a culling.CullReader, Pallas kernels only) gates subtrees behind
    scalar branches, hierarchically: a gate fires at every subtree of
    <= GATE_MAX_LEAVES leaves, and re-fires at strictly smaller subtrees
    inside an active gate (a BVH walk in branch space — an all-culled tile
    costs ceil(L/GATE_MAX) branches; an active path narrows to the truly
    active leaves with ~log extra branches instead of evaluating the whole
    gated group). A fully-culled subtree folds to a constant FAR tile —
    exact, see ops.culling's lemma (FAR stays in the culled regime through
    any combine); subtrees with an active leaf evaluate true leaf values."""
    from . import opcodes as oc_

    root = _static_tree(spec)
    if root is None:
        return like * 0.0 + max_dist

    def eval_node(node, gate_bound):
        kind, i, payload, rows = node
        if (
            cull is not None
            and 2 <= len(rows) <= _gate_max()
            and len(rows) < gate_bound
        ):
            return jax.lax.cond(
                cull.any_active(rows),
                lambda: eval_node(node, len(rows)),
                lambda: like * 0.0 + _far(),
            )
        if kind == "leaf":
            return leaf_fn(payload)
        kp = op_param[i]
        if kind == oc_.COP_ROUND:
            return eval_node(payload[0], gate_bound) - kp
        if kind == oc_.COP_ONION:
            return jnp.abs(eval_node(payload[0], gate_bound)) - kp
        a = eval_node(payload[0], gate_bound)
        b = eval_node(payload[1], gate_bound)
        return _combine_static(kind, a, b, kp)

    return eval_node(root, 1 << 30)


def _gate_max():
    from .culling import GATE_MAX_LEAVES

    return GATE_MAX_LEAVES


def _far():
    from .culling import FAR

    return FAR


def _mat_weight_smooth(da, db, k):
    """Winner weight of operand a for smooth blends: the material field is
    continuous exactly where the distance blend is (see oracle.eval_tape_color)."""
    k = jnp.maximum(k, 1e-8)
    return jnp.clip(0.5 + 0.5 * (db - da) / k, 0.0, 1.0)


def _apply_static_tape_color(spec: TapeSpec, op_param, leaf_fn, max_dist, like,
                             default_rgb, cull=None):
    """Unrolled combine phase propagating (distance, albedo). `leaf_fn(row)`
    yields (d, (r, g, b)) with r/g/b broadcastable against d (scalars are
    fine); works on both jnp arrays and Pallas tiles. Selection/blend rules
    mirror oracle.eval_tape_color exactly. `cull` gates subtrees as in
    _apply_static_tape; a culled subtree keeps default_rgb (FAR loses every
    selection, so its color can never win a shaded pixel)."""
    from . import opcodes as oc_

    def sel(w, ca, cb):
        return tuple(w * x + (1.0 - w) * y for x, y in zip(ca, cb))

    root = _static_tree(spec)
    if root is None:
        return like * 0.0 + max_dist, default_rgb

    def eval_node(node, gate_bound):
        kind, i, payload, rows = node
        if (
            cull is not None
            and 2 <= len(rows) <= _gate_max()
            and len(rows) < gate_bound
        ):

            def run():
                d, (r, g, b) = eval_node(node, len(rows))
                z = d * 0.0  # force tile shapes so both branches match
                return d, (z + r, z + g, z + b)

            def culled():
                z = like * 0.0
                dr, dg, db = default_rgb
                return z + _far(), (z + dr, z + dg, z + db)

            return jax.lax.cond(cull.any_active(rows), run, culled)
        if kind == "leaf":
            return leaf_fn(payload)
        kp = op_param[i]
        if kind in (oc_.COP_ROUND, oc_.COP_ONION):
            a, ca = eval_node(payload[0], gate_bound)
            d = a - kp if kind == oc_.COP_ROUND else jnp.abs(a) - kp
            return d, ca
        a, ca = eval_node(payload[0], gate_bound)
        b, cb = eval_node(payload[1], gate_bound)
        if kind == oc_.COP_UNION:
            v = jnp.minimum(a, b)
            w = jnp.where(a <= b, 1.0, 0.0)
        elif kind == oc_.COP_INTERSECTION:
            v = jnp.maximum(a, b)
            w = jnp.where(a >= b, 1.0, 0.0)
        elif kind == oc_.COP_SUBTRACTION:
            v = jnp.maximum(a, -b)
            w = jnp.where(a >= -b, 1.0, 0.0)
        elif kind == oc_.COP_SMOOTH_UNION:
            v = smooth_min(a, b, kp)
            w = _mat_weight_smooth(a, b, kp)
        elif kind == oc_.COP_SMOOTH_INTERSECTION:
            v = smooth_max(a, b, kp)
            w = _mat_weight_smooth(b, a, kp)
        elif kind == oc_.COP_SMOOTH_SUBTRACTION:
            v = smooth_max(a, -b, kp)
            w = _mat_weight_smooth(-b, a, kp)
        else:
            raise ValueError(f"bad static op {kind}")
        return v, sel(w, ca, cb)

    return eval_node(root, 1 << 30)


def make_scene_color_fn(spec: TapeSpec, cfg: RenderConfig):
    """Build `scene_color(points[N,3], arrays) -> (d[N], albedo[N,3])`: one
    scene evaluation that also propagates materials (reference roadmap,
    README.md:10). Unpainted leaves shade with cfg.albedo, so on a
    material-free scene this is exactly `make_scene_fn` plus a constant."""
    default = jnp.asarray(cfg.albedo, jnp.float32)

    def leaf_rgb(row_params):
        flag = row_params[oc.LEAF_MAT_FLAG]
        alb = row_params[oc.LEAF_ALBEDO : oc.LEAF_ALBEDO + 3]
        rgb = flag * alb + (1.0 - flag) * default
        return (rgb[0], rgb[1], rgb[2])

    if spec.static_tape is not None:
        row_types = _leaf_row_types(spec)

        def scene_color_static(points, arrays: TapeArrays):
            points = jnp.asarray(points)
            arrays = jax.tree_util.tree_map(jnp.asarray, arrays)

            def leaf_fn(row):
                t, rot = row_types[row]
                d = _single_leaf_distance(points, arrays.leaf_params[row], t, rot)
                return d, leaf_rgb(arrays.leaf_params[row])

            d, (r, g, b) = _apply_static_tape_color(
                spec, arrays.op_param, leaf_fn, cfg.max_dist, points[:, 0],
                (default[0], default[1], default[2]),
            )
            ones = jnp.ones_like(d)
            return d, jnp.stack([r * ones, g * ones, b * ones], axis=-1)

        return scene_color_static

    S = spec.stack_depth

    def scene_color(points, arrays: TapeArrays):
        points = jnp.asarray(points)
        arrays = jax.tree_util.tree_map(jnp.asarray, arrays)
        n = points.shape[0]
        D = leaf_distances(points, spec, arrays.leaf_params)
        lp = arrays.leaf_params
        flag = lp[:, oc.LEAF_MAT_FLAG : oc.LEAF_MAT_FLAG + 1]
        rgb_leaf = flag * lp[:, oc.LEAF_ALBEDO : oc.LEAF_ALBEDO + 3] + (
            1.0 - flag
        ) * default[None, :]
        # D4[leaf, 4, N]: distance + broadcast per-leaf rgb channels.
        D4 = jnp.concatenate(
            [D[:, None, :], jnp.broadcast_to(rgb_leaf[:, :, None], (D.shape[0], 3, n))],
            axis=1,
        )

        def mix(v, w, ca, cb):
            return jnp.concatenate([v[None], w * ca + (1.0 - w) * cb], axis=0)

        branches = [
            lambda a, b, leaf, k: a,  # NOP
            lambda a, b, leaf, k: leaf,  # PUSH
            lambda a, b, leaf, k: mix(  # UNION
                jnp.minimum(a[0], b[0]), jnp.where(a[0] <= b[0], 1.0, 0.0), a[1:], b[1:]
            ),
            lambda a, b, leaf, k: mix(  # INTERSECTION
                jnp.maximum(a[0], b[0]), jnp.where(a[0] >= b[0], 1.0, 0.0), a[1:], b[1:]
            ),
            lambda a, b, leaf, k: mix(  # SUBTRACTION
                jnp.maximum(a[0], -b[0]),
                jnp.where(a[0] >= -b[0], 1.0, 0.0),
                a[1:],
                b[1:],
            ),
            lambda a, b, leaf, k: mix(  # SMOOTH_UNION
                smooth_min(a[0], b[0], k), _mat_weight_smooth(a[0], b[0], k),
                a[1:], b[1:],
            ),
            lambda a, b, leaf, k: mix(  # SMOOTH_INTERSECTION
                smooth_max(a[0], b[0], k), _mat_weight_smooth(b[0], a[0], k),
                a[1:], b[1:],
            ),
            lambda a, b, leaf, k: mix(  # SMOOTH_SUBTRACTION
                smooth_max(a[0], -b[0], k), _mat_weight_smooth(-b[0], a[0], k),
                a[1:], b[1:],
            ),
            lambda a, b, leaf, k: jnp.concatenate(
                [a[0:1] - k, a[1:]], axis=0
            ),  # ROUND
            lambda a, b, leaf, k: jnp.concatenate(
                [jnp.abs(a[0:1]) - k, a[1:]], axis=0
            ),  # ONION
        ]

        def body(i, stack):
            op = arrays.tape_ops[i]
            arg = arrays.tape_arg[i]
            k = arrays.op_param[i]
            slot = arrays.out_slot[i]
            # zero index typed like `slot` (x64 mode would otherwise make
            # the literal an int64 and dynamic_slice rejects mixed widths)
            z = jnp.zeros((), slot.dtype)
            pair = jax.lax.dynamic_slice(stack, (slot, z, z), (2, 4, n))
            a, b = pair[0], pair[1]
            leaf = jnp.take(D4, arg, axis=0)
            val = jax.lax.switch(op, branches, a, b, leaf, k)
            return jax.lax.dynamic_update_slice(stack, val[None], (slot, z, z))

        stack0 = jnp.full((S + 1, 4, n), cfg.max_dist, dtype=points.dtype)
        stack0 = stack0.at[:, 1:4, :].set(default[None, :, None])
        stack = jax.lax.fori_loop(0, spec.n_instr, body, stack0)
        return stack[0, 0], stack[0, 1:4].T

    return scene_color


def make_scene_fn(spec: TapeSpec, cfg: RenderConfig):
    """Build `scene_dist(points[N,3], arrays) -> d[N]` for a given static
    TapeSpec. The returned function is jit-stable across all scenes sharing
    the spec: runtime edits swap `arrays` only (no recompile). If the spec
    carries a static tape, the combine phase is unrolled at trace time and
    only PUSHed leaves are evaluated."""

    if spec.static_tape is not None:
        row_types = _leaf_row_types(spec)

        def scene_dist_static(points, arrays: TapeArrays):
            points = jnp.asarray(points)
            arrays = jax.tree_util.tree_map(jnp.asarray, arrays)

            def leaf_fn(row):
                t, rot = row_types[row]
                return _single_leaf_distance(points, arrays.leaf_params[row], t, rot)

            return _apply_static_tape(
                spec, arrays.op_param, leaf_fn, cfg.max_dist, points[:, 0]
            )

        return scene_dist_static

    S = spec.stack_depth

    def scene_dist(points, arrays: TapeArrays):
        points = jnp.asarray(points)
        arrays = jax.tree_util.tree_map(jnp.asarray, arrays)
        n = points.shape[0]
        D = leaf_distances(points, spec, arrays.leaf_params)

        # Combine phase: data-driven tape over D with precomputed slots.
        # Branch signature: (a, b, leaf, k) -> value[N] where a=stack[slot],
        # b=stack[slot+1], leaf=D[arg].
        branches = [
            lambda a, b, leaf, k: a,  # NOP
            lambda a, b, leaf, k: leaf,  # PUSH
            lambda a, b, leaf, k: jnp.minimum(a, b),  # UNION
            lambda a, b, leaf, k: jnp.maximum(a, b),  # INTERSECTION
            lambda a, b, leaf, k: jnp.maximum(a, -b),  # SUBTRACTION
            lambda a, b, leaf, k: smooth_min(a, b, k),  # SMOOTH_UNION
            lambda a, b, leaf, k: smooth_max(a, b, k),  # SMOOTH_INTERSECTION
            lambda a, b, leaf, k: smooth_max(a, -b, k),  # SMOOTH_SUBTRACTION
            lambda a, b, leaf, k: a - k,  # ROUND
            lambda a, b, leaf, k: jnp.abs(a) - k,  # ONION
        ]

        def body(i, stack):
            op = arrays.tape_ops[i]
            arg = arrays.tape_arg[i]
            k = arrays.op_param[i]
            slot = arrays.out_slot[i]
            # zero index typed like `slot` (x64 mode would otherwise make
            # the literal an int64 and dynamic_slice rejects mixed widths)
            z = jnp.zeros((), slot.dtype)
            pair = jax.lax.dynamic_slice(stack, (slot, z), (2, n))
            a, b = pair[0], pair[1]
            leaf = jnp.take(D, arg, axis=0)
            val = jax.lax.switch(op, branches, a, b, leaf, k)
            return jax.lax.dynamic_update_slice(stack, val[None, :], (slot, z))

        # Stack initialized to max_dist so an all-NOP (empty) tape yields the
        # reference's empty-scene semantics (wgsl:188-191). One extra scratch
        # row so slot+1 reads at the top are always in bounds.
        stack0 = jnp.full((S + 1, n), cfg.max_dist, dtype=points.dtype)
        stack = jax.lax.fori_loop(0, spec.n_instr, body, stack0)
        return stack[0]

    return scene_dist

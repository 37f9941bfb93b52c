"""Fused-VJP renderer: forward AND backward passes as Pallas TPU kernels.

The jnp differentiable renderer (ops.march.make_renderer) is correct but
HBM-bound: the shading chain (raygen + 4-tap normals + Lambertian + floor +
gamma) materializes dozens of full-size temporaries per chunk, and the
reverse pass roughly triples that traffic. This module keeps the whole
gradient computation on-chip:

- **Forward** = the cone-prepass fused renderer (ops.pallas_prepass): coarse
  cone march shared by all AA rays + fused fine kernel, which ALSO writes
  each AA sample's converged (t, hit) as residual planes (8 bytes/sample —
  at 1080p/16AA that is ~266 MB of HBM, far cheaper than the ~8 scene
  evaluations per sample a backward re-march would cost).

- **Backward** = ONE Pallas kernel over (pixel_tile, aa_sample) that:
  1. streams the forward march's (t, hit) residuals back in (bitwise the
     forward values, so the replayed shading chain matches exactly),
  2. rebuilds the shading chain as a function of the SMEM scalar parameters
     (leaf params, op params, camera pose) and applies `jax.grad` to the
     tile-local loss contribution  dot(color, g_pixel)/S  — JAX traces the
     transpose INSIDE the kernel, so every intermediate stays in VMEM,
  3. adds the implicit-function term: with F(t; theta) = sdf(o + t*d) = 0 at
     the hit, dL/dtheta += (dL/dt) * dt/dtheta where
     dt/dtheta = -dF/dtheta / (grad_x F . d)  (same formula as
     ops.march.make_march's custom_vjp, reference-free derivation there),
  4. accumulates all parameter gradients in SMEM scratch across grid steps
     and writes one flat f32 vector at the last step.

Gradients flow to `leaf_params` (geometry + albedos), `op_param` (blend
radii), and the camera pose vector. Static-tape scenes only (the combine
phase is unrolled; see ops.tape.TapeSpec.static_tape).
"""

from __future__ import annotations

import dataclasses
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
from .culling import make_cull_reader
from .pallas_march import (
    LANES,
    _leaf_static_rows,
    _leaf_distance_tile,
)
from .pallas_prepass import make_pallas_image_render_aa
from .sdf import _apply_static_tape, _apply_static_tape_color


class _RowsView:
    """Adapter: `view[row, col]` over a dict row -> tuple of traced scalars,
    so `_leaf_distance_tile` runs unchanged on differentiable scalar params
    instead of an SMEM ref."""

    def __init__(self, rows: dict):
        self._rows = rows

    def __getitem__(self, idx):
        row, col = idx
        return self._rows[row][col]


def _static_int_arrays(spec: TapeSpec):
    """Reconstruct the integer tape arrays from the static tape (they are
    fully determined by the spec, so the custom_vjp differentiates only the
    float inputs)."""
    n = spec.n_instr
    ops = np.zeros(n, np.int32)
    arg = np.zeros(n, np.int32)
    slot = np.full(n, spec.stack_depth - 1, np.int32)
    for i, (cop, a, s) in enumerate(spec.static_tape):
        ops[i], arg[i], slot[i] = cop, a, s
    return ops, arg, slot




class _OneRow:
    """Adapter: `view[row, col]` -> params[col] over one leaf's 16 scalar
    params, so `_leaf_distance_tile` runs unchanged on differentiable
    scalars inside per-row vjp bodies (the row key is ignored)."""

    def __init__(self, params):
        self._p = params

    def __getitem__(self, idx):
        return self._p[idx[1]]


def compact_bwd_history_len(plan) -> int:
    """Longest single-source fold an O(active) backward must replay: the
    seg1 chain's total item capacity or the largest stream group. The
    backward records each fold's running accumulator per item in a VMEM
    scratch of this many (128, LANES) planes, so the caller budget-gates
    on it (see make_fused_render_vjp)."""
    gm = plan["groups"]
    h = 0
    if plan["seg1"]:
        h = max(h, sum(len(gm[gi]["rows"]) for gi in plan["seg1"]))
    for gi in plan["stream"]:
        h = max(h, len(gm[gi]["rows"]))
    return h


def _make_compact_bwd(spec, cfg, width, height, rows_out, plan, MHL, CWL,
                      n_flx, interpret, soft=False):
    """O(active) backward kernel for segmented compact plans.

    The legacy backward kernel holds the whole unrolled scene transpose in
    its grad graph — program size O(n_leaves), and past IMEM capacity the
    core streams instructions per grid step regardless of branches (same
    pathology as the forward, see _make_scene_eval_compact). This kernel is
    O(active) in work and O(1) in code size for the whole segmented plan
    class (pallas_march.build_compact_plan): pool + seg1 chain + streams,
    with winner-routed painted materials for pool-only plans.

    Scene structure: d = min over SOURCES, where a source is (0) the global
    free pool — a hard-union min-fold, (1) the seg1 chain — free prefix
    groups + an ordered fold, (2+) each stream group — the min over its
    <= 8 segments' ordered folds. The backward routes each evaluation
    point's cotangent to the winning source by a strict-< argmin in source
    order (matches jnp.minimum's tie-to-first vjp convention composed in
    the forward), then:

      - POOL winner: the min-fold transpose is winner-masked — push the
        cotangent through jax.vjp of the SINGLE argmin leaf's distance
        (exact per-type/rotation partials) into one-hot VMEM accumulators.
      - ORDERED winner (chain / stream segment): a left fold
        acc_{j+1} = step(acc_j, leaf_j, mode_j, k_j) whose transpose needs
        the per-step accumulators. Replay the fold FORWARD recording acc_j
        into a [hist_len, 128, LANES] VMEM scratch, then sweep the items
        in REVERSE carrying the running accumulator-cotangent: per item,
        jax.vjp of the closed-form fold step at (acc_j, leaf_j, k_j)
        yields the leaf cotangent (pushed through the leaf vjp), the next
        accumulator-cotangent, and the blend-radius gradient g_k
        (accumulated one-hot into an op-param plane). Stream sweeps mask
        items to the WINNING segment (recorded during replay); hard items
        reduce to winner masks through the same vjp.

    The implicit-function t term runs the same sweeps twice at the hit
    point: once with unit cotangent collecting position gradients for
    fdot = grad_x F . d, once with the clamped -gt*hit/fdot weight for the
    parameter/camera chain. Materials (pool-only plans): the hit fold also
    tracks the winner's albedo/flag; shading cotangents route to the
    winner's albedo columns exactly (hard winners make d(color)/d(geometry)
    zero a.e., matching oracle_grad).

    No-hit tiles contribute EXACTLY zero gradient (the floor/miss chain is
    piecewise constant: checker parity passes an int cast, all gates select
    constants), so they skip everything. Returns
    run(lp, opp, cam_vec, clf, ccf, t_all, hit_all, gr, gg, gb)
      -> (d_lp[n_leaves, LEAF_PARAM_WIDTH], d_opp[n_instr], d_cam[7]).
    """
    naa = cfg.aa_samples
    S = naa * naa
    TS = 128
    aa_pack = TS // S
    n_pty = (rows_out + aa_pack - 1) // aa_pack
    Wp = ((width + LANES - 1) // LANES) * LANES
    n_tx = Wp // LANES
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    lx_, ly_, lz_ = cfg.light_position
    ax_, ay_, az_ = cfg.albedo
    fb_r, fb_g, fb_b = cfg.floor_base
    eps = cfg.normal_eps
    inv_s = 1.0 / S
    from .culling import FAR

    row_types = {r: (t, rot) for r, t, rot in _leaf_static_rows(spec)}
    gm = plan["groups"]
    groups = [
        (g["offset"], g["count_idx"], g["ltype"], g["rotated"])
        for gi in plan["pool"]
        for g in [gm[gi]]
    ]
    chain = tuple(plan["seg1"] or ())
    streams = tuple(plan["stream"])
    has_ordered = bool(chain or streams)
    use_mats = spec.has_materials  # caller gates: pool-only when set
    HIST = compact_bwd_history_len(plan)
    # Source ids: 0 = pool, 1 = chain (when present), then stream groups.
    src_ids = {}
    _next = 1
    if chain:
        src_ids["chain"] = _next
        _next += 1
    stream_src = {}
    for gi in streams:
        stream_src[gi] = _next
        _next += 1
    n_src = _next

    NLP = ((spec.n_leaves + 7) // 8) * 8  # sublane-padded accumulator rows
    NC = oc.LEAF_PARAM_WIDTH  # param cols accumulated per leaf
    OPP_PAD = max(8, ((spec.n_instr + 7) // 8) * 8)
    # Packed accumulators: measured DEAD END. Packing the (NLP, 128)
    # one-hot accumulator into a single native (8, 128) tile (leaf row r
    # -> sublane r%8, lane (r//8)*16 + col) should cut vector work 8x per
    # accumulate, but measured SLOWER on the chip (64-leaf fwd+bwd 31.3 ->
    # 33.6 ms, cluster 45.6 -> 48.5): the per-item %8 // index scalar
    # work and the denser lane masks cost more than the smaller tile
    # saves (Mosaic evidently keeps the tall layout's row-masked adds
    # cheap). Both layouts are implemented; flags stay False.
    pack_lp = False
    LP_ROWS = 8 if pack_lp else NLP
    pack_opp = False
    OPP_ROWS = 8 if pack_opp else OPP_PAD
    _TAPS = (
        (1.0, -1.0, -1.0),
        (-1.0, -1.0, 1.0),
        (-1.0, 1.0, -1.0),
        (1.0, 1.0, 1.0),
    )

    def _raygen(cam, x, y):
        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full(x.shape, -1.0, jnp.float32)
        inv_norm = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        vx, vy, vz = vx * inv_norm, vy * inv_norm, vz * inv_norm
        qw, qx, qy, qz = cam[3], cam[4], cam[5], cam[6]
        tx = 2.0 * (qy * vz - qz * vy)
        ty = 2.0 * (qz * vx - qx * vz)
        tz = 2.0 * (qx * vy - qy * vx)
        dx = vx + qw * tx + (qy * tz - qz * ty)
        dy = vy + qw * ty + (qz * tx - qx * tz)
        dz = vz + qw * tz + (qx * ty - qy * tx)
        ox = jnp.zeros_like(dx) + cam[0]
        oy = jnp.zeros_like(dy) + cam[1]
        oz = jnp.zeros_like(dz) + cam[2]
        return ox, oy, oz, dx, dy, dz

    # Static history bases: every ordered source owns a fixed slice of the
    # history scratch, so the hit point records once and sweeps twice.
    chain_base = 0
    chain_bases = []
    _b = 0
    for gi in chain:
        chain_bases.append(_b)
        _b += len(gm[gi]["rows"])
    stream_base = {}
    for gi in streams:
        stream_base[gi] = _b
        _b += len(gm[gi]["rows"])

    def bwd_kernel(
        lp_ref, opp_ref, cam_ref, clf_ref, ccf_ref,
        tm_ref, hm_ref, *rest,
    ):
        if soft:
            # Soft-coverage mode (ops.march shade_soft semantics): extra
            # (s_min, t_min) closest-approach residuals feed the coverage
            # alpha and the envelope (Danskin) term.
            sm_ref, tmn_ref, *rest = rest
        gr_ref, gg_ref, gb_ref, gleaf_ref, gopp_ref, gcam_ref, *scratch = rest
        if has_ordered:
            accv, acc_opp, acc_cam, hist = scratch
        else:
            accv, acc_opp, acc_cam = scratch
            hist = None
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        step = ty * n_tx + tx

        @pl.when(step == 0)
        def _():
            accv[:] = jnp.zeros_like(accv)
            acc_opp[:] = jnp.zeros_like(acc_opp)
            for j in range(7):
                acc_cam[j] = 0.0

        u = jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 0)
        pyl = u // S
        s = u - pyl * S
        ii = ty * aa_pack + pyl
        jj = tx * LANES + jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 1)
        a_ = s // naa
        b_ = s - a_ * naa
        fa = (a_.astype(jnp.float32) + 0.5) / naa - 0.5
        fb = (b_.astype(jnp.float32) + 0.5) / naa - 0.5
        x = 2.0 * (jj.astype(jnp.float32) + 0.5) / width - 1.0 + fa * (
            2.0 / width
        )
        y = 1.0 - 2.0 * (
            ii.astype(jnp.float32) + 0.5 + cam_ref[7]
        ) / height + fb * (2.0 / height)

        cam_scal = tuple(cam_ref[j] for j in range(7))
        ox, oy, oz, dx, dy, dz = _raygen(cam_scal, x, y)
        t = tm_ref[:]
        hit = hm_ref[:]
        if soft:
            s_min = sm_ref[:]
            t_min = tmn_ref[:]
            beta_inv = 1.0 / cfg.coverage_beta
            alpha_p = jnp.exp(
                -jnp.maximum(s_min - cfg.min_dist, 0.0) * beta_inv
            )

        def up(v):
            return jnp.broadcast_to(
                v[:, None, :], (aa_pack, S, LANES)
            ).reshape(TS, LANES)

        gr = up(gr_ref[:]) * inv_s
        gg = up(gg_ref[:]) * inv_s
        gb = up(gb_ref[:]) * inv_s

        tid = ((ty * aa_pack) // MHL) * n_flx + tx // CWL

        def do_tile():
            # Implicit-term point factor (o + d*t on hit lanes) — both
            # modes; soft shading positions use t_eff = where(hit, t,
            # t_min) gated by the alpha live mask, mirroring shade_soft.
            th = t * hit
            if soft:
                t_eff = jnp.where(hit > 0.5, t, t_min)
                live_f = jnp.where(alpha_p > 1e-4, 1.0, 0.0)
                th_pos = t_eff * live_f
                gt_fac = hit * live_f
            else:
                th_pos = th
                gt_fac = hit
            px = ox + dx * th
            py = oy + dy * th
            pz = oz + dz * th
            pxp = ox + dx * th_pos
            pyp = oy + dy * th_pos
            pzp = oz + dz * th_pos
            pts = [
                (pxp + kx * eps, pyp + ky * eps, pzp + kz * eps)
                for (kx, ky, kz) in _TAPS
            ] + [(px, py, pz)]
            if soft:
                # Envelope (Danskin) point: the frozen closest approach.
                pts.append((ox + dx * t_min, oy + dy * t_min,
                            oz + dz * t_min))
            far_tile = px * 0.0 + FAR
            z0 = px * 0.0

            # --- fold-step / leaf helpers ---------------------------------
            def step3(acc, dv, kp, mode):
                # fold_step of the forward compact evaluator with kp as an
                # explicit (differentiable) input — jax.vjp of this is the
                # per-item transpose (pallas_march._make_scene_eval_compact).
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

            def leaf_at(row, lt, rot, pt):
                return _leaf_distance_tile(lp_ref, row, lt, rot, *pt)

            def item_leaf_g(g, e, pt):
                types = g["types"]
                row = e & 1023
                if len(types) == 1:
                    t0_, r0_ = types[0]
                    return leaf_at(row, t0_, r0_, pt)
                tsel = (e >> 10) & 7
                return jax.lax.switch(
                    tsel,
                    [
                        (lambda _t=tt, _ro=ro: leaf_at(row, _t, _ro, pt))
                        for (tt, ro) in types
                    ],
                )

            def item_kp_mode(e):
                kp = opp_ref[jnp.maximum((e >> 18) - 1, 0)]
                return kp, (e >> 13) & 3

            # --- pass 1: per-source values at the 5 points ----------------
            def pool_fold(pt, want_color):
                win0 = jnp.zeros((TS, LANES), jnp.int32) - 1
                carry = (far_tile, win0)
                if want_color:
                    carry = carry + (z0 + ax_, z0 + ay_, z0 + az_, z0)
                for off, cidx, lt, rot in groups:
                    def body(j, c, _off=off, _lt=lt, _rot=rot,
                             _wc=want_color):
                        a, w = c[0], c[1]
                        row = clf_ref[tid, _off + j]
                        dv = leaf_at(row, _lt, _rot, pt)
                        sel = dv < a
                        out = (jnp.minimum(a, dv), jnp.where(sel, row, w))
                        if _wc:
                            fl = lp_ref[row, oc.LEAF_MAT_FLAG]
                            mr = fl * lp_ref[row, oc.LEAF_ALBEDO] + (1.0 - fl) * ax_
                            mg = fl * lp_ref[row, oc.LEAF_ALBEDO + 1] + (1.0 - fl) * ay_
                            mb = fl * lp_ref[row, oc.LEAF_ALBEDO + 2] + (1.0 - fl) * az_
                            out = out + (
                                jnp.where(sel, mr, c[2]),
                                jnp.where(sel, mg, c[3]),
                                jnp.where(sel, mb, c[4]),
                                jnp.where(sel, fl, c[5]),
                            )
                        return out

                    carry = jax.lax.fori_loop(
                        0, ccf_ref[tid, cidx], body, carry
                    )
                return carry

            def chain_value(pt):
                acc = far_tile
                for gi in chain:
                    g = gm[gi]
                    if not g["ordered"]:
                        def bodyf(j, a, _g=g):
                            row = clf_ref[tid, _g["offset"] + j]
                            return jnp.minimum(
                                a,
                                leaf_at(row, _g["ltype"], _g["rotated"], pt),
                            )

                        acc = jax.lax.fori_loop(
                            0, ccf_ref[tid, g["count_idx"]], bodyf, acc
                        )
                    else:
                        def bodyo(j, a, _g=g):
                            e = clf_ref[tid, _g["offset"] + j]
                            kp, mode = item_kp_mode(e)
                            return step3(a, item_leaf_g(_g, e, pt), kp, mode)

                        acc = jax.lax.fori_loop(
                            0, ccf_ref[tid, g["count_idx"]], bodyo, acc
                        )
                return acc

            def stream_value(gi, pt):
                g = gm[gi]

                def body(j, carry, _g=g):
                    best, acc_seg, prev = carry
                    e = clf_ref[tid, _g["offset"] + j]
                    sid = (e >> 15) & 7
                    new_seg = sid != prev
                    best = jnp.where(
                        new_seg, jnp.minimum(best, acc_seg), best
                    )
                    acc_seg = jnp.where(new_seg, far_tile, acc_seg)
                    kp, mode = item_kp_mode(e)
                    acc_seg = step3(acc_seg, item_leaf_g(_g, e, pt), kp, mode)
                    return (best, acc_seg, sid)

                best, acc_seg, _ = jax.lax.fori_loop(
                    0, ccf_ref[tid, g["count_idx"]], body,
                    (far_tile, far_tile, jnp.int32(-1)),
                )
                return jnp.minimum(best, acc_seg)

            vals, wins, srcvals = [], [], []
            matsv = None
            for i, pt in enumerate(pts):
                want_color = use_mats and i == 4
                pc = pool_fold(pt, want_color)
                acc, win = pc[0], pc[1]
                if want_color:
                    matsv = pc[2:6]
                srcs = [acc]
                if chain:
                    srcs.append(chain_value(pt))
                for gi in streams:
                    srcs.append(stream_value(gi, pt))
                d = srcs[0]
                for v in srcs[1:]:
                    d = jnp.minimum(d, v)
                vals.append(d)
                wins.append(win)
                srcvals.append(srcs)
            win_pos = wins[4]

            def src_mask(i, sid_):
                # Strict-< argmin in source order (pool, chain, streams):
                # matches jnp.minimum's tie-to-first vjp convention as the
                # forward composes the source mins left to right.
                if n_src == 1:
                    return 1.0
                srcs = srcvals[i]
                v = srcs[sid_]
                m = None
                for so, vo in enumerate(srcs):
                    if so == sid_:
                        continue
                    cnd = (vo >= v) if so > sid_ else (vo > v)
                    m = cnd if m is None else jnp.logical_and(m, cnd)
                return jnp.where(m, 1.0, 0.0)

            # --- pass 3: shading cotangents (scene-free chain) ------------
            def shade_small(inp):
                if soft:
                    f0, f1, f2, f3, tt, sm, cam = inp
                    mar, mag, mab = ax_, ay_, az_
                elif use_mats:
                    f0, f1, f2, f3, tt, mar, mag, mab, cam = inp
                else:
                    f0, f1, f2, f3, tt, cam = inp
                    mar, mag, mab = ax_, ay_, az_
                o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
                if soft:
                    alpha = jnp.exp(
                        -jnp.maximum(sm - cfg.min_dist, 0.0) * beta_inv
                    )
                    te = jnp.where(hit > 0.5, tt, t_min)
                    lv = alpha > 1e-4
                    q_x = jnp.where(lv, o1x + d1x * te, o1x)
                    q_y = jnp.where(lv, o1y + d1y * te, o1y)
                    q_z = jnp.where(lv, o1z + d1z * te, o1z)
                else:
                    q_x = o1x + d1x * tt * hit
                    q_y = o1y + d1y * tt * hit
                    q_z = o1z + d1z * tt * hit
                nx = f0 - f1 - f2 + f3
                ny = -f0 - f1 + f2 + f3
                nz = -f0 + f1 - f2 + f3
                ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
                tlx = q_x - lx_
                tly = q_y - ly_
                tlz = q_z - lz_
                linv = jax.lax.rsqrt(
                    tlx * tlx + tly * tly + tlz * tlz + 1e-20
                )
                diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
                diff = jnp.maximum(diff, cfg.ambient)
                dy_abs_ok = jnp.where(jnp.abs(d1y) > 1e-8, 1.0, 0.0)
                dy_safe = jnp.where(jnp.abs(d1y) > 1e-8, d1y, 1e-8)
                ft = (cfg.floor_y - o1y) / dy_safe
                fx = jnp.clip(o1x + d1x * ft, -1e7, 1e7)
                fz = jnp.clip(o1z + d1z * ft, -1e7, 1e7)
                ipx = jnp.round(fx + 0.5).astype(jnp.int32)
                ipz = jnp.round(fz + 0.5).astype(jnp.int32)
                parity = (
                    jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)
                ).astype(jnp.float32)
                on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
                fcr = (fb_r + cfg.floor_checker * parity) * on_floor
                fcg = (fb_g + cfg.floor_checker * parity) * on_floor
                fcb = (fb_b + cfg.floor_checker * parity) * on_floor
                cover = alpha if soft else hit
                miss = 1.0 - cover
                cr = jnp.sqrt(
                    jnp.maximum(cover * (mar * diff) + miss * fcr, 0.0) + 1e-12
                )
                cg = jnp.sqrt(
                    jnp.maximum(cover * (mag * diff) + miss * fcg, 0.0) + 1e-12
                )
                cb = jnp.sqrt(
                    jnp.maximum(cover * (mab * diff) + miss * fcb, 0.0) + 1e-12
                )
                return jnp.sum(cr * gr + cg * gg + cb * gb)

            gs_shade = None
            if soft:
                gsh = jax.grad(shade_small)(
                    (vals[0], vals[1], vals[2], vals[3], t, s_min, cam_scal)
                )
                w0, w1, w2, w3, gt_shade, gs_shade, gcam_shade = gsh
            elif use_mats:
                gsh = jax.grad(shade_small)(
                    (vals[0], vals[1], vals[2], vals[3], t)
                    + matsv[:3] + (cam_scal,)
                )
                w0, w1, w2, w3, gt_shade, gmr, gmg, gmb, gcam_shade = gsh
            else:
                w0, w1, w2, w3, gt_shade, gcam_shade = jax.grad(shade_small)(
                    (vals[0], vals[1], vals[2], vals[3], t, cam_scal)
                )
            wlist = [w0, w1, w2, w3]

            # --- one-hot accumulators -------------------------------------
            lane = jax.lax.broadcasted_iota(jnp.int32, (LP_ROWS, LANES), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (LP_ROWS, LANES), 0)

            if pack_lp:
                def accum_row(row, gp16):
                    blk16 = (row // 8) * 16
                    r8 = row % 8
                    acc = jnp.zeros((8, LANES), jnp.float32)
                    for c, g in enumerate(gp16):
                        acc = acc + jnp.where(
                            jnp.logical_and(rowi == r8, lane == blk16 + c),
                            g, 0.0,
                        )
                    accv[:] += acc
            else:
                def accum_row(row, gp16):
                    acc = jnp.zeros((LP_ROWS, LANES), jnp.float32)
                    for c, g in enumerate(gp16):
                        acc = acc + jnp.where(
                            jnp.logical_and(rowi == row, lane == c), g, 0.0
                        )
                    accv[:] += acc

            if has_ordered:
                lane_o = jax.lax.broadcasted_iota(
                    jnp.int32, (OPP_ROWS, LANES), 1
                )
                rowi_o = jax.lax.broadcasted_iota(
                    jnp.int32, (OPP_ROWS, LANES), 0
                )

                if pack_opp:
                    def accum_k(ki, gk):
                        # ki = packed kidx+1; 0 = hard item (no op param).
                        kk0 = ki - 1
                        acc_opp[:] += jnp.where(
                            jnp.logical_and(
                                jnp.logical_and(
                                    rowi_o == kk0 % 8, lane_o == kk0 // 8
                                ),
                                ki > 0,
                            ),
                            gk,
                            0.0,
                        )
                else:
                    def accum_k(ki, gk):
                        acc_opp[:] += jnp.where(
                            jnp.logical_and(
                                jnp.logical_and(
                                    rowi_o == ki - 1, lane_o == 0
                                ),
                                ki > 0,
                            ),
                            gk,
                            0.0,
                        )

            # --- ordered record + reverse sweep ---------------------------
            def rec_free(gi, base, acc, pt):
                g = gm[gi]

                def body(j, a, _g=g, _b=base):
                    hist[_b + j] = a
                    row = clf_ref[tid, _g["offset"] + j]
                    return jnp.minimum(
                        a, leaf_at(row, _g["ltype"], _g["rotated"], pt)
                    )

                return jax.lax.fori_loop(
                    0, ccf_ref[tid, g["count_idx"]], body, acc
                )

            def rec_ordered(gi, base, acc, pt):
                g = gm[gi]

                def body(j, a, _g=g, _b=base):
                    hist[_b + j] = a
                    e = clf_ref[tid, _g["offset"] + j]
                    kp, mode = item_kp_mode(e)
                    return step3(a, item_leaf_g(_g, e, pt), kp, mode)

                return jax.lax.fori_loop(
                    0, ccf_ref[tid, g["count_idx"]], body, acc
                )

            def rec_chain(pt):
                acc = far_tile
                for gi, base in zip(chain, chain_bases):
                    acc = (
                        rec_ordered if gm[gi]["ordered"] else rec_free
                    )(gi, base, acc, pt)
                return acc

            def rec_stream(gi, pt):
                """Replay a stream group recording per-item accumulators AND
                the winning segment id per ray (min over segment folds)."""
                g = gm[gi]
                base = stream_base[gi]

                def body(j, carry, _g=g, _b=base):
                    best, bsid, acc_seg, prev = carry
                    e = clf_ref[tid, _g["offset"] + j]
                    sid = (e >> 15) & 7
                    new_seg = sid != prev
                    flip = jnp.logical_and(new_seg, acc_seg < best)
                    best = jnp.where(flip, acc_seg, best)
                    bsid = jnp.where(flip, prev, bsid)
                    acc_seg = jnp.where(new_seg, far_tile, acc_seg)
                    hist[_b + j] = acc_seg
                    kp, mode = item_kp_mode(e)
                    acc_seg = step3(acc_seg, item_leaf_g(_g, e, pt), kp, mode)
                    return (best, bsid, acc_seg, sid)

                best, bsid, acc_seg, last = jax.lax.fori_loop(
                    0, ccf_ref[tid, g["count_idx"]], body,
                    (
                        far_tile,
                        jnp.zeros((TS, LANES), jnp.int32) - 1,
                        far_tile,
                        jnp.int32(-1),
                    ),
                )
                return jnp.where(acc_seg < best, last, bsid)

            def sweep_group(gi, base, pt, cot0, accum, bsid=None):
                """Reverse sweep of one group's recorded fold: carries the
                running accumulator-cotangent, pushes each item's leaf
                cotangent through the typed leaf vjp, accumulates param/k
                grads (when `accum`), and returns (cot_in, sum gq)."""
                g = gm[gi]
                cnt = ccf_ref[tid, g["count_idx"]]
                ordered = g["ordered"]
                free_lt = None if ordered else (g["ltype"], g["rotated"])

                def body(jj, carry, _g=g, _b=base, _cnt=cnt):
                    cot, sgx, sgy, sgz = carry
                    j = _cnt - 1 - jj
                    e = clf_ref[tid, _g["offset"] + j]
                    acc_j = hist[_b + j]
                    if ordered:
                        kp, mode = item_kp_mode(e)
                        row = e & 1023
                    else:
                        kp = jnp.float32(0.0)
                        mode = 0
                        row = e
                    if bsid is None:
                        cot_here = cot
                    else:
                        msk = ((e >> 15) & 7) == bsid
                        cot_here = jnp.where(msk, cot, 0.0)

                    def run_type(lt, rot):
                        params = tuple(lp_ref[row, c] for c in range(NC))

                        def f(prm, qx, qy, qz):
                            return _leaf_distance_tile(
                                _OneRow(prm), 0, lt, rot, qx, qy, qz
                            )

                        dv, vjp_f = jax.vjp(f, params, *pt)
                        _, fold_vjp = jax.vjp(
                            lambda a_, d_, k_: step3(a_, d_, k_, mode),
                            acc_j, dv, kp,
                        )
                        ga, gdv, gk = fold_vjp(cot_here)
                        gprm, gqx, gqy, gqz = vjp_f(gdv)
                        return (ga, gqx, gqy, gqz) + tuple(gprm) + (gk,)

                    if free_lt is not None:
                        out = run_type(*free_lt)
                    else:
                        types = _g["types"]
                        if len(types) == 1:
                            out = run_type(*types[0])
                        else:
                            tsel = (e >> 10) & 7
                            out = jax.lax.switch(
                                tsel,
                                [
                                    (lambda _t=tt, _ro=ro: run_type(_t, _ro))
                                    for (tt, ro) in types
                                ],
                            )
                    ga, gqx, gqy, gqz = out[0], out[1], out[2], out[3]
                    g16 = out[4 : 4 + NC]
                    gk = out[4 + NC]
                    if accum:
                        accum_row(row, g16)
                        if ordered:
                            accum_k(e >> 18, gk)
                    if bsid is None:
                        cot2 = ga
                    else:
                        cot2 = jnp.where(msk, ga, cot)
                    return (cot2, sgx + gqx, sgy + gqy, sgz + gqz)

                cot, sgx, sgy, sgz = jax.lax.fori_loop(
                    0, cnt, body, (cot0, z0, z0, z0)
                )
                return cot, (sgx, sgy, sgz)

            def sweep_chain(pt, cot0, accum):
                cot = cot0
                sg = [z0, z0, z0]
                for gi, base in reversed(list(zip(chain, chain_bases))):
                    cot, gq = sweep_group(gi, base, pt, cot, accum)
                    sg = [a + b for a, b in zip(sg, gq)]
                return sg

            # --- pass 4a: tap cotangents ----------------------------------
            gt_extra = z0
            go = [z0, z0, z0]
            gd = [z0, z0, z0]
            masks0 = [src_mask(i, 0) for i in range(5)]

            # Pool: winner-masked single-leaf pushes, all 4 taps per row.
            for off, cidx, lt, rot in groups:
                def body_tap(j, carry, _off=off, _lt=lt, _rot=rot):
                    gt_e, gox, goy, goz, gdx, gdy, gdz = carry
                    row = clf_ref[tid, _off + j]
                    params = tuple(
                        lp_ref[row, c] for c in range(oc.LEAF_PARAM_WIDTH)
                    )

                    def f(prm, qx, qy, qz):
                        return _leaf_distance_tile(
                            _OneRow(prm), 0, _lt, _rot, qx, qy, qz
                        )

                    g16_tot = [jnp.float32(0.0)] * oc.LEAF_PARAM_WIDTH
                    for i in range(4):
                        cot = (
                            wlist[i]
                            * jnp.where(wins[i] == row, 1.0, 0.0)
                            * masks0[i]
                        )
                        _, vjp_f = jax.vjp(f, params, *pts[i])
                        gprm, gqx, gqy, gqz = vjp_f(cot)
                        g16_tot = [a + b for a, b in zip(g16_tot, gprm)]
                        gt_e = gt_e + (
                            gqx * dx + gqy * dy + gqz * dz
                        ) * gt_fac
                        gox = gox + gqx
                        goy = goy + gqy
                        goz = goz + gqz
                        gdx = gdx + gqx * th_pos
                        gdy = gdy + gqy * th_pos
                        gdz = gdz + gqz * th_pos
                    accum_row(row, g16_tot)
                    return (gt_e, gox, goy, goz, gdx, gdy, gdz)

                carry = (gt_extra, go[0], go[1], go[2], gd[0], gd[1], gd[2])
                carry = jax.lax.fori_loop(
                    0, ccf_ref[tid, cidx], body_tap, carry
                )
                gt_extra, go[0], go[1], go[2], gd[0], gd[1], gd[2] = carry

            # Ordered sources at the taps: record + one accumulating sweep.
            def gated3(m, fn):
                # Per-tile skip: most tiles route no ray to this source
                # (src_mask is a strict argmin), so the whole record+sweep
                # — including its ref side effects — runs only when some
                # ray actually needs it.
                return jax.lax.cond(
                    jnp.max(m) > 0.0, fn, lambda: (z0, z0, z0)
                )

            if has_ordered:
                for i in range(4):
                    if chain:
                        m = src_mask(i, src_ids["chain"])

                        def tap_chain(i=i, m=m):
                            rec_chain(pts[i])
                            return tuple(
                                sweep_chain(pts[i], wlist[i] * m, True)
                            )

                        gq = gated3(m, tap_chain)
                        gt_extra = gt_extra + (
                            gq[0] * dx + gq[1] * dy + gq[2] * dz
                        ) * gt_fac
                        for c3 in range(3):
                            go[c3] = go[c3] + gq[c3]
                            gd[c3] = gd[c3] + gq[c3] * th_pos
                    for gi in streams:
                        m = src_mask(i, stream_src[gi])

                        def tap_stream(i=i, gi=gi, m=m):
                            bsid = rec_stream(gi, pts[i])
                            _, gq_ = sweep_group(
                                gi, stream_base[gi], pts[i], wlist[i] * m,
                                True, bsid=bsid,
                            )
                            return gq_

                        gq = gated3(m, tap_stream)
                        gt_extra = gt_extra + (
                            gq[0] * dx + gq[1] * dy + gq[2] * dz
                        ) * gt_fac
                        for c3 in range(3):
                            go[c3] = go[c3] + gq[c3]
                            gd[c3] = gd[c3] + gq[c3] * th_pos

            # --- fdot at the hit point ------------------------------------
            fdot = z0
            for off, cidx, lt, rot in groups:
                def body2(j, fd, _off=off, _lt=lt, _rot=rot):
                    row = clf_ref[tid, _off + j]
                    _, dd = jax.jvp(
                        lambda qx, qy, qz: _leaf_distance_tile(
                            lp_ref, row, _lt, _rot, qx, qy, qz
                        ),
                        (px, py, pz),
                        (dx, dy, dz),
                    )
                    return fd + jnp.where(win_pos == row, dd, 0.0) * masks0[4]

                fdot = jax.lax.fori_loop(0, ccf_ref[tid, cidx], body2, fdot)

            bsid_hit = {}
            m_hit = {}
            if has_ordered:
                # Record the hit point ONCE (partitioned history), sweep for
                # fdot now and for the parameter chain after w_pos is known
                # — both sweeps share the same per-tile gate, so the history
                # is always recorded exactly when the pos sweep reuses it.
                if chain:
                    m = src_mask(4, src_ids["chain"])
                    m_hit["chain"] = m

                    def hit_chain(m=m):
                        rec_chain(pts[4])
                        return tuple(sweep_chain(pts[4], m, False))

                    gq = gated3(m, hit_chain)
                    fdot = fdot + gq[0] * dx + gq[1] * dy + gq[2] * dz
                for gi in streams:
                    m = src_mask(4, stream_src[gi])
                    m_hit[gi] = m
                    bsid_none = jnp.zeros((TS, LANES), jnp.int32) - 1

                    def hit_stream(gi=gi, m=m):
                        b = rec_stream(gi, pts[4])
                        _, gq_ = sweep_group(
                            gi, stream_base[gi], pts[4], m, False, bsid=b
                        )
                        return gq_ + (b,)

                    out = jax.lax.cond(
                        jnp.max(m) > 0.0,
                        hit_stream,
                        lambda b=bsid_none: (z0, z0, z0, b),
                    )
                    gq = out[:3]
                    bsid_hit[gi] = out[3]
                    fdot = fdot + gq[0] * dx + gq[1] * dy + gq[2] * dz

            gt_total = gt_shade + gt_extra
            c = cfg.grad_denom_clamp
            denom = jnp.where(
                jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c)
            )
            w_pos = -gt_total * hit / denom

            # --- pass 4b: hit-point parameter chain -----------------------
            for off, cidx, lt, rot in groups:
                def body_pos(j, carry, _off=off, _lt=lt, _rot=rot):
                    gox, goy, goz, gdx, gdy, gdz = carry
                    row = clf_ref[tid, _off + j]
                    params = tuple(
                        lp_ref[row, c] for c in range(oc.LEAF_PARAM_WIDTH)
                    )

                    def f(prm, qx, qy, qz):
                        return _leaf_distance_tile(
                            _OneRow(prm), 0, _lt, _rot, qx, qy, qz
                        )

                    cot = (
                        w_pos
                        * jnp.where(win_pos == row, 1.0, 0.0)
                        * masks0[4]
                    )
                    _, vjp_f = jax.vjp(f, params, px, py, pz)
                    gprm, gqx, gqy, gqz = vjp_f(cot)
                    g16 = list(gprm)
                    if use_mats:
                        # Winner-routed albedo/flag gradients: the color of
                        # a hard-union hit is the argmin leaf's mix
                        # flag*albedo + (1-flag)*default, so the shading
                        # cotangents (gmr/gmg/gmb) land exactly on the
                        # winner's material columns (d(color)/d(geometry)
                        # is zero a.e. — matches oracle_grad).
                        mskw = jnp.where(win_pos == row, 1.0, 0.0)
                        fl = lp_ref[row, oc.LEAF_MAT_FLAG]
                        sr = jnp.sum(gmr * mskw)
                        sg_ = jnp.sum(gmg * mskw)
                        sb = jnp.sum(gmb * mskw)
                        g16[oc.LEAF_ALBEDO] += fl * sr
                        g16[oc.LEAF_ALBEDO + 1] += fl * sg_
                        g16[oc.LEAF_ALBEDO + 2] += fl * sb
                        g16[oc.LEAF_MAT_FLAG] += (
                            (lp_ref[row, oc.LEAF_ALBEDO] - ax_) * sr
                            + (lp_ref[row, oc.LEAF_ALBEDO + 1] - ay_) * sg_
                            + (lp_ref[row, oc.LEAF_ALBEDO + 2] - az_) * sb
                        )
                    accum_row(row, g16)
                    return (
                        gox + gqx,
                        goy + gqy,
                        goz + gqz,
                        gdx + gqx * th,
                        gdy + gqy * th,
                        gdz + gqz * th,
                    )

                carry = (go[0], go[1], go[2], gd[0], gd[1], gd[2])
                carry = jax.lax.fori_loop(
                    0, ccf_ref[tid, cidx], body_pos, carry
                )
                go[0], go[1], go[2], gd[0], gd[1], gd[2] = carry

            if has_ordered:
                # Ordered sources reuse the hit-point history recorded for
                # the fdot sweep (same gate predicate => history is valid
                # exactly when these sweeps run).
                if chain:
                    m = m_hit["chain"]

                    def pos_chain(m=m):
                        return tuple(sweep_chain(pts[4], w_pos * m, True))

                    gq = gated3(m, pos_chain)
                    for c3 in range(3):
                        go[c3] = go[c3] + gq[c3]
                        gd[c3] = gd[c3] + gq[c3] * th
                for gi in streams:
                    m = m_hit[gi]

                    def pos_stream(gi=gi, m=m):
                        _, gq_ = sweep_group(
                            gi, stream_base[gi], pts[4], w_pos * m, True,
                            bsid=bsid_hit[gi],
                        )
                        return gq_

                    gq = gated3(m, pos_stream)
                    for c3 in range(3):
                        go[c3] = go[c3] + gq[c3]
                        gd[c3] = gd[c3] + gq[c3] * th

            if soft:
                # Envelope (Danskin) term: dL/dtheta += gs * F_theta at the
                # FROZEN closest-approach point pts[5] (mirrors
                # make_march_soft's bwd); the camera chain flows through
                # o + d*t_min, so gd picks up a t_min factor.
                m_env0 = src_mask(5, 0)
                win_env = wins[5]
                for off, cidx, lt, rot in groups:
                    def body_env(j, carry, _off=off, _lt=lt, _rot=rot):
                        gox, goy, goz, gdx, gdy, gdz = carry
                        row = clf_ref[tid, _off + j]
                        params = tuple(
                            lp_ref[row, c]
                            for c in range(oc.LEAF_PARAM_WIDTH)
                        )

                        def f(prm, qx, qy, qz):
                            return _leaf_distance_tile(
                                _OneRow(prm), 0, _lt, _rot, qx, qy, qz
                            )

                        cot = (
                            gs_shade
                            * jnp.where(win_env == row, 1.0, 0.0)
                            * m_env0
                        )
                        _, vjp_f = jax.vjp(f, params, *pts[5])
                        gprm, gqx, gqy, gqz = vjp_f(cot)
                        accum_row(row, list(gprm))
                        return (
                            gox + gqx,
                            goy + gqy,
                            goz + gqz,
                            gdx + gqx * t_min,
                            gdy + gqy * t_min,
                            gdz + gqz * t_min,
                        )

                    carry = (go[0], go[1], go[2], gd[0], gd[1], gd[2])
                    carry = jax.lax.fori_loop(
                        0, ccf_ref[tid, cidx], body_env, carry
                    )
                    go[0], go[1], go[2], gd[0], gd[1], gd[2] = carry
                if has_ordered:
                    if chain:
                        m = src_mask(5, src_ids["chain"])

                        def env_chain(m=m):
                            rec_chain(pts[5])
                            return tuple(
                                sweep_chain(pts[5], gs_shade * m, True)
                            )

                        gq = gated3(m, env_chain)
                        for c3 in range(3):
                            go[c3] = go[c3] + gq[c3]
                            gd[c3] = gd[c3] + gq[c3] * t_min
                    for gi in streams:
                        m = src_mask(5, stream_src[gi])

                        def env_stream(gi=gi, m=m):
                            bsid_e = rec_stream(gi, pts[5])
                            _, gq_ = sweep_group(
                                gi, stream_base[gi], pts[5], gs_shade * m,
                                True, bsid=bsid_e,
                            )
                            return gq_

                        gq = gated3(m, env_stream)
                        for c3 in range(3):
                            go[c3] = go[c3] + gq[c3]
                            gd[c3] = gd[c3] + gq[c3] * t_min

            # Camera chain for the scene-side cotangents: one raygen vjp.
            _, rg_vjp = jax.vjp(lambda cam: _raygen(cam, x, y), cam_scal)
            (gcam_extra,) = rg_vjp(
                (go[0], go[1], go[2], gd[0], gd[1], gd[2])
            )
            for j in range(7):
                acc_cam[j] += gcam_shade[j] + gcam_extra[j]

        if soft:
            # Beta-scaled coverage gate, same rationale as the legacy soft
            # kernel: a skipped tile's dropped gradient is bounded by
            # alpha/beta <= 1e-4 per lane.
            _sg = 1e-4 * min(1.0, float(cfg.coverage_beta))
            any_work = jnp.logical_or(
                jnp.max(hit) > 0.0, jnp.max(alpha_p) > _sg
            )
        else:
            any_work = jnp.max(hit) > 0.0

        @pl.when(any_work)
        def _():
            do_tile()

        @pl.when(step == n_pty * n_tx - 1)
        def _():
            gleaf_ref[:] = accv[:]
            gopp_ref[:] = acc_opp[:]
            for j in range(7):
                gcam_ref[j] = acc_cam[j]

    def run(lp, opp, cam_vec, clf, ccf, residuals, gr, gg, gb):
        # residuals = (t, hit) or (t, hit, s_min, t_min) in soft mode.
        n_res = len(residuals)
        px_spec = pl.BlockSpec(
            (aa_pack, LANES), lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        th_spec = pl.BlockSpec(
            (TS, LANES), lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        scratch = [
            pltpu.VMEM((LP_ROWS, LANES), jnp.float32),
            pltpu.VMEM((OPP_ROWS, LANES), jnp.float32),
            pltpu.SMEM((7,), jnp.float32),
        ]
        if has_ordered:
            scratch.append(pltpu.VMEM((HIST, TS, LANES), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_pty, n_tx),
            in_specs=[th_spec] * n_res + [px_spec, px_spec, px_spec],
            out_specs=[
                pl.BlockSpec(
                    (LP_ROWS, LANES), lambda ty, tx, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (OPP_ROWS, LANES), lambda ty, tx, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=scratch,
        )
        gleaf, gopp, gcam = pl.pallas_call(
            bwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((LP_ROWS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((OPP_ROWS, LANES), jnp.float32),
                jax.ShapeDtypeStruct((7,), jnp.float32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(lp, jnp.float32),
            jnp.asarray(opp, jnp.float32),
            jnp.asarray(cam_vec, jnp.float32),
            clf,
            ccf,
            *residuals,
            gr,
            gg,
            gb,
        )
        if pack_lp:
            # leaf row r lives at (sublane r%8, lane (r//8)*16 + col)
            d_lp = (
                gleaf.reshape(8, 8, 16)
                .transpose(1, 0, 2)
                .reshape(64, 16)[: spec.n_leaves, : oc.LEAF_PARAM_WIDTH]
            )
        else:
            d_lp = gleaf[: spec.n_leaves, : oc.LEAF_PARAM_WIDTH]
        if pack_opp:
            # instr i lives at (sublane i%8, lane i//8)
            d_opp = gopp.T.reshape(-1)[: spec.n_instr]
        else:
            d_opp = gopp[: spec.n_instr, 0]
        return d_lp, d_opp, gcam

    return run


@functools.lru_cache(maxsize=None)
def make_fused_render_vjp(
    spec: TapeSpec,
    cfg: RenderConfig,
    width: int,
    height: int,
    interpret: bool = False,
    bm: int | None = None,
    prepass_block: int = 1,
    band_rows: int | None = None,
    aa_packed: bool | None = None,
    soft: bool = False,
):
    """Build `render(arrays, cam_vec f32[8]) -> image[band_rows or H, W, 3]`,
    differentiable w.r.t. `arrays.leaf_params`, `arrays.op_param`, and
    `cam_vec`, with both passes fused in Pallas. Requires a static-tape spec.
    `band_rows` renders the horizontal band starting at image row
    `cam_vec[7]` (see ops.pallas_prepass) — the row-sharded distributed fit
    runs this per device."""
    if spec.static_tape is None:
        raise NotImplementedError(
            "fused-VJP rendering requires compile_scene(static=True)"
        )
    if soft:
        # Soft-coverage fwd+bwd (silhouette gradients): packed no-prepass
        # forward with (s_min, t_min) residuals + the envelope (Danskin)
        # term in the backward. See ops.pallas_prepass soft mode.
        if (cfg.aa_samples**2) and 128 % (cfg.aa_samples**2):
            raise ValueError("soft VJP needs aa_samples^2 dividing 128")
        aa_packed = True
    # The backward kernel holds the whole vjp graph in VMEM — residency
    # scales with the unrolled leaf count (the 64-leaf scene needs 38MB at
    # bm=64). Calibrated: bm * n_leaves * 4 rows of f32[128] lanes ~ 16MB.
    budget = 4096 // (4 * max(spec.n_leaves, 1))
    if bm is None:
        bm = 8
        while bm * 2 <= min(budget, 64):
            bm *= 2
    S_ = cfg.aa_samples * cfg.aa_samples
    # O(active) backward eligibility: PURE hard-union compact plan (every
    # leaf in the free pool — the min-fold transpose is winner-masked; see
    # _make_compact_bwd), packed layout available, no materials. The
    # compact kernels are O(1) in n_leaves, so the VMEM budget that forces
    # bm down / aa_packed off for the legacy kernel does not apply.
    from .pallas_march import build_compact_plan

    _plan = build_compact_plan(spec) if cfg.leaf_cull else None
    # Why the O(active) backward was skipped, for observability (surfaces
    # through make_fit_step/fit_scene — a smooth or painted scene silently
    # falling to the O(n_leaves) legacy kernel is a ~10x training cliff the
    # user should see, round-4 verdict). Since round 5 the compact backward
    # covers the full segmented plan class (pool + seg1 chain + streams,
    # with winner-routed materials on pool-only plans) — see
    # _make_compact_bwd; the remaining exclusions are listed here.
    # History budget: the ordered-fold replay stores one (128, LANES) f32
    # plane per ordered item (compact_bwd_history_len) — 64 items = 4 MB of
    # VMEM scratch, a safe fraction of the 16 MB core budget next to the
    # kernel's own tiles.
    _HIST_CAP = 64
    compact_bwd_reason = None
    if soft and spec.has_materials:
        compact_bwd_reason = "painted materials in soft mode"
    elif not cfg.leaf_cull:
        compact_bwd_reason = "leaf_cull disabled"
    elif _plan is None:
        compact_bwd_reason = "scene has no compact plan (not foldable)"
    elif _plan["residual_ops"]:
        compact_bwd_reason = "plan has residual (unrolled) subtrees"
    elif spec.has_materials and (
        _plan["seg1"] is not None or _plan["stream"]
    ):
        compact_bwd_reason = "painted materials on smooth/ordered segments"
    elif compact_bwd_history_len(_plan) > _HIST_CAP:
        compact_bwd_reason = (
            f"ordered fold history exceeds the VMEM budget ({_HIST_CAP})"
        )
    elif 128 % S_ != 0 or aa_packed is False:
        compact_bwd_reason = "AA-packed layout unavailable"
    compact_bwd = compact_bwd_reason is None
    aa_packed_arg = aa_packed  # caller's request, before compact forcing
    if compact_bwd:
        aa_packed = True
    # AA-packed layout (see ops.pallas_prepass): every (128/S)-pixel-row
    # strip's S samples share ONE invocation, amortizing raygen + the
    # in-kernel transpose graph's fixed structure across the samples. Needs
    # the full 128-sublane tile resident, so auto-enable only when the leaf
    # count keeps the vjp graph inside VMEM at that size.
    if aa_packed is None:
        aa_packed = (128 % S_ == 0) and budget >= 128
    if aa_packed and 128 % S_:
        raise ValueError("aa_packed VJP needs aa_samples^2 dividing 128")
    leaf_rows = _leaf_static_rows(spec)
    row_types = {r: (t, rot) for r, t, rot in leaf_rows}
    pushed_rows = sorted({a for (c, a, _s) in spec.static_tape if c == oc.COP_PUSH})
    n_real = len(spec.static_tape)
    n_rows = len(pushed_rows)
    NSCAL = 16 * n_rows + n_real + 7

    ops_np, arg_np, slot_np = _static_int_arrays(spec)
    naa = cfg.aa_samples
    S = naa * naa
    rows_out = band_rows if band_rows is not None else height
    # 2D image-block geometry — must mirror the forward fine pass
    # (ops.pallas_prepass), whose residual planes this kernel streams back.
    Hp = ((rows_out + bm - 1) // bm) * bm
    Wp = ((width + LANES - 1) // LANES) * LANES
    n_ty, n_tx = Hp // bm, Wp // LANES
    # Packed-layout geometry (mirrors the packed fine kernel).
    TS = 128
    aa_pack = max(1, TS // S)
    n_pty = (rows_out + aa_pack - 1) // aa_pack
    Hp_pack = n_pty * aa_pack
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    lx_, ly_, lz_ = cfg.light_position
    ax_, ay_, az_ = cfg.albedo
    fb_r, fb_g, fb_b = cfg.floor_base
    eps = cfg.normal_eps
    inv_s = 1.0 / S

    # Forward: the prepass renderer (bm_fine must match the bwd kernel's bm
    # so the residual block layouts line up; in packed mode both sides use
    # the strip layout).
    fwd_render = make_pallas_image_render_aa(
        spec, cfg, width, height, interpret=interpret,
        bm_coarse=64 if not interpret else 8, bm_fine=bm,
        prepass_block=prepass_block, band_rows=band_rows,
        aa_packed=aa_packed, no_prepass=soft, soft=soft,
    )
    if compact_bwd and fwd_render.compact_info is None:
        # The forward fell back (SMEM list-budget floor): no lists exist
        # for the backward either — use the legacy unrolled kernel. The
        # compact path forced aa_packed=True above, but the legacy kernel
        # holds the whole unrolled transpose in VMEM and its budget rule
        # may require the unpacked layout (round-4 advisor finding):
        # re-derive aa_packed and rebuild the forward to match.
        compact_bwd = False
        compact_bwd_reason = "forward fell back (SMEM list-budget floor)"
        legacy_packed = (
            aa_packed_arg
            if aa_packed_arg is not None
            else (128 % S_ == 0) and budget >= 128
        )
        if legacy_packed != aa_packed:
            aa_packed = legacy_packed
            fwd_render = make_pallas_image_render_aa(
                spec, cfg, width, height, interpret=interpret,
                bm_coarse=64 if not interpret else 8, bm_fine=bm,
                prepass_block=prepass_block, band_rows=band_rows,
                aa_packed=aa_packed, no_prepass=soft, soft=soft,
            )
    if compact_bwd:
        _info = fwd_render.compact_info
        _compact_run = _make_compact_bwd(
            spec, cfg, width, height, rows_out, _info["plan"],
            _info["MHL"], _info["CWL"], _info["n_flx"], interpret,
            soft=soft,
        )

    def _scene_tile(rows_view, opp, px, py, pz, cull=None):
        def leaf_fn(row):
            t, rot = row_types[row]
            return _leaf_distance_tile(rows_view, row, t, rot, px, py, pz)

        return _apply_static_tape(spec, opp, leaf_fn, cfg.max_dist, px, cull=cull)

    def _albedo_tile(rows_view, opp, px, py, pz, cull=None):
        if not spec.has_materials:
            return ax_, ay_, az_

        def leaf_fn(row):
            t, rot = row_types[row]
            d = _leaf_distance_tile(rows_view, row, t, rot, px, py, pz)
            flag = rows_view[row, oc.LEAF_MAT_FLAG]
            r = flag * rows_view[row, oc.LEAF_ALBEDO] + (1.0 - flag) * ax_
            g = flag * rows_view[row, oc.LEAF_ALBEDO + 1] + (1.0 - flag) * ay_
            b = flag * rows_view[row, oc.LEAF_ALBEDO + 2] + (1.0 - flag) * az_
            return d, (r, g, b)

        _, rgb = _apply_static_tape_color(
            spec, opp, leaf_fn, cfg.max_dist, px, (ax_, ay_, az_), cull=cull
        )
        return rgb

    def _raygen(cam, x, y):
        """View dirs + origins from 7 camera scalars (pos3, quat4)."""
        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full(x.shape, -1.0, jnp.float32)
        inv_norm = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        vx, vy, vz = vx * inv_norm, vy * inv_norm, vz * inv_norm
        qw, qx, qy, qz = cam[3], cam[4], cam[5], cam[6]
        tx = 2.0 * (qy * vz - qz * vy)
        ty = 2.0 * (qz * vx - qx * vz)
        tz = 2.0 * (qx * vy - qy * vx)
        dx = vx + qw * tx + (qy * tz - qz * ty)
        dy = vy + qw * ty + (qz * tx - qx * tz)
        dz = vz + qw * tz + (qx * ty - qy * tx)
        ox = jnp.zeros_like(dx) + cam[0]
        oy = jnp.zeros_like(dy) + cam[1]
        oz = jnp.zeros_like(dz) + cam[2]
        return ox, oy, oz, dx, dy, dz

    # Per-tile cull gates inside the backward kernel were implemented and
    # MEASURED SLOWER (64-leaf 1080p fwd+bwd: 189 -> 255 ms): `jax.grad`
    # through the hierarchical `lax.cond` gates pays cond-transpose
    # machinery per gate per scene eval inside the in-kernel grad graph,
    # which costs more than the leaf-gradient work it skips. The backward
    # stays ungated; cfg.leaf_cull still accelerates the FORWARD pass of
    # the fused VJP (the residual-emitting fine kernel).
    cull_reader = make_cull_reader(spec, n_tx, False)

    def bwd_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, cam_ref, cull_ref,
        tm_ref, hm_ref, *rest,
    ):
        if soft:
            sm_ref, tmn_ref, gr_ref, gg_ref, gb_ref, gout_ref, acc = rest
        else:
            gr_ref, gg_ref, gb_ref, gout_ref, acc = rest
        # 2D image-block layout, mirroring the forward fine kernel (see
        # ops.pallas_prepass fine_kernel two_d): each invocation replays one
        # (bm x LANES)-pixel RECTANGLE for one AA sample. Localized
        # rectangles make the `grads_floor_only` skip actually fire —
        # flat row-major tiles span whole image rows, so on real scenes
        # every tile contained some hit and the skip was dead code.
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        if aa_packed:
            step = ty * n_tx + tx
        else:
            s = pl.program_id(2)
            step = (ty * n_tx + tx) * S + s

        @pl.when(step == 0)
        def _():
            for k in range(NSCAL):
                acc[k] = 0.0

        # --- differentiable scalar inputs, read from SMEM -----------------
        lp_scal = tuple(
            tuple(lp_ref[r, c] for c in range(16)) for r in pushed_rows
        )
        opp_scal = tuple(opp_ref[k] for k in range(n_real))
        cam_scal = tuple(cam_ref[j] for j in range(7))
        scal = (lp_scal, opp_scal, cam_scal)

        def views(sc):
            lp_t, opp_t, cam_t = sc
            return (
                _RowsView({r: lp_t[j] for j, r in enumerate(pushed_rows)}),
                opp_t,
                cam_t,
            )

        # --- primal: raygen + shading replay from the prepass residuals ---
        if aa_packed:
            # Packed strip: sublane u = pixel_row * S + sample.
            u = jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 0)
            pyl = u // S
            s = u - pyl * S
            ii = ty * aa_pack + pyl
            jj = tx * LANES + jax.lax.broadcasted_iota(
                jnp.int32, (TS, LANES), 1
            )
        else:
            ii = ty * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 0)
            jj = tx * LANES + jax.lax.broadcasted_iota(jnp.int32, (bm, LANES), 1)
        a_ = s // naa
        b_ = s - a_ * naa
        fa = (a_.astype(jnp.float32) + 0.5) / naa - 0.5
        fb = (b_.astype(jnp.float32) + 0.5) / naa - 0.5
        x = 2.0 * (jj.astype(jnp.float32) + 0.5) / width - 1.0 + fa * (2.0 / width)
        y = 1.0 - 2.0 * (ii.astype(jnp.float32) + 0.5 + cam_ref[7]) / height + fb * (
            2.0 / height
        )

        rows_p, opp_p, cam_p = views(scal)
        ox, oy, oz, dx, dy, dz = _raygen(cam_p, x, y)
        # Per-tile cull gates (exact: culled leaves cannot influence any hit
        # or tap in this tile, so their parameter gradients are exactly zero
        # — the gated subtrees contribute FAR constants whose grad is 0).
        cull = cull_reader(cull_ref, ty, tx)

        def scene_p(px, py, pz):
            return _scene_tile(rows_p, opp_p, px, py, pz, cull=cull)

        # Forward-march residuals (bitwise the fwd kernel's values).
        t = tm_ref[:]
        hit = hm_ref[:]
        if soft:
            s_min = sm_ref[:]
            t_min = tmn_ref[:]  # frozen (zero-cotangent in the jnp soft
            # VJP too: make_march_soft's bwd drops the t_min cotangent)
            beta_inv = 1.0 / cfg.coverage_beta
            alpha_p = jnp.exp(
                -jnp.maximum(s_min - cfg.min_dist, 0.0) * beta_inv
            )

        if aa_packed:
            # Per-pixel g blocks (aa_pack, LANES) -> per-ray strips, each
            # pixel row repeated for its S samples (py-major).
            def up(v):
                return jnp.broadcast_to(
                    v[:, None, :], (aa_pack, S, LANES)
                ).reshape(TS, LANES)

            gr = up(gr_ref[:]) * inv_s
            gg = up(gg_ref[:]) * inv_s
            gb = up(gb_ref[:]) * inv_s
        else:
            gr = gr_ref[:] * inv_s
            gg = gg_ref[:] * inv_s
            gb = gb_ref[:] * inv_s

        # --- explicit shading path: dL/d(scal, t[, s_min]) -----------------
        def shade_loss_soft(sc, tt, sm):
            rows, opp, cam = views(sc)
            o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
            alpha = jnp.exp(
                -jnp.maximum(sm - cfg.min_dist, 0.0) * (1.0 / cfg.coverage_beta)
            )
            t_eff = jnp.where(hit > 0.5, tt, t_min)
            live = alpha > 1e-4
            px = jnp.where(live, o1x + d1x * t_eff, o1x)
            py = jnp.where(live, o1y + d1y * t_eff, o1y)
            pz = jnp.where(live, o1z + d1z * t_eff, o1z)

            def scene(qx, qy, qz):
                return _scene_tile(rows, opp, qx, qy, qz, cull=cull)

            nx = d1x * 0.0
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
            ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
            tlx = px - lx_
            tly = py - ly_
            tlz = pz - lz_
            linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
            diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
            diff = jnp.maximum(diff, cfg.ambient)
            mar, mag, mab = _albedo_tile(rows, opp, px, py, pz, cull=cull)

            dy_abs_ok = jnp.where(jnp.abs(d1y) > 1e-8, 1.0, 0.0)
            dy_safe = jnp.where(jnp.abs(d1y) > 1e-8, d1y, 1e-8)
            ft = (cfg.floor_y - o1y) / dy_safe
            fx = jnp.clip(o1x + d1x * ft, -1e7, 1e7)
            fz = jnp.clip(o1z + d1z * ft, -1e7, 1e7)
            ipx = jnp.round(fx + 0.5).astype(jnp.int32)
            ipz = jnp.round(fz + 0.5).astype(jnp.int32)
            parity = (jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)).astype(
                jnp.float32
            )
            on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
            fcr = (fb_r + cfg.floor_checker * parity) * on_floor
            fcg = (fb_g + cfg.floor_checker * parity) * on_floor
            fcb = (fb_b + cfg.floor_checker * parity) * on_floor

            miss = 1.0 - alpha
            cr = jnp.sqrt(
                jnp.maximum(alpha * (mar * diff) + miss * fcr, 0.0) + 1e-12
            )
            cg = jnp.sqrt(
                jnp.maximum(alpha * (mag * diff) + miss * fcg, 0.0) + 1e-12
            )
            cb = jnp.sqrt(
                jnp.maximum(alpha * (mab * diff) + miss * fcb, 0.0) + 1e-12
            )
            return jnp.sum(cr * gr + cg * gg + cb * gb)

        def shade_loss(sc, tt):
            rows, opp, cam = views(sc)
            o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
            px = o1x + d1x * tt * hit
            py = o1y + d1y * tt * hit
            pz = o1z + d1z * tt * hit

            def scene(qx, qy, qz):
                return _scene_tile(rows, opp, qx, qy, qz, cull=cull)

            nx = d1x * 0.0
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
            ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
            tlx = px - lx_
            tly = py - ly_
            tlz = pz - lz_
            linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
            diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
            diff = jnp.maximum(diff, cfg.ambient)
            mar, mag, mab = _albedo_tile(rows, opp, px, py, pz, cull=cull)

            dy_abs_ok = jnp.where(jnp.abs(d1y) > 1e-8, 1.0, 0.0)
            dy_safe = jnp.where(jnp.abs(d1y) > 1e-8, d1y, 1e-8)
            ft = (cfg.floor_y - o1y) / dy_safe
            fx = jnp.clip(o1x + d1x * ft, -1e7, 1e7)
            fz = jnp.clip(o1z + d1z * ft, -1e7, 1e7)
            ipx = jnp.round(fx + 0.5).astype(jnp.int32)
            ipz = jnp.round(fz + 0.5).astype(jnp.int32)
            parity = (jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)).astype(
                jnp.float32
            )
            on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
            fcr = (fb_r + cfg.floor_checker * parity) * on_floor
            fcg = (fb_g + cfg.floor_checker * parity) * on_floor
            fcb = (fb_b + cfg.floor_checker * parity) * on_floor

            miss = 1.0 - hit
            cr = jnp.sqrt(jnp.maximum(hit * (mar * diff) + miss * fcr, 0.0) + 1e-12)
            cg = jnp.sqrt(jnp.maximum(hit * (mag * diff) + miss * fcg, 0.0) + 1e-12)
            cb = jnp.sqrt(jnp.maximum(hit * (mab * diff) + miss * fcb, 0.0) + 1e-12)
            return jnp.sum(cr * gr + cg * gg + cb * gb)

        def grads_full():
            if soft:
                gscal1, gt, gs = jax.grad(
                    shade_loss_soft, argnums=(0, 1, 2)
                )(scal, t, s_min)
            else:
                gscal1, gt = jax.grad(shade_loss, argnums=(0, 1))(scal, t)
                gs = None

            # --- implicit term: dL/dt through the hit constraint -----------
            _, fdot = jax.jvp(
                lambda tt: scene_p(ox + dx * tt, oy + dy * tt, oz + dz * tt),
                (t,),
                (jnp.ones_like(t),),
            )
            c = cfg.grad_denom_clamp
            denom = jnp.where(
                jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c)
            )
            w = -gt * hit / denom

            def implicit_loss(sc):
                rows, opp, cam = views(sc)
                o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
                qx = o1x + d1x * t * hit
                qy = o1y + d1y * t * hit
                qz = o1z + d1z * t * hit
                total = jnp.sum(
                    w * _scene_tile(rows, opp, qx, qy, qz, cull=cull)
                )
                if soft:
                    # Envelope (Danskin) term: d s_min/dtheta =
                    # F_theta(x(t_min)) at the FROZEN argmin — mirrors
                    # ops.march.make_march_soft's bwd exactly (incl. the
                    # camera chain through o + d*t_min).
                    ex = o1x + d1x * t_min
                    ey = o1y + d1y * t_min
                    ez = o1z + d1z * t_min
                    total = total + jnp.sum(
                        gs * _scene_tile(rows, opp, ex, ey, ez, cull=cull)
                    )
                return total

            gscal2 = jax.grad(implicit_loss)(scal)
            flat1 = jax.tree_util.tree_leaves(gscal1)
            flat2 = jax.tree_util.tree_leaves(gscal2)
            return [g1 + g2 for g1, g2 in zip(flat1, flat2)]

        def grads_floor_only():
            # No lane in this tile hit a surface, so shade_loss reduces
            # EXACTLY to its floor/background term: the scene-parameter
            # gradients are structurally zero and only the camera pose feeds
            # the checkerboard. Skipping the tap/scene transposes here is
            # exact, not an approximation — and ~half of all 1080p blocks on
            # typical scenes are sky/floor-only.
            def floor_loss(sc):
                rows, opp, cam = views(sc)
                o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
                dy_abs_ok = jnp.where(jnp.abs(d1y) > 1e-8, 1.0, 0.0)
                dy_safe = jnp.where(jnp.abs(d1y) > 1e-8, d1y, 1e-8)
                ft = (cfg.floor_y - o1y) / dy_safe
                fx = jnp.clip(o1x + d1x * ft, -1e7, 1e7)
                fz = jnp.clip(o1z + d1z * ft, -1e7, 1e7)
                ipx = jnp.round(fx + 0.5).astype(jnp.int32)
                ipz = jnp.round(fz + 0.5).astype(jnp.int32)
                parity = (
                    jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)
                ).astype(jnp.float32)
                on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
                fcr = (fb_r + cfg.floor_checker * parity) * on_floor
                fcg = (fb_g + cfg.floor_checker * parity) * on_floor
                fcb = (fb_b + cfg.floor_checker * parity) * on_floor
                cr = jnp.sqrt(jnp.maximum(fcr, 0.0) + 1e-12)
                cg = jnp.sqrt(jnp.maximum(fcg, 0.0) + 1e-12)
                cb = jnp.sqrt(jnp.maximum(fcb, 0.0) + 1e-12)
                return jnp.sum(cr * gr + cg * gg + cb * gb)

            return jax.tree_util.tree_leaves(jax.grad(floor_loss)(scal))

        # Soft gate, scaled by beta: a skipped tile's dropped coverage
        # gradient is d(alpha)/d(s_min) = alpha/beta per lane, so gating on
        # alpha alone under-weights small-beta configs (round-4 advisor
        # finding). Threshold alpha > 1e-4 * min(1, beta) bounds the
        # dropped per-lane gradient magnitude by 1e-4 — the f32 noise
        # floor of the accumulated sums — for every beta, while still
        # skipping the subnormal alpha halo of the scene.
        _soft_gate = 1e-4 * min(1.0, float(cfg.coverage_beta))
        any_work = (
            jnp.logical_or(jnp.max(hit) > 0.0, jnp.max(alpha_p) > _soft_gate)
            if soft
            else jnp.max(hit) > 0.0
        )
        flat = jax.lax.cond(any_work, grads_full, grads_floor_only)

        # --- accumulate flat ------------------------------------------------
        for k, g in enumerate(flat):
            acc[k] += g

        last = (n_pty * n_tx - 1) if aa_packed else (n_ty * n_tx * S - 1)

        @pl.when(step == last)
        def _():
            for k in range(NSCAL):
                gout_ref[k] = acc[k]

    def _run_bwd(lp, opp, cam_vec, residuals, g_img):
        t_all, hit_all, *soft_res = residuals
        g = jnp.asarray(g_img, jnp.float32).reshape(rows_out, width, 3)
        Hg = Hp_pack if aa_packed else Hp
        gpad = jnp.pad(g, ((0, Hg - rows_out), (0, Wp - width), (0, 0)))
        gr = gpad[:, :, 0]
        gg = gpad[:, :, 1]
        gb = gpad[:, :, 2]

        if compact_bwd:
            arrays = _arrays_from(lp, opp)
            clf, ccf = fwd_render.fine_lists(arrays, cam_vec)
            d_lp, d_opp, gcam = _compact_run(
                lp, opp, cam_vec, clf, ccf, tuple(residuals), gr, gg, gb
            )
            # The padding cam slot (band row offset) stays zero.
            d_cam = jnp.concatenate([gcam, jnp.zeros(1, jnp.float32)])
            return d_lp, d_opp, d_cam

        if aa_packed:
            px_spec = pl.BlockSpec(
                (aa_pack, LANES), lambda ty, tx, *_: (ty, tx),
                memory_space=pltpu.VMEM,
            )
            th_spec = pl.BlockSpec(
                (TS, LANES), lambda ty, tx, *_: (ty, tx),
                memory_space=pltpu.VMEM,
            )
            grid = (n_pty, n_tx)
        else:
            px_spec = pl.BlockSpec(
                (bm, LANES), lambda ty, tx, s, *_: (ty, tx),
                memory_space=pltpu.VMEM,
            )
            th_spec = pl.BlockSpec(
                (bm, LANES), lambda ty, tx, s, *_: (ty * S + s, tx),
                memory_space=pltpu.VMEM,
            )
            grid = (n_ty, n_tx, S)
        # Backward gates disabled (see cull_reader note above); keep the
        # mask operand slot so re-enabling is a two-line change.
        mask = jnp.zeros((1, 1), jnp.int32)

        n_res = 4 if soft else 2
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[th_spec] * n_res + [px_spec, px_spec, px_spec],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.SMEM((NSCAL,), jnp.float32)],
        )
        (gflat,) = pl.pallas_call(
            bwd_kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((NSCAL,), jnp.float32)],
            interpret=interpret,
        )(
            jnp.asarray(ops_np),
            jnp.asarray(arg_np),
            jnp.asarray(slot_np),
            jnp.asarray(opp, jnp.float32),
            jnp.asarray(lp, jnp.float32),
            jnp.asarray(cam_vec, jnp.float32),
            mask,
            t_all,
            hit_all,
            *soft_res,
            gr,
            gg,
            gb,
        )

        # Unpack the flat gradient vector.
        d_lp = jnp.zeros((spec.n_leaves, oc.LEAF_PARAM_WIDTH), jnp.float32)
        off = 0
        for j, r in enumerate(pushed_rows):
            d_lp = d_lp.at[r].set(gflat[off : off + 16])
            off += 16
        d_opp = jnp.zeros((spec.n_instr,), jnp.float32)
        d_opp = d_opp.at[:n_real].set(gflat[off : off + n_real])
        off += n_real
        d_cam = jnp.concatenate([gflat[off : off + 7], jnp.zeros(1, jnp.float32)])
        return d_lp, d_opp, d_cam

    from .tape import macroize_streams

    _mops_np, _marg_np, _mslotk_np, _, _ = macroize_streams(
        ops_np, arg_np, slot_np, n_real, n_macro=spec.n_macro
    )

    def _arrays_from(lp, opp):
        return TapeArrays(
            leaf_params=lp,
            tape_ops=jnp.asarray(ops_np),
            tape_arg=jnp.asarray(arg_np),
            op_param=opp,
            out_slot=jnp.asarray(slot_np),
            macro_ops=jnp.asarray(_mops_np),
            macro_arg=jnp.asarray(_marg_np),
            macro_slotk=jnp.asarray(_mslotk_np),
        )

    @jax.custom_vjp
    def render_lpc(lp, opp, cam_vec):
        arrays = _arrays_from(lp, opp)
        pre = [] if soft else fwd_render.coarse(arrays, cam_vec)
        return fwd_render.fine(arrays, cam_vec, pre)

    def render_fwd(lp, opp, cam_vec):
        arrays = _arrays_from(lp, opp)
        pre = [] if soft else fwd_render.coarse(arrays, cam_vec)
        img, *residuals = fwd_render.fine_res(arrays, cam_vec, pre)
        return img, (lp, opp, cam_vec, tuple(residuals))

    def render_bwd(res, g_img):
        lp, opp, cam_vec, residuals = res
        return _run_bwd(lp, opp, cam_vec, residuals, g_img)

    render_lpc.defvjp(render_fwd, render_bwd)

    def render(arrays: TapeArrays, cam_vec):
        return render_lpc(
            jnp.asarray(arrays.leaf_params, jnp.float32),
            jnp.asarray(arrays.op_param, jnp.float32),
            jnp.asarray(cam_vec, jnp.float32),
        )

    # Introspection: did this build take the O(active) backward, and if
    # not, why? (make_fit_step surfaces this — see backward_info there.)
    render.compact_bwd = compact_bwd
    render.backward_info = {
        "kind": "pallas_compact" if compact_bwd else "pallas_legacy_unrolled",
        "compact": compact_bwd,
        "reason": compact_bwd_reason,
        "aa_packed": bool(aa_packed),
        "bm": bm,
        "soft": soft,
    }
    return render

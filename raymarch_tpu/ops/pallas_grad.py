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


def _make_compact_bwd(spec, cfg, width, height, rows_out, plan, MHL, n_ftx,
                      interpret):
    """O(active) backward kernel for PURE hard-union compact plans.

    The legacy backward kernel holds the whole unrolled scene transpose in
    its grad graph — program size O(n_leaves), and past IMEM capacity the
    core streams instructions per grid step regardless of branches (same
    pathology as the forward, see _make_scene_eval_compact). For a hard
    union the scene transpose is trivial: min-fold sends each evaluation's
    cotangent to the WINNING leaf only. So this kernel:

      1. re-folds the compacted active list at the 4 tap points + the hit
         point, carrying (value, argmin row) — O(active) work, O(1) code;
      2. gets the shading-chain cotangents from jax.grad of a SMALL
         scene-free function (tap values, t, camera as inputs);
      3. loops the active rows once more, accumulating each winner-masked
         cotangent through jax.vjp of the SINGLE-leaf distance (exact
         per-type/rotation partials for free) into an O(1)-size VMEM
         accumulator via one-hot row masks — no dynamic scatter;
      4. assembles the implicit-function t term and the camera chain from
         the same per-row loop's position cotangents + one raygen vjp.

    No-hit tiles contribute EXACTLY zero gradient (the floor/miss chain is
    piecewise constant: checker parity passes an int cast, all gates select
    constants), so they skip everything. Returns
    run(lp, cam_vec, clf, ccf, t_all, hit_all, gr, gg, gb)
      -> (d_lp[n_leaves,16->LEAF_PARAM_WIDTH], d_cam[7]).
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
    groups = [
        (g["offset"], g["count_idx"], g["ltype"], g["rotated"])
        for gi in plan["pool"]
        for g in [plan["groups"][gi]]
    ]
    NLP = ((spec.n_leaves + 7) // 8) * 8  # sublane-padded accumulator rows
    NC = oc.LEAF_PARAM_WIDTH  # param cols accumulated per leaf
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

    def bwd_kernel(
        lp_ref, cam_ref, clf_ref, ccf_ref,
        tm_ref, hm_ref, gr_ref, gg_ref, gb_ref,
        gleaf_ref, gcam_ref, accv, acc_cam,
    ):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        step = ty * n_tx + tx

        @pl.when(step == 0)
        def _():
            accv[:] = jnp.zeros_like(accv)
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

        def up(v):
            return jnp.broadcast_to(
                v[:, None, :], (aa_pack, S, LANES)
            ).reshape(TS, LANES)

        gr = up(gr_ref[:]) * inv_s
        gg = up(gg_ref[:]) * inv_s
        gb = up(gb_ref[:]) * inv_s

        tid = ((ty * aa_pack) // MHL) * n_ftx + tx

        def do_tile():
            th = t * hit
            px = ox + dx * th
            py = oy + dy * th
            pz = oz + dz * th
            pts = [
                (px + kx * eps, py + ky * eps, pz + kz * eps)
                for (kx, ky, kz) in _TAPS
            ] + [(px, py, pz)]

            # Pass 1: winner folds (value + argmin row) at the 5 points.
            vals, wins = [], []
            for pt in pts:
                acc0 = px * 0.0 + FAR
                win0 = jnp.zeros((TS, LANES), jnp.int32) - 1

                def fold(acc_win, pt=pt):
                    acc, win = acc_win
                    for off, cidx, lt, rot in groups:
                        def body(j, carry, _off=off, _lt=lt, _rot=rot):
                            a, w = carry
                            row = clf_ref[tid, _off + j]
                            dv = _leaf_distance_tile(
                                lp_ref, row, _lt, _rot, *pt
                            )
                            sel = dv < a
                            return (
                                jnp.minimum(a, dv),
                                jnp.where(sel, row, w),
                            )

                        acc, win = jax.lax.fori_loop(
                            0, ccf_ref[tid, cidx], body, (acc, win)
                        )
                    return acc, win

                acc, win = fold((acc0, win0))
                vals.append(acc)
                wins.append(win)
            win_pos = wins[4]

            # Pass 2: fdot = grad_x(scene) . d at pos (winner-masked jvp).
            fdot = px * 0.0
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
                    return fd + jnp.where(win_pos == row, dd, 0.0)

                fdot = jax.lax.fori_loop(
                    0, ccf_ref[tid, cidx], body2, fdot
                )

            # Pass 3: shading cotangents from the scene-free chain.
            def shade_small(inp):
                f0, f1, f2, f3, tt, cam = inp
                o1x, o1y, o1z, d1x, d1y, d1z = _raygen(cam, x, y)
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
                miss = 1.0 - hit
                cr = jnp.sqrt(
                    jnp.maximum(hit * (ax_ * diff) + miss * fcr, 0.0) + 1e-12
                )
                cg = jnp.sqrt(
                    jnp.maximum(hit * (ay_ * diff) + miss * fcg, 0.0) + 1e-12
                )
                cb = jnp.sqrt(
                    jnp.maximum(hit * (az_ * diff) + miss * fcb, 0.0) + 1e-12
                )
                return jnp.sum(cr * gr + cg * gg + cb * gb)

            w0, w1, w2, w3, gt_shade, gcam_shade = jax.grad(shade_small)(
                (vals[0], vals[1], vals[2], vals[3], t, cam_scal)
            )
            wlist = [w0, w1, w2, w3]

            # Pass 4a: tap cotangents -> per-leaf param grads + position
            # cotangents (feeding t and the camera chain).
            lane = jax.lax.broadcasted_iota(jnp.int32, (NLP, LANES), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (NLP, LANES), 0)

            def accum_row(row, gp16):
                acc = jnp.zeros((NLP, LANES), jnp.float32)
                for c, g in enumerate(gp16):
                    acc = acc + jnp.where(
                        jnp.logical_and(rowi == row, lane == c), g, 0.0
                    )
                accv[:] += acc

            gt_extra = px * 0.0
            go = [px * 0.0, px * 0.0, px * 0.0]
            gd = [px * 0.0, px * 0.0, px * 0.0]

            # Taps-only loop (i < 4) to get gt_extra, then the implicit
            # loop with w_pos. Two row sweeps keep the dataflow acyclic.
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
                        cot = wlist[i] * jnp.where(wins[i] == row, 1.0, 0.0)
                        _, vjp_f = jax.vjp(f, params, *pts[i])
                        gprm, gqx, gqy, gqz = vjp_f(cot)
                        g16_tot = [a + b for a, b in zip(g16_tot, gprm)]
                        gt_e = gt_e + (gqx * dx + gqy * dy + gqz * dz) * hit
                        gox = gox + gqx
                        goy = goy + gqy
                        goz = goz + gqz
                        gdx = gdx + gqx * th
                        gdy = gdy + gqy * th
                        gdz = gdz + gqz * th
                    accum_row(row, g16_tot)
                    return (gt_e, gox, goy, goz, gdx, gdy, gdz)

                carry = (gt_extra, go[0], go[1], go[2], gd[0], gd[1], gd[2])
                carry = jax.lax.fori_loop(
                    0, ccf_ref[tid, cidx], body_tap, carry
                )
                gt_extra, go[0], go[1], go[2], gd[0], gd[1], gd[2] = carry

            gt_total = gt_shade + gt_extra
            c = cfg.grad_denom_clamp
            denom = jnp.where(
                jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c)
            )
            w_pos = -gt_total * hit / denom

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

                    cot = w_pos * jnp.where(win_pos == row, 1.0, 0.0)
                    _, vjp_f = jax.vjp(f, params, px, py, pz)
                    gprm, gqx, gqy, gqz = vjp_f(cot)
                    accum_row(row, list(gprm))
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

            # Camera chain for the scene-side cotangents: one raygen vjp.
            _, rg_vjp = jax.vjp(lambda cam: _raygen(cam, x, y), cam_scal)
            (gcam_extra,) = rg_vjp(
                (go[0], go[1], go[2], gd[0], gd[1], gd[2])
            )
            for j in range(7):
                acc_cam[j] += gcam_shade[j] + gcam_extra[j]

        @pl.when(jnp.max(hit) > 0.0)
        def _():
            do_tile()

        @pl.when(step == n_pty * n_tx - 1)
        def _():
            gleaf_ref[:] = accv[:]
            for j in range(7):
                gcam_ref[j] = acc_cam[j]

    def run(lp, cam_vec, clf, ccf, t_all, hit_all, gr, gg, gb):
        px_spec = pl.BlockSpec(
            (aa_pack, LANES), lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        th_spec = pl.BlockSpec(
            (TS, LANES), lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pty, n_tx),
            in_specs=[th_spec, th_spec, px_spec, px_spec, px_spec],
            out_specs=[
                pl.BlockSpec(
                    (NLP, LANES), lambda ty, tx, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((NLP, LANES), jnp.float32),
                pltpu.SMEM((7,), jnp.float32),
            ],
        )
        gleaf, gcam = pl.pallas_call(
            bwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NLP, LANES), jnp.float32),
                jax.ShapeDtypeStruct((7,), jnp.float32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(lp, jnp.float32),
            jnp.asarray(cam_vec, jnp.float32),
            clf,
            ccf,
            t_all,
            hit_all,
            gr,
            gg,
            gb,
        )
        d_lp = gleaf[: spec.n_leaves, : oc.LEAF_PARAM_WIDTH]
        return d_lp, gcam

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
    compact_bwd = (
        _plan is not None
        and _plan["seg1"] is None
        and not _plan["stream"]
        and not _plan["residual_ops"]
        and not spec.has_materials
        and 128 % S_ == 0
        and aa_packed is not False
        and not soft
    )
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
        # for the backward either — use the legacy unrolled kernel.
        compact_bwd = False
    if compact_bwd:
        _info = fwd_render.compact_info
        _compact_run = _make_compact_bwd(
            spec, cfg, width, height, rows_out, _info["plan"],
            _info["MHL"], _info["n_ftx"], interpret,
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

        # Soft gate at the shading LIVE threshold (alpha > 1e-4, the
        # same cut shade_soft applies to positions): tiles below it carry
        # only sub-1e-4-scale coverage gradients — under the f32 gradient
        # noise floor — and would otherwise fire on the entire subnormal
        # halo of the scene.
        any_work = (
            jnp.logical_or(jnp.max(hit) > 0.0, jnp.max(alpha_p) > 1e-4)
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
            d_lp, gcam = _compact_run(
                lp, cam_vec, clf, ccf, t_all, hit_all, gr, gg, gb
            )
            # Pure hard-union plans carry no op params (grads identically
            # zero); the padding cam slot stays zero.
            d_opp = jnp.zeros((spec.n_instr,), jnp.float32)
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

    # Introspection: did this build take the O(active) backward?
    render.compact_bwd = compact_bwd
    return render

"""Cone-tracing AA prepass: shared coarse march for all AA rays of a pixel.

The reference marches every AA sample from t=0 (16 rays/pixel,
src/ray_marching/ray_marching.wgsl:44-71), so the expensive camera-to-surface
traversal is paid 16x per pixel. But the 16 sub-pixel rays of one pixel
deviate from the pixel-center ray by at most a fraction of a pixel's angular
footprint, and an SDF is 1-Lipschitz: if the center ray's distance value at
parameter t satisfies d(t) >= omega*t (omega = max angular deviation), then
NO sub-pixel ray of that pixel has crossed the surface before t. This is
classic cone tracing used as an accelerator, and it is conservative by
construction.

Two Pallas kernels:

1. **Coarse kernel** — one ray per pixel center, marched with the
   cone-widened stopping threshold `min_dist + omega*t` and the conservative
   step `(d - omega*t)/(1+omega)`. Emits per-pixel `t0` (safe start distance
   for every AA ray of that pixel) and `status` (1 = stopped near a surface,
   0 = escaped / iteration budget exhausted -> miss).

   Worst-case penetration of a fine ray at t0 is omega^2*t0/(1+omega)
   (derivation in `_cone_march_tile`): ~4e-7*t at 1080p — 5 orders of
   magnitude below min_dist, so fine-ray hits are detected identically.

2. **Fine kernel** — fully fused render (raygen + march-from-t0 + tetrahedron
   normals + Lambertian + checkerboard floor + sqrt gamma, matching
   wgsl:87-131) over a 2D grid (pixel_tile, aa_sample). The AA mean is
   accumulated IN-KERNEL across the sample grid dimension (the output block
   is revisited per sample), so the kernel writes the final H*W image — HBM
   traffic is S*16x lower than materializing per-sample colors. The 4-tap
   normal block is gated behind a scalar `any(hit)` branch so miss-only tiles
   (background/floor) skip 4 scene evaluations.

Net effect at 1080p/16AA: the camera-to-surface march cost is paid once per
pixel instead of once per AA sample; fine rays march only the last few steps.
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
from .tape import TapeArrays, TapeSpec
from .pallas_march import (
    LANES,
    _leaf_static_rows,
    _make_scene_eval,
    _scratch_shapes,
    compute_bound,
)
from .culling import leaf_bound_spheres, make_cull_reader, tile_leaf_masks

BM_COARSE = 32
BM_FINE = 128


def _auto_bm(spec, requested, cap):
    """Tile height: big tiles amortize dispatch, but the unrolled static-tape
    scene eval's VMEM residency grows with the leaf count — large scenes need
    shorter tiles (v5e VMEM is 16MB; the 64-leaf bench OOMs at bm=128)."""
    if requested is not None:
        return requested
    n = spec.n_leaves
    if n <= 24:
        return cap
    if n <= 96:
        return min(cap, 64)
    return min(cap, 32)


def cone_omega(cfg: RenderConfig, width: int, height: int, block: int = 1) -> float:
    """Max angular deviation (radians, conservative) of any AA sample ray in a
    `block x block` pixel tile from the tile-center ray. Pixel centers sit at
    most (block-1)/2 pixels from the tile center and sub-pixel offsets add
    0.5 - 0.5/n (ops.raygen.aa_offsets), bounded together by block/2. View-
    plane points sit at |p| >= 1 (z=-1 plane) so the chord bound |offset|
    bounds the angle; a 1.5x safety factor absorbs the chord-vs-angle slack."""
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    pw = 2.0 * tanf * aspect / width
    ph = 2.0 * tanf / height
    n = cfg.aa_samples
    if block == 1:
        off = max(0.5 - 0.5 / n, 0.0)
    else:
        off = block / 2.0
    return 1.5 * off * math.sqrt(pw * pw + ph * ph)


def _bound_clip(bound, ox, oy, oz, dx, dy, dz, live_init, t_init, t_cap, cfg):
    """Clip a ray batch against the scene bounding sphere (same math as
    ops.pallas_march._march_tile): returns updated (live, t0, t_cap)."""
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
    use = bvalid > 0.0
    live = jnp.where(use, hit_bound, live_init)
    t0 = jnp.where(use, jnp.maximum(t_enter, 0.0) * hit_bound, t_init)
    cap = jnp.where(use, t_exit + cfg.min_dist, t_cap)
    return live, t0, cap


def _cone_march_tile(scene, ox, oy, oz, dx, dy, dz, cfg, omega, bound,
                     t_in=None, live_in=None):
    """Cone march one tile of cone-center rays -> (t0, status) f32 tiles.

    status=1: stopped by the cone threshold (d < min_dist + omega*t); every
    ray within the cone is guaranteed un-crossed up to t0 (penetration
    bound omega^2*t/(1+omega), see module docstring). status=0: escaped
    (d > max_dist or past the bound exit) or budget exhausted -> miss.

    `(t_in, live_in)` chain from a WIDER enclosing cone's prepass: rays the
    wider cone killed stay dead, survivors start at its stop distance
    (conservative because omega_wide > omega implies the wider guarantee
    covers this cone's rays).
    """
    zero = dx * 0.0
    t_init = zero
    live_init = zero + 1.0
    t_cap = zero + 3.0e38
    if bound is not None:
        live_init, t_init, t_cap = _bound_clip(
            bound, ox, oy, oz, dx, dy, dz, live_init, t_init, t_cap, cfg
        )
    if t_in is not None:
        live_init = live_init * live_in
        t_init = jnp.maximum(t_init, t_in) * live_in
    inv1w = 1.0 / (1.0 + omega)

    def cond(state):
        k, _, live, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    def step(state):
        k, t, live, near = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        act = jnp.where(k < cfg.max_iter, live, live * 0.0)
        slack = d - omega * t
        near_now = jnp.where(slack < cfg.min_dist, act, 0.0)
        escaped = jnp.where(jnp.logical_or(d > cfg.max_dist, t > t_cap), act, 0.0)
        escaped = escaped - escaped * near_now
        advance = act - near_now - escaped
        t2 = t + slack * inv1w * advance
        return (k + 1, t2, live - near_now - escaped, near + near_now)

    K = max(1, int(cfg.exit_check_every))
    if K == 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, K, lambda _, s: step(s), state)

    state = (jnp.int32(0), t_init, live_init, zero)
    _, t, _, near = jax.lax.while_loop(cond, body, state)
    return t, near


def _fine_march_tile(scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg):
    """Plain sphere tracing from per-ray start t0 (reference march semantics,
    wgsl:87-115) -> (t, hit). Dead lanes (live0=0) never evaluate."""
    zero = dx * 0.0

    def cond(state):
        k, _, live, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    def step(state):
        k, t, live, hit = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        act = jnp.where(k < cfg.max_iter, live, live * 0.0)
        hit_now = jnp.where(d < cfg.min_dist, act, 0.0)
        escaped = jnp.where(jnp.logical_or(d > cfg.max_dist, t > t_cap), act, 0.0)
        escaped = escaped - escaped * hit_now
        advance = act - hit_now - escaped
        t2 = t + d * advance
        return (k + 1, t2, live - hit_now - escaped, hit + hit_now)

    K = max(1, int(cfg.exit_check_every))
    if K == 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, K, lambda _, s: step(s), state)

    state = (jnp.int32(0), t0, live0, zero)
    _, t, _, hit = jax.lax.while_loop(cond, body, state)
    return t, hit


@functools.lru_cache(maxsize=None)
def make_pallas_image_render_aa(
    spec: TapeSpec,
    cfg: RenderConfig,
    width: int,
    height: int,
    interpret: bool = False,
    bm_coarse: int | None = None,
    bm_fine: int | None = None,
    prepass_block: int = 4,
    band_rows: int | None = None,
    prepass_chain: bool = False,
):
    """Fused forward renderer with the cone-tracing AA prepass:
    fn(arrays, cam_vec f32[8]=(pos3, quat4, row_offset)) -> image
    f32[band_rows or H, W, 3].

    `band_rows` renders a horizontal band of the full W x H image: the band
    starts at image row `cam_vec[7]` (a runtime value, so one compiled kernel
    serves every band — this is how the row-sharded multi-chip renderer runs
    the fused kernels per device). `band_rows=None` renders the full image
    (callers pass 0.0 in the offset slot).

    `prepass_block` = B marches ONE cone ray per BxB pixel tile (cone wide
    enough to cover every AA sample of the tile); B=1 is a per-pixel prepass.
    The block-level start distances are expanded pixel-wise between the two
    kernels with a plain XLA repeat (bandwidth-trivial: H*W*4 bytes).

    Semantically equivalent to `make_pallas_image_render` + AA averaging
    (hits agree within the min_dist tolerance; see module docstring for the
    conservative-cone argument); AA samples share the coarse march.
    """
    bm_coarse = _auto_bm(spec, bm_coarse, BM_COARSE * 2)
    bm_fine = _auto_bm(spec, bm_fine, BM_FINE)
    leaf_rows = _leaf_static_rows(spec)
    scene_eval = _make_scene_eval(spec, cfg, leaf_rows, bm_coarse)
    scene_eval_f = _make_scene_eval(spec, cfg, leaf_rows, bm_fine)
    from .pallas_march import _make_scene_color_eval

    color_eval = (
        _make_scene_color_eval(spec, cfg, leaf_rows, bm_fine)
        if spec.has_materials
        else None
    )
    naa = cfg.aa_samples
    S = naa * naa
    rows_out = band_rows if band_rows is not None else height
    hw = rows_out * width
    bs = max(1, int(prepass_block))
    hb = (rows_out + bs - 1) // bs
    wb = (width + bs - 1) // bs
    n_pad = ((hw + bm_fine * LANES - 1) // (bm_fine * LANES)) * (bm_fine * LANES)
    tanf = math.tan(cfg.fovy / 2.0)
    aspect = width / height
    omega = cone_omega(cfg, width, height, bs)
    lx_, ly_, lz_ = cfg.light_position
    ax_, ay_, az_ = cfg.albedo
    fb_r, fb_g, fb_b = cfg.floor_base
    eps = cfg.normal_eps

    def _pixel_xy(lin, i0):
        """Pixel-center screen coords for band-local flat pixel indices; `i0`
        is the band's first image row (f32 scalar)."""
        i = lin // width
        j = lin - i * width
        x = 2.0 * (j.astype(jnp.float32) + 0.5) / width - 1.0
        y = 1.0 - 2.0 * (i.astype(jnp.float32) + 0.5 + i0) / height
        return x, y

    def _view_dirs(x, y, cam_ref):
        vx = x * (tanf * aspect)
        vy = y * tanf
        vz = jnp.full(x.shape, -1.0, jnp.float32)
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
        return dx, dy, dz

    # Coarse 2D padded block-grid geometry (defined before the kernels: the
    # culling masks are per grid tile).
    hb_p = ((hb + bm_coarse - 1) // bm_coarse) * bm_coarse
    wb_p = ((wb + LANES - 1) // LANES) * LANES
    n_cty, n_ctx = hb_p // bm_coarse, wb_p // LANES
    # 2D-block layout geometry for the forward fine pass.
    Hp = ((rows_out + bm_fine - 1) // bm_fine) * bm_fine
    Wp = ((width + LANES - 1) // LANES) * LANES
    n_fty, n_ftx = Hp // bm_fine, Wp // LANES
    cull_coarse = make_cull_reader(spec, n_ctx, cfg.leaf_cull)
    cull_fine = make_cull_reader(spec, n_ftx, cfg.leaf_cull)

    # ------------- coarse kernel: 1 cone ray per BxB pixel block -------------
    def coarse_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, t0_ref, st_ref, *scratch
    ):
        # 2D tiling over the (hb x wb) block grid (same rationale as the
        # fine kernel's two_d layout): tiles are localized image rectangles,
        # so tiles whose rays all miss the scene bounding sphere exit the
        # cone march in zero iterations instead of running to the slowest
        # ray of a whole image row.
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        bi = (
            ty * bm_coarse
            + jax.lax.broadcasted_iota(jnp.int32, (bm_coarse, LANES), 0)
        )
        bj = (
            tx * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (bm_coarse, LANES), 1)
        )
        # Block-center screen coords (pixel coordinate (b + 0.5) * bs covers
        # every pixel of a partial edge block conservatively).
        x = 2.0 * ((bj.astype(jnp.float32) + 0.5) * bs) / width - 1.0
        y = 1.0 - 2.0 * ((bi.astype(jnp.float32) + 0.5) * bs + cam_ref[7]) / height
        dx, dy, dz = _view_dirs(x, y, cam_ref)
        ox = jnp.full((bm_coarse, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((bm_coarse, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((bm_coarse, LANES), cam_ref[2], jnp.float32)

        cull = cull_coarse(cullc_ref, ty, tx)

        def scene(px, py, pz):
            return scene_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch,
                px, py, pz, cull=cull,
            )

        bnd = (
            (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            if cfg.bound_accel
            else None
        )
        t0, near = _cone_march_tile(scene, ox, oy, oz, dx, dy, dz, cfg, omega, bnd)
        # Padded lanes (outside the hb x wb block grid) are dead.
        valid = jnp.where(
            jnp.logical_and(bi < hb, bj < wb), 1.0, 0.0
        )
        t0_ref[:] = t0
        st_ref[:] = near * valid

    # --------- chained pixel-level coarse (refines the block level) ---------
    omega_px = cone_omega(cfg, width, height, 1)

    def coarse_px_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, tin_ref, sin_ref, t0_ref, st_ref, *scratch
    ):
        # (flat pixel layout: tiles span image rows, so no useful cone —
        # culling stays off in this chained refinement pass)
        pid = pl.program_id(0)
        base = pid * (bm_coarse * LANES)
        lin = (
            base
            + jax.lax.broadcasted_iota(jnp.int32, (bm_coarse, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (bm_coarse, LANES), 1)
        )
        x, y = _pixel_xy(lin, cam_ref[7])
        dx, dy, dz = _view_dirs(x, y, cam_ref)
        ox = jnp.full((bm_coarse, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((bm_coarse, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((bm_coarse, LANES), cam_ref[2], jnp.float32)

        def scene(px, py, pz):
            return scene_eval(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch, px, py, pz
            )

        bnd = (
            (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            if cfg.bound_accel
            else None
        )
        t0, near = _cone_march_tile(
            scene, ox, oy, oz, dx, dy, dz, cfg, omega_px, bnd,
            t_in=tin_ref[:], live_in=sin_ref[:],
        )
        valid = jnp.where(lin < hw, 1.0, 0.0)
        t0_ref[:] = t0
        st_ref[:] = near * valid

    # ---------------- fine kernel: fused render, grid (pixel_tile, sample) --
    share_normals = cfg.aa_shared_normals

    def fine_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, t0_ref, st_ref, r_ref, g_ref, b_ref, *scratch,
        emit_th=False, two_d=False,
    ):
        if emit_th:
            # Residual variant (ops.pallas_grad): also write each sample's
            # (t, hit) so the backward kernel replays shading without
            # re-marching. S blocks per pixel tile, indexed i*S + s.
            tm_ref, hm_ref, *scratch = scratch
        if share_normals:
            # Normal cache persists across the sample grid dim (s is the
            # innermost grid axis, so samples of one pixel tile run
            # back-to-back); reset per pixel tile at s == 0.
            *scratch, nx_ref, ny_ref, nz_ref, nv_ref = scratch
        if two_d:
            # 2D image-block layout: this tile is a (bm_fine x LANES)-pixel
            # RECTANGLE of the image, not bm_fine*LANES consecutive
            # row-major pixels. Flat row-major tiles span ~whole image rows,
            # so on real scenes EVERY tile contains some near-surface pixel
            # and the `any_near` gate + tile-granular march early-exit never
            # fire; localized rectangles make ~all background/floor tiles
            # skip the march and the 4 normal taps entirely (measured 25%
            # of 128x128 blocks near vs ~100% of flat tiles at 1080p).
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            s = pl.program_id(2)
            ii = (
                ty * bm_fine
                + jax.lax.broadcasted_iota(jnp.int32, (bm_fine, LANES), 0)
            )
            jj = (
                tx * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (bm_fine, LANES), 1)
            )
            x = 2.0 * (jj.astype(jnp.float32) + 0.5) / width - 1.0
            y = 1.0 - 2.0 * (ii.astype(jnp.float32) + 0.5 + cam_ref[7]) / height
            cull = cull_fine(cullf_ref, ty, tx)
        else:
            cull = None  # flat tiles span image rows: no useful cone
            pid = pl.program_id(0)
            s = pl.program_id(1)
            base = pid * (bm_fine * LANES)
            lin = (
                base
                + jax.lax.broadcasted_iota(jnp.int32, (bm_fine, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (bm_fine, LANES), 1)
            )
            x, y = _pixel_xy(lin, cam_ref[7])
        # Sub-pixel offset for sample s (scalar; s = a*naa + b as in raygen).
        a = s // naa
        b = s - a * naa
        fa = (a.astype(jnp.float32) + 0.5) / naa - 0.5
        fb = (b.astype(jnp.float32) + 0.5) / naa - 0.5
        x = x + fa * (2.0 / width)
        y = y + fb * (2.0 / height)
        dx, dy, dz = _view_dirs(x, y, cam_ref)
        ox = jnp.full((bm_fine, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((bm_fine, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((bm_fine, LANES), cam_ref[2], jnp.float32)

        def scene(px, py, pz):
            return scene_eval_f(
                lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch,
                px, py, pz, cull=cull,
            )

        t0 = t0_ref[:]
        live0 = st_ref[:]
        t_cap = dx * 0.0 + 3.0e38
        if cfg.bound_accel:
            bnd = (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            # Only the exit cap matters (start comes from the prepass).
            _, _, t_cap = _bound_clip(
                bnd, ox, oy, oz, dx, dy, dz, live0, t0, t_cap, cfg
            )

        any_near = jnp.max(live0) > 0.0

        if share_normals:

            @pl.when(s == 0)
            def _():
                # Zero the whole cache: scratch is uninitialized VMEM, and a
                # stray NaN/inf would survive the hit-mask multiply
                # (NaN * 0 = NaN). Zero normals shade to diffuse 0 and are
                # only ever read masked-out.
                nx_ref[:] = jnp.zeros_like(nx_ref)
                ny_ref[:] = jnp.zeros_like(ny_ref)
                nz_ref[:] = jnp.zeros_like(nz_ref)
                nv_ref[:] = jnp.zeros_like(nv_ref)

        def _normal_taps(px, py, pz):
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

        def do_surface():
            t, hit = _fine_march_tile(
                scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg
            )
            px = ox + dx * t * hit
            py = oy + dy * t * hit
            pz = oz + dz * t * hit
            if not share_normals:
                nx, ny, nz = _normal_taps(px, py, pz)
            else:
                # First sample to hit a lane computes the 4-tap normal at its
                # own hit point and caches it; later samples of the pixel
                # reuse it (diffuse still uses their own hit position). The
                # tap block is skipped entirely once every hit lane has a
                # cached normal — in the common case it runs once per pixel
                # tile instead of once per AA sample.
                need = hit * (1.0 - nv_ref[:])

                def calc():
                    return _normal_taps(px, py, pz)

                def skip():
                    z = dx * 0.0
                    return z, z, z

                nxn, nyn, nzn = jax.lax.cond(jnp.max(need) > 0.0, calc, skip)
                fresh = need > 0.0
                nx = jnp.where(fresh, nxn, nx_ref[:])
                ny = jnp.where(fresh, nyn, ny_ref[:])
                nz = jnp.where(fresh, nzn, nz_ref[:])
                nx_ref[:] = nx
                ny_ref[:] = ny
                nz_ref[:] = nz
                nv_ref[:] = jnp.maximum(nv_ref[:], hit)
            ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
            tlx = px - lx_
            tly = py - ly_
            tlz = pz - lz_
            linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
            diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
            diff = jnp.maximum(diff, cfg.ambient)
            # Per-hit albedo (material system; one extra scene eval). Force
            # tiles so both cond branches return matching shapes.
            if color_eval is not None:
                _, mar, mag, mab = color_eval(lp_ref, opp_ref, px, py, pz, cull=cull)
                mar = dx * 0.0 + mar
                mag = dx * 0.0 + mag
                mab = dx * 0.0 + mab
            else:
                mar = dx * 0.0 + ax_
                mag = dx * 0.0 + ay_
                mab = dx * 0.0 + az_
            return t, hit, diff, mar, mag, mab

        def no_surface():
            z = dx * 0.0
            return z, z, z, z + ax_, z + ay_, z + az_

        t_m, hit, diff, mar, mag, mab = jax.lax.cond(any_near, do_surface, no_surface)
        if emit_th:
            tm_ref[:] = t_m
            hm_ref[:] = hit

        # Analytic checkerboard floor on miss (wgsl:117-128).
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
        cr = jnp.sqrt(jnp.maximum(hit * (mar * diff) + miss * fcol_r, 0.0) + 1e-12)
        cg = jnp.sqrt(jnp.maximum(hit * (mag * diff) + miss * fcol_g, 0.0) + 1e-12)
        cb = jnp.sqrt(jnp.maximum(hit * (mab * diff) + miss * fcol_b, 0.0) + 1e-12)

        @pl.when(s == 0)
        def _():
            r_ref[:] = jnp.zeros_like(r_ref)
            g_ref[:] = jnp.zeros_like(g_ref)
            b_ref[:] = jnp.zeros_like(b_ref)

        r_ref[:] += cr
        g_ref[:] += cg
        b_ref[:] += cb

        @pl.when(s == S - 1)
        def _():
            r_ref[:] = r_ref[:] * (1.0 / S)
            g_ref[:] = g_ref[:] * (1.0 / S)
            b_ref[:] = b_ref[:] * (1.0 / S)

    def _cull_masks(arrays: TapeArrays, cam_vec):
        """Per-tile packed active-leaf bitmasks for the coarse and fine
        grids (ops.culling). Pure jnp on the dynamic scene arrays + camera:
        scene edits and camera motion re-mask with zero recompilation."""
        if not cfg.leaf_cull:
            dummy = jnp.zeros((1, 1), jnp.int32)
            return dummy, dummy
        bounds = leaf_bound_spheres(spec, arrays, cfg)
        # The coarse kernel marches one cone (half-angle omega) per BxB
        # pixel block; its tile cone = corner angle + omega so it contains
        # every block cone probed by the near test.
        mask_c = tile_leaf_masks(
            bounds, cam_vec, cfg, width, height, n_cty, n_ctx,
            float(bm_coarse * bs), float(LANES * bs), extra_angle=omega,
        )
        mask_f = tile_leaf_masks(
            bounds, cam_vec, cfg, width, height, n_fty, n_ftx,
            float(bm_fine), float(LANES),
        )
        return mask_c, mask_f

    def _scene_args(arrays: TapeArrays, cam_vec):
        mask_c, mask_f = _cull_masks(arrays, cam_vec)
        return (
            jnp.asarray(arrays.tape_ops),
            jnp.asarray(arrays.tape_arg),
            jnp.asarray(arrays.out_slot),
            jnp.asarray(arrays.op_param),
            jnp.asarray(arrays.leaf_params),
            compute_bound(spec, arrays),
            jnp.asarray(cam_vec, jnp.float32),
            mask_c,
            mask_f,
        )

    def run_coarse(scene_args):
        blk = pl.BlockSpec(
            (bm_coarse, LANES),
            lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        coarse_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(hb_p // bm_coarse, wb_p // LANES),
            in_specs=[],
            out_specs=[blk, blk],
            scratch_shapes=_scratch_shapes(spec, bm_coarse),
        )
        t0, status = pl.pallas_call(
            coarse_kernel,
            grid_spec=coarse_spec,
            out_shape=[
                jax.ShapeDtypeStruct((hb_p, wb_p), jnp.float32),
                jax.ShapeDtypeStruct((hb_p, wb_p), jnp.float32),
            ],
            interpret=interpret,
        )(*scene_args)

        # Expand block-level (t0, status) to pixel resolution: a plain XLA
        # broadcast-reshape (H*W*4 bytes — bandwidth-trivial). Also re-pads
        # to the fine kernel's grid when bs == 1 (identity repeat).
        def expand(v):
            v = v[:hb, :wb]
            if bs > 1:
                v = jnp.repeat(jnp.repeat(v, bs, axis=0), bs, axis=1)
            v = v[:rows_out, :width].reshape(-1)
            return jnp.pad(v, (0, n_pad - hw)).reshape(n_pad // LANES, LANES)

        t0, status = expand(t0), expand(status)

        if prepass_chain and bs > 1:
            # Level 2: refine the block-level start distances with a
            # per-pixel cone pass chained from them (rays start at the block
            # cone's stop distance instead of the camera).
            assert n_pad % (bm_coarse * LANES) == 0
            px_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=9,
                grid=(n_pad // (bm_coarse * LANES),),
                in_specs=[
                    pl.BlockSpec(
                        (bm_coarse, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (bm_coarse, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (bm_coarse, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (bm_coarse, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=_scratch_shapes(spec, bm_coarse),
            )
            t0, status = pl.pallas_call(
                coarse_px_kernel,
                grid_spec=px_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
                    jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
                ],
                interpret=interpret,
            )(*scene_args, t0, status)

        return t0, status

    def run_fine_2d(scene_args, t0, status):
        """Forward fine pass over 2D image-rectangle tiles (see fine_kernel's
        two_d branch). Same semantics as the flat layout; background/floor
        tiles skip the march + normal taps."""
        fine_scratch = list(_scratch_shapes(spec, bm_fine))
        if share_normals:
            fine_scratch += [
                pltpu.VMEM((bm_fine, LANES), jnp.float32) for _ in range(4)
            ]

        def to2d(v):
            v = v.reshape(-1)[:hw].reshape(rows_out, width)
            # Padding is status=0 / t0=0: dead lanes, never marched.
            return jnp.pad(v, ((0, Hp - rows_out), (0, Wp - width)))

        blk = pl.BlockSpec(
            (bm_fine, LANES),
            lambda ty, tx, s, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        fine_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(Hp // bm_fine, Wp // LANES, S),
            in_specs=[blk, blk],
            out_specs=[blk, blk, blk],
            scratch_shapes=fine_scratch,
        )
        r, g, b = pl.pallas_call(
            functools.partial(fine_kernel, two_d=True),
            grid_spec=fine_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Hp, Wp), jnp.float32) for _ in range(3)
            ],
            interpret=interpret,
        )(*scene_args, to2d(t0), to2d(status))
        return jnp.stack(
            [v[:rows_out, :width] for v in (r, g, b)], axis=-1
        )

    def run_fine(scene_args, t0, status, emit_th=False):
        if not emit_th:
            return run_fine_2d(scene_args, t0, status)
        fine_scratch = list(_scratch_shapes(spec, bm_fine))
        if share_normals:
            fine_scratch += [
                pltpu.VMEM((bm_fine, LANES), jnp.float32) for _ in range(4)
            ]
        px_spec = pl.BlockSpec(
            (bm_fine, LANES), lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM
        )
        out_specs = [px_spec, px_spec, px_spec]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)
            for _ in range(3)
        ]
        kernel = fine_kernel
        if emit_th:
            # Per-sample residual planes: S blocks per pixel tile, laid out
            # block-major as i*S + s so the backward kernel (same grid)
            # streams them back with the identical index map.
            th_spec = pl.BlockSpec(
                (bm_fine, LANES),
                lambda i, s, *_: (i * S + s, 0),
                memory_space=pltpu.VMEM,
            )
            out_specs += [th_spec, th_spec]
            out_shape += [
                jax.ShapeDtypeStruct((n_pad * S // LANES, LANES), jnp.float32)
                for _ in range(2)
            ]
            kernel = functools.partial(fine_kernel, emit_th=True)
        fine_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(n_pad // (bm_fine * LANES), S),
            in_specs=[px_spec, px_spec],
            out_specs=out_specs,
            scratch_shapes=fine_scratch,
        )
        r, g, b, *th = pl.pallas_call(
            kernel,
            grid_spec=fine_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*scene_args, t0, status)

        img = jnp.stack(
            [v.reshape(-1)[:hw] for v in (r, g, b)], axis=-1
        ).reshape(rows_out, width, 3)
        if emit_th:
            return img, th[0], th[1]
        return img

    def render(arrays: TapeArrays, cam_vec):
        scene_args = _scene_args(arrays, cam_vec)
        t0, status = run_coarse(scene_args)
        return run_fine(scene_args, t0, status)

    # Exposed for instrumentation / custom pipelines.
    render.coarse = lambda arrays, cam_vec: run_coarse(_scene_args(arrays, cam_vec))
    render.fine = lambda arrays, cam_vec, t0, st: run_fine(
        _scene_args(arrays, cam_vec), t0, st
    )
    # Residual-emitting fine pass for the fused VJP (ops.pallas_grad): also
    # returns each AA sample's (t, hit) so the backward kernel skips the
    # re-march (HBM for the residuals is far cheaper than recomputing the
    # march: ~8 f32/pixel vs ~8 full scene evals per sample).
    render.fine_res = lambda arrays, cam_vec, t0, st: run_fine(
        _scene_args(arrays, cam_vec), t0, st, emit_th=True
    )
    return render

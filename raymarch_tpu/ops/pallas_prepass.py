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
    TAP_LOOP_MIN_LEAVES,
    _leaf_static_rows,
    _make_scene_eval,
    _make_scene_eval_compact,
    _scratch_shapes,
    _tet_taps,
    build_compact_plan,
    compute_bound,
    make_compact_refiner,
)
from .culling import (
    compact_plan_rows,
    leaf_bound_spheres,
    make_cull_reader,
    tile_leaf_masks,
)

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


_INF = 3.0e38


def _cone_interval_march_tile(
    scene, ox, oy, oz, dx, dy, dz, cfg, omega, bound, ni
):
    """Cone-march one tile of cone-center rays through the WHOLE scene,
    recording up to `ni` near-intervals [s_j, e_j] per ray.

    Extension of `_cone_march_tile`: instead of stopping at the first
    near point, the center ray keeps going — plain sphere steps while
    inside a near zone (d >= min_dist there, else the center itself hit),
    cone steps `(d - omega*t)/(1+omega)` outside — until it hits, escapes,
    or overflows the interval budget. The cone-tracing invariant (no
    sub-ray of the cone crosses a surface while d_center >= min_dist +
    omega*t; see module docstring) therefore holds across every recorded
    FAR gap, so fine AA rays may sphere-trace interval j and then JUMP
    straight to s_{j+1} — the 16x-per-pixel graze/escape walk collapses
    into this one center-ray scan.

    Conservative fallbacks (e_j = +inf => fine rays march plainly from s_j,
    exactly the legacy behavior): center-ray hit inside zone j; interval
    budget overflow; iteration budget exhausted while a zone is open.

    Returns (starts, ends): two lists of `ni` tiles; s_j = +inf marks "no
    such interval" (a ray with s_0 = +inf never marches at all).
    """
    zero = dx * 0.0
    t_init = zero
    live_init = zero + 1.0
    t_cap = zero + _INF
    if bound is not None:
        live_init, t_init, t_cap = _bound_clip(
            bound, ox, oy, oz, dx, dy, dz, live_init, t_init, t_cap, cfg
        )
    inv1w = 1.0 / (1.0 + omega)

    def cond(state):
        k, _t, live, _near, _idx, _s, _e = state
        return jnp.logical_and(k < cfg.max_iter * 2, jnp.max(live) > 0.0)

    def step(state):
        k, t, live, was_near, idx, starts, ends = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        slack = d - omega * t
        near = jnp.where(slack < cfg.min_dist, live, 0.0)

        # Center-ray hit inside a zone: zone stays open (e = +inf fallback),
        # scanning done.
        hit_c = jnp.where(d < cfg.min_dist, near, 0.0)
        # Escape: past max_dist or the bound exit. (d > max_dist implies
        # not-near; t > t_cap can close an open zone at t.)
        esc = jnp.where(jnp.logical_or(d > cfg.max_dist, t > t_cap), live, 0.0)
        esc = esc - esc * hit_c

        opening = near * (1.0 - was_near)
        closing = jnp.where(was_near > 0.0, (1.0 - near) + esc, 0.0)
        closing = jnp.minimum(closing, 1.0) * live
        overflow = jnp.where(idx > ni - 0.5, opening, 0.0)
        opening = opening - overflow

        new_starts = []
        new_ends = []
        for j in range(ni):
            sel_open = opening * jnp.where(jnp.abs(idx - j) < 0.5, 1.0, 0.0)
            sel_close = closing * jnp.where(jnp.abs(idx - j) < 0.5, 1.0, 0.0)
            sel_hit = hit_c * jnp.where(jnp.abs(idx - j) < 0.5, 1.0, 0.0)
            s = jnp.where(sel_open > 0.0, t, starts[j])
            e = jnp.where(sel_close > 0.0, t, ends[j])
            # Open zone at center-hit: fallback e = +inf.
            e = jnp.where(sel_hit > 0.0, _INF, e)
            # Budget overflow while opening zone ni: previous zone's end
            # reverts to +inf (fine rays march plainly from s_{ni-1} on).
            if j == ni - 1:
                e = jnp.where(overflow > 0.0, _INF, e)
            new_starts.append(s)
            new_ends.append(e)
        idx2 = idx + closing

        live2 = live - hit_c - esc - overflow * live
        live2 = jnp.maximum(live2, 0.0)
        # Plain sphere step inside a zone (d >= min_dist there), cone step
        # outside; dead lanes hold.
        stp = jnp.where(near > 0.0, d, slack * inv1w)
        t2 = t + stp * live2
        return (k + 1, t2, live2, near * live2, idx2, new_starts, new_ends)

    state = (
        jnp.int32(0),
        t_init,
        live_init,
        zero,
        zero,
        [zero + _INF for _ in range(ni)],
        [zero + _INF for _ in range(ni)],
    )
    state = jax.lax.while_loop(cond, step, state)
    _k, _t, live_end, was_near, idx, starts, ends = state
    # Iteration budget exhausted with a zone still open -> fallback e=+inf.
    for j in range(ni):
        sel = was_near * jnp.where(jnp.abs(idx - j) < 0.5, 1.0, 0.0)
        ends[j] = jnp.where(sel > 0.0, _INF, ends[j])
    return starts, ends


def _fine_march_interval_tile(
    scene, ox, oy, oz, dx, dy, dz, starts, ends, valid, t_cap, cfg
):
    """Sphere-trace a tile of AA rays through the near-intervals recorded by
    `_cone_interval_march_tile`: plain (or relaxed, cfg.relax) tracing
    inside interval j; when t steps past e_j, jump to s_{j+1} (safe by the
    cone invariant — no crossing in the far gap); no next interval -> miss.
    `valid` masks padded lanes. Returns (t, hit)."""
    ni = len(starts)
    zero = dx * 0.0
    live0 = jnp.where(starts[0] < 9.0e37, valid, 0.0)
    t0 = jnp.where(live0 > 0.0, starts[0], 0.0)
    relax = cfg.relax if cfg.relax > 1.0 else 1.0

    def cur_end(idx):
        e = ends[ni - 1]
        for j in range(ni - 2, -1, -1):
            e = jnp.where(idx < j + 0.5, ends[j], e)
        return e

    def next_start(idx):
        # start of interval idx+1; +inf when exhausted.
        s = zero + _INF
        for j in range(ni - 1, 0, -1):
            s = jnp.where(idx < j - 0.5, starts[j], s)
        return s

    def cond(state):
        k, _t, _idx, _pr, _sl, _om, live, _hit = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    def step(state):
        k, t, idx, prev_r, step_len, omega, live, hit = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        act = jnp.where(k < cfg.max_iter, live, live * 0.0)
        # Over-relaxation fallback (no-op when cfg.relax == 1).
        fail = jnp.where(
            jnp.logical_and(omega > 1.0, d + prev_r < step_len), act, 0.0
        )
        ok = act - fail
        hit_now = jnp.where(d < cfg.min_dist, ok, 0.0)
        escaped = jnp.where(
            jnp.logical_or(d > cfg.max_dist, t > t_cap), ok, 0.0
        )
        escaped = escaped - escaped * hit_now
        new_step = jnp.where(fail > 0.0, (1.0 - relax) * step_len, omega * d)
        omega2 = jnp.where(fail > 0.0, 1.0, omega)
        live2 = live - hit_now - escaped
        t2 = t + new_step * live2
        # Interval jump: stepped past the current end -> hop to the next
        # start (or miss if there is none). Relaxation restarts clean at the
        # hop (step continuity is meaningless across the gap).
        e = cur_end(idx)
        crossed = jnp.where(t2 > e, live2, 0.0)
        ns = next_start(idx)
        no_more = jnp.where(ns > 9.0e37, crossed, 0.0)
        live3 = live2 - no_more
        jump = crossed - no_more
        t3 = jnp.where(jump > 0.0, jnp.maximum(t2, ns), t2)
        idx2 = idx + jump
        omega3 = jnp.where(jump > 0.0, zero + relax, omega2)
        step3 = jnp.where(jump > 0.0, 0.0, new_step)
        prev3 = jnp.where(jump > 0.0, 0.0, d)
        return (k + 1, t3, idx2, prev3, step3, omega3, live3, hit + hit_now)

    K = max(1, int(cfg.exit_check_every))
    if K == 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, K, lambda _, st: step(st), state)

    state = (
        jnp.int32(0), t0, zero, zero, zero, zero + relax, live0, zero,
    )
    _k, t, _idx, _pr, _sl, _om, _live, hit = jax.lax.while_loop(
        cond, body, state
    )
    return t, hit


def _fine_march_tile_soft(scene, ox, oy, oz, dx, dy, dz, live0, cfg,
                          bound=None):
    """Sphere tracing from t=0 with closest-approach carries: returns
    (t, hit, s_min, t_min). Mirrors ops.march._march_while_soft exactly
    (the jnp soft path): s_min = min over the march of the scene distance
    at live samples, t_min its parameter. Plain stepping only (relax/
    prepass would change the sample sequence and with it the argmin).

    `bound` = (bcx, bcy, bcz, R_soft, valid) with R_soft INFLATED by
    min_dist + 104*coverage_beta. With that inflation the acceleration is
    EXACT, not approximate:
    - a ray missing R_soft has true closest approach >= the inflation, so
      exp(-(s_min - min_dist)/beta) underflows to exactly 0.0 in f32 for
      BOTH paths (alpha = 0, no hit, t unused at alpha 0) — skipping the
      march changes nothing;
    - a ray entering R_soft marches from t=0 with the IDENTICAL sample
      sequence as the un-bounded path until t_cap = t_center + R_soft
      (+ min_dist margin), t_center the chord midpoint (= the projection
      of the bound center). The cap lies past the projection parameter of
      every scene point (any q in the bound projects at t_q <= t_center +
      R_soft), so along the un-bounded path's remaining samples the
      distance to every scene point — hence the scene SDF (R_soft already
      carries the smooth-blend expansion, compute_bound) — is increasing:
      those samples can neither improve s_min nor hit.
    - per-LANE no-improvement exit (round 5): past t_center, |p - c| is
      increasing along the ray, and the scene SDF >= |p - c| - R_soft; a
      live lane has s_min >= min_dist (it never hit), so once
      |p - c| - R_soft > s_min no future sample can improve s_min or hit
      — the lane exits with its results already exact. This is what lets
      grazing lanes stop as soon as they leave their own neighborhood
      instead of marching to the far side of the whole scene bound.
    """
    zero = dx * 0.0
    t_cap = zero + _INF
    t_mid = zero + _INF
    use_bound = False
    if bound is not None:
        bcx, bcy, bcz, br, bvalid = bound
        ocx = ox - bcx
        ocy = oy - bcy
        ocz = oz - bcz
        bq = dx * ocx + dy * ocy + dz * ocz
        c2 = ocx * ocx + ocy * ocy + ocz * ocz - br * br
        disc = bq * bq - c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_exit = -bq + sq
        hit_bound = jnp.where(
            jnp.logical_and(disc > 0.0, t_exit > 0.0), live0, 0.0
        )
        use = bvalid > 0.0
        live0 = jnp.where(use, hit_bound, live0)
        t_cap = jnp.where(use, -bq + br + cfg.min_dist, t_cap)
        t_mid = jnp.where(use, -bq, t_mid)
        use_bound = True

    def cond(state):
        k, _, live, _, _, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    K = max(1, int(cfg.exit_check_every))

    def step(state):
        k, t, live, hit, s_min, t_min = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        act = live if K == 1 else jnp.where(k < cfg.max_iter, live, live * 0.0)
        better = jnp.where(jnp.logical_and(act > 0.0, d < s_min), 1.0, 0.0)
        s_min2 = jnp.where(better > 0.0, d, s_min)
        t_min2 = jnp.where(better > 0.0, t, t_min)
        hit_now = jnp.where(d < cfg.min_dist, act, 0.0)
        esc_c = jnp.logical_or(d > cfg.max_dist, t > t_cap)
        if use_bound:
            pcx = px - bcx
            pcy = py - bcy
            pcz = pz - bcz
            pc = jnp.sqrt(pcx * pcx + pcy * pcy + pcz * pcz + 1e-20)
            noimp = jnp.logical_and(t > t_mid, pc - br > s_min2)
            esc_c = jnp.logical_or(esc_c, noimp)
        escaped = jnp.where(esc_c, act, 0.0)
        escaped = escaped - escaped * hit_now
        advance = act - hit_now - escaped
        t2 = t + d * advance
        return (k + 1, t2, live - hit_now - escaped, hit + hit_now, s_min2, t_min2)

    if K == 1:
        body = step
    else:
        def body(state):
            return jax.lax.fori_loop(0, K, lambda _, s: step(s), state)

    state = (jnp.int32(0), zero, live0, zero, zero + _INF, zero)
    _, t, _, hit, s_min, t_min = jax.lax.while_loop(cond, body, state)
    return t, hit, s_min, t_min


def _fine_march_tile(scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg):
    """Sphere tracing from per-ray start t0 (reference march semantics,
    wgsl:87-115) -> (t, hit). Dead lanes (live0=0) never evaluate.

    With cfg.relax > 1: over-relaxed stepping (Keinert et al. 2014) with the
    same per-ray fallback as ops.pallas_march._march_tile — step omega*d; if
    consecutive safe spheres stop overlapping (d + d_prev < step) the
    relaxed step overshot, so step back and drop that ray to omega=1. Hits
    are only detected at non-overshot samples, so results stay exact sphere
    tracing (modulo grazing sample-sequence sensitivity). This matters most
    HERE: the fine kernel runs per AA sample and its tile-synchronous while
    loop is bounded by the worst (most-grazing) lane of a 16K-pixel tile."""
    zero = dx * 0.0

    if cfg.relax > 1.0:

        def cond_r(state):
            k, _, _, _, _, live, _ = state
            return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

        def body_r(state):
            k, t, prev_r, step_len, omega, live, hit = state
            px = ox + dx * t
            py = oy + dy * t
            pz = oz + dz * t
            d = scene(px, py, pz)
            act = jnp.where(k < cfg.max_iter, live, live * 0.0)
            fail = jnp.where(
                jnp.logical_and(omega > 1.0, d + prev_r < step_len), act, 0.0
            )
            ok = act - fail
            new_step = jnp.where(
                fail > 0.0, (1.0 - cfg.relax) * step_len, omega * d
            )
            omega2 = jnp.where(fail > 0.0, 1.0, omega)
            hit_now = jnp.where(d < cfg.min_dist, ok, 0.0)
            escaped = jnp.where(
                jnp.logical_or(d > cfg.max_dist, t > t_cap), ok, 0.0
            )
            escaped = escaped - escaped * hit_now
            live2 = live - hit_now - escaped
            t2 = t + new_step * live2
            return (k + 1, t2, d, new_step, omega2, live2, hit + hit_now)

        state = (
            jnp.int32(0), t0, zero, zero, zero + cfg.relax, live0, zero,
        )
        _, t, _, _, _, _, hit = jax.lax.while_loop(cond_r, body_r, state)
        return t, hit

    def cond(state):
        k, _, live, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.max(live) > 0.0)

    K = max(1, int(cfg.exit_check_every))

    def step(state):
        k, t, live, hit = state
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        d = scene(px, py, pz)
        # With K == 1 the while cond already guarantees k < max_iter, so the
        # budget guard (two vector ops/step) is only needed when the inner
        # K-block can overrun it.
        act = live if K == 1 else jnp.where(k < cfg.max_iter, live, live * 0.0)
        hit_now = jnp.where(d < cfg.min_dist, act, 0.0)
        escaped = jnp.where(jnp.logical_or(d > cfg.max_dist, t > t_cap), act, 0.0)
        escaped = escaped - escaped * hit_now
        advance = act - hit_now - escaped
        t2 = t + d * advance
        return (k + 1, t2, live - hit_now - escaped, hit + hit_now)

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
    n_intervals: int = 0,
    no_prepass: bool = False,
    aa_packed: bool = False,
    soft: bool = False,
    march_only: bool = False,
    list_smem_budget: int | None = None,
    _dbg_skip_taps: bool = False,
    _dbg_skip_march: bool = False,
):
    """Fused forward renderer with the cone-tracing AA prepass:
    fn(arrays, cam_vec f32[8]=(pos3, quat4, row_offset)) -> image
    f32[band_rows or H, W, 3].

    `no_prepass=True` drops the coarse pass entirely: every AA ray sphere-
    traces from t=0, which is the reference's exact march semantics
    (wgsl:87-115) — no cone conservatism anywhere. The 2D image-rectangle
    tiling, in-kernel AA accumulation, and hit-gated shading are pure
    scheduling/layout choices with identical math, so this is the honest
    "no acceleration" benchmark path (and it is still ~35% faster than the
    flat-layout `make_pallas_image_render` at 1080p).

    `aa_packed=True` switches the fine pass to the AA-PACKED tile layout:
    one kernel invocation owns ALL S = aa^2 samples of an (128/S)-pixel-row
    x 128-pixel-col strip (sublane u = pixel_row*S + sample), instead of a
    128x128-pixel rectangle of a single sample. The tile-synchronous march
    is bounded by the worst ray in the tile, and a 16x-smaller spatial
    footprint is far more depth-coherent than a 16x-larger one re-walked
    once per sample — measured ~2x on the march-bound no-prepass paths.
    The AA mean reduces in-kernel over the sample sub-axis (single output
    visit per tile). Incompatible with `aa_shared_normals` and the
    residual-emitting VJP forward (those keep the per-sample grid).

    `n_intervals` > 0 switches the prepass to NEAR-INTERVAL recording
    (_cone_interval_march_tile): the coarse ray scans the whole scene once,
    and fine AA rays sphere-trace only inside the recorded intervals,
    jumping across the far gaps. Collapses the per-sample graze/escape walk
    (the fine-pass bottleneck: 16 AA samples re-walking the same terrain)
    into one center-ray scan. 0 = legacy first-near prepass.

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
    NI = max(0, int(n_intervals))
    if march_only:
        # March-only mode: the fine pass writes each AA sample's converged
        # (t, hit) and SKIPS shading entirely — the fast path for custom
        # losses / non-image consumers of raw march results, on the same
        # 2-D packed tiling + prepass + compact machinery as the fused
        # renderer (the flat-layout make_pallas_image_march never got that
        # scheduling and runs ~3x slower — round-4 verdict). Packed layout
        # only, and exclusive of soft mode (which has its own residuals).
        if not aa_packed or soft:
            raise ValueError("march_only requires aa_packed=True, soft=False")
    if NI and prepass_chain:
        raise ValueError("prepass_chain is a legacy-prepass feature")
    if no_prepass and (NI or prepass_chain):
        raise ValueError("no_prepass excludes interval/chained prepasses")
    if soft:
        # Soft-coverage rendering (silhouette gradients, ops.march
        # shade_soft semantics): the closest approach s_min can occur
        # anywhere along the ray, so the full march must run (a prepass
        # would skip the approach region, a bound clip would cut it, and
        # relaxed stepping would change the argmin sample) — exact mirror
        # of the jnp soft path requires the plain no-prepass packed layout.
        if not (no_prepass and aa_packed):
            raise ValueError("soft requires no_prepass=True, aa_packed=True")
        if cfg.relax > 1.0:
            raise ValueError("soft requires relax=1.0 (relaxed stepping"
                             " changes the closest-approach sample)")
    # Prepass output planes: legacy (t0, status), NI (start, end) pairs, or
    # none at all (`no_prepass`: every AA ray marches from t=0 — the strict
    # reference semantics of wgsl:87-115, kept on the 2D-tiled fine kernel
    # with in-kernel AA accumulation and hit-gated normals).
    n_pre = 0 if no_prepass else (2 * NI if NI else 2)
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

    # AA-packed fine layout: sublane u = pixel_row * S + sample, so one
    # 128-sublane tile owns all S samples of an aa_pack-row pixel strip.
    TS = 128
    if aa_packed:
        if TS % S:
            raise ValueError("aa_packed needs aa_samples^2 dividing 128")
        if cfg.aa_shared_normals:
            raise ValueError("aa_packed excludes aa_shared_normals")
    aa_pack = max(1, TS // S)
    n_pty = (rows_out + aa_pack - 1) // aa_pack
    Hp_pack = n_pty * aa_pack
    # Cull masks for the packed grid stay at >=64-pixel-row granularity:
    # Mosaic's scoped SMEM charges each prefetched mask ROW per grid step,
    # so per-strip masks at 1080p (2025 rows) blow the 1MB SMEM budget
    # (measured); 64-row super-tiles keep the row count at the bm=64 level
    # with the same tightness the unpacked kernel has. The floor is raised
    # to aa_pack so each packed kernel tile (aa_pack pixel rows) lies inside
    # exactly ONE mask super-tile — with aa_samples=1, aa_pack=128 > 64 and
    # a 64-row mask would cover only the strip's upper half (the lower rows
    # would consult the wrong tile's mask and drop visible leaves).
    MH = max(64, aa_pack)
    n_mty = (Hp_pack + MH - 1) // MH
    cull_packed = make_cull_reader(spec, n_ftx, cfg.leaf_cull)

    # Compacted O(active)-leaf evaluation for segmentable scenes (hard
    # unions, smooth-union chains, subtractions — see
    # pallas_march.build_compact_plan): branches around the unrolled static
    # body do not shrink the many-leaf kernels (measured — see
    # _make_scene_eval_compact), so for this scene class the kernels
    # instead loop a runtime per-tile active count over host-compacted
    # item lists. Same masks, same FAR lemma, exact fold reordering rules.
    plan = build_compact_plan(spec) if cfg.leaf_cull else None
    compact = plan is not None
    scene_compact = (
        _make_scene_eval_compact(spec, cfg, plan) if compact else None
    )
    # Compacted lists live in SMEM (scalar-prefetch) and are n_leaves wide,
    # so they get their own COARSER super-tile grids than the bitmasks: at
    # full mask granularity a 4K band's two [360, 64] i32 lists alone blow
    # the 1 MB SMEM budget (measured: 1.09M used). Conservative by
    # construction — a bigger tile's cone contains its sub-tiles' cones.
    # Adaptive granularity: start at the mask grids' granularity and
    # coarsen whichever list is currently bigger (doubling its tile height)
    # until both lists fit a fixed SMEM budget. Finer fine-lists matter
    # more (the fine kernel dominates), so the coarse list usually coarsens
    # first.
    # Chip-calibrated, regime-gated: at 1080p-class grids scoped SMEM
    # totals ~2x(list bytes) + ~0.21 MB against the 1 MB capacity, so a
    # 330 KB list budget fits with margin — the round-3 96 KB budget was
    # far too conservative there (it coarsened a 256-leaf fine list to
    # 512-row super-tiles, inflating mean active leaves/tile from 1.9 to
    # 13.2 and costing 2.8x frame time). At 4K-class grids Mosaic's fixed
    # scoped overhead is several hundred KB larger (measured: a 4K band
    # with 184 KB of lists still exceeds 1 MB), and the cost model is not
    # linear in anything we can see from here — so grids past ~2048 fine
    # tiles keep the conservative 96 KB point that is known to compile.
    _n_fine_tiles = (n_pty if aa_packed else n_fty) * n_ftx
    _LIST_SMEM_BUDGET = (
        330 * 1024 if _n_fine_tiles <= 2048 else 96 * 1024
    )
    if list_smem_budget is not None:  # test hook: force coarsening/refine
        _LIST_SMEM_BUDGET = int(list_smem_budget)
    CLG = 1  # coarse-kernel list tile = CLG coarse grid rows
    CLW = 1  # ... and CLW coarse grid columns
    # Fine-list super-tile height in PIXEL rows. Floor = the fine kernel's
    # tile height (bm_fine pixel rows unpacked, aa_pack packed), so every
    # kernel tile lies inside exactly ONE list super-tile — the kernels
    # index the list at (tile_row_base // MHL) once per tile, and a tile
    # straddling two super-tiles would evaluate its lower rows against the
    # upper half's list, silently FAR-substituting visible leaves. All
    # heights here are powers of two, so the max() stays a multiple of the
    # tile height and doublings preserve that.
    MHL = max(MH, aa_pack) if aa_packed else max(MH, bm_fine)
    # Fine-list super-tile WIDTH in fine-grid columns (LANES-pixel units).
    # Round-5 addition: lists also coarsen in x, which is what keeps
    # ~1024-leaf scenes on the compact path — with row-only coarsening the
    # one-row floor is n_ftx * n_leaves words (124 KB at 4K/256 leaves,
    # 500 KB at 1024) and the builder was forced into the gated-O(L)
    # fallback. Tiles stay rectangles of whole kernel tiles, so the
    # conservativeness argument is unchanged (a bigger tile's cone
    # contains its sub-tiles' cones).
    CWL = 1
    _fine_rows_total = Hp_pack if aa_packed else Hp

    _list_w = (plan["n_items"] + plan["n_counts"]) if compact else 0

    def _list_bytes(clg, clw, mhl, cwl):
        nc = (hb_p + bm_coarse * clg - 1) // (bm_coarse * clg)
        ncx = (n_ctx + clw - 1) // clw
        nf = (_fine_rows_total + mhl - 1) // mhl
        nfx = (n_ftx + cwl - 1) // cwl
        return (nc * ncx * _list_w * 4, nf * nfx * _list_w * 4)

    if compact:
        cb, fb = _list_bytes(CLG, CLW, MHL, CWL)
        while cb + fb > _LIST_SMEM_BUDGET:
            # Prefer coarsening the coarse-kernel list (its cones are
            # blockier anyway, and the fine kernel dominates frame time);
            # only coarsen the fine list once the coarse one is 4x
            # smaller. Within a list, coarsen the dimension that keeps the
            # super-tile closer to square in PIXELS (narrow tall tiles and
            # wide flat tiles both widen the cull cone more than square
            # ones for the same area).
            can_cy = bm_coarse * CLG < hb_p
            can_cx = CLW < n_ctx
            can_fy = MHL < _fine_rows_total
            can_fx = CWL < n_ftx
            if not (can_cy or can_cx or can_fy or can_fx):
                # Even one-list-per-grid floors exceed the SMEM budget
                # (list width is n_leaves and cannot shrink): fall back to
                # the gated O(L) evaluator instead of looping forever.
                compact = False
                scene_compact = None
                break
            if (can_cy or can_cx) and (4 * cb >= fb or not (can_fy or can_fx)):
                # Coarse list: pixel tile is (bm_coarse*bs*CLG) x
                # (LANES*bs*CLW).
                if can_cy and (
                    bm_coarse * CLG <= LANES * CLW or not can_cx
                ):
                    CLG *= 2
                else:
                    CLW *= 2
            else:
                # Fine list: pixel tile is MHL x (LANES*CWL).
                if can_fy and (MHL <= LANES * CWL or not can_fx):
                    MHL *= 2
                else:
                    CWL *= 2
            cb, fb = _list_bytes(CLG, CLW, MHL, CWL)
    n_clty = (hb_p + bm_coarse * CLG - 1) // (bm_coarse * CLG)
    n_clx = (n_ctx + CLW - 1) // CLW
    n_flty = (_fine_rows_total + MHL - 1) // MHL
    n_flx = (n_ftx + CWL - 1) // CWL
    # Second-level in-kernel list refinement (round 5): when the SMEM
    # budget coarsened list super-tiles beyond the cull-MASK granularity,
    # each kernel invocation re-compacts its super-tile list against its
    # own (much finer) bitmask once, into per-invocation SMEM scratch —
    # march steps then loop the tile's true active count instead of the
    # super-tile's inflated one. See pallas_march.make_compact_refiner.
    refine_fine = compact and (MHL > MH or CWL > 1)
    refine_coarse = compact and (CLG > 1 or CLW > 1)
    scene_compact_ref = (
        _make_scene_eval_compact(spec, cfg, plan, refined=True)
        if (refine_fine or refine_coarse)
        else None
    )
    refiner = (
        make_compact_refiner(plan) if (refine_fine or refine_coarse) else None
    )
    _refine_scratch = (
        [
            pltpu.SMEM((plan["n_items"],), jnp.int32),
            pltpu.SMEM((plan["n_counts"],), jnp.int32),
        ]
        if compact
        else []
    )

    # ------------- coarse kernel: 1 cone ray per BxB pixel block -------------
    def coarse_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, clc_ref, ccc_ref, clf_ref, ccf_ref, *rest
    ):
        out_refs = rest[:n_pre]
        scratch = rest[n_pre:]
        if refine_coarse:
            *scratch, crl_ref, crc_ref = scratch
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

        if compact:
            ctid = (ty // CLG) * n_clx + tx // CLW
            if refine_coarse:
                # Re-compact this tile's (budget-coarsened) list against
                # its own finer bitmask, once per invocation.
                refiner(clc_ref, ccc_ref, ctid, cull, crl_ref, crc_ref)

                def scene(px, py, pz):
                    return scene_compact_ref(
                        lp_ref, opp_ref, crl_ref, crc_ref, 0, px, py, pz
                    )
            else:
                def scene(px, py, pz):
                    return scene_compact(
                        lp_ref, opp_ref, clc_ref, ccc_ref, ctid, px, py, pz
                    )
        else:
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
        # Padded lanes (outside the hb x wb block grid) are dead.
        valid = jnp.where(
            jnp.logical_and(bi < hb, bj < wb), 1.0, 0.0
        )
        if NI:
            starts, ends = _cone_interval_march_tile(
                scene, ox, oy, oz, dx, dy, dz, cfg, omega, bnd, NI
            )
            for j in range(NI):
                # Invalid (padded) lanes: no intervals -> never marched.
                out_refs[j][:] = jnp.where(valid > 0.0, starts[j], _INF)
                out_refs[NI + j][:] = ends[j]
        else:
            t0, near = _cone_march_tile(
                scene, ox, oy, oz, dx, dy, dz, cfg, omega, bnd
            )
            out_refs[0][:] = t0
            out_refs[1][:] = near * valid

    # --------- chained pixel-level coarse (refines the block level) ---------
    omega_px = cone_omega(cfg, width, height, 1)

    def coarse_px_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, clc_ref, ccc_ref, clf_ref, ccf_ref,
        tin_ref, sin_ref, t0_ref, st_ref, *scratch
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
        cullc_ref, cullf_ref, clc_ref, ccc_ref, clf_ref, ccf_ref,
        *rest, emit_th=False, two_d=False,
    ):
        pre_refs = rest[:n_pre]
        r_ref, g_ref, b_ref, *scratch = rest[n_pre:]
        if emit_th:
            # Residual variant (ops.pallas_grad): also write each sample's
            # (t, hit) so the backward kernel replays shading without
            # re-marching. S blocks per pixel tile, indexed i*S + s.
            tm_ref, hm_ref, *scratch = scratch
        if refine_fine and two_d:
            *scratch, frl_ref, frc_ref = scratch
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
            valid_px = jnp.where(
                jnp.logical_and(ii < rows_out, jj < width), 1.0, 0.0
            )
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
            valid_px = jnp.where(lin < hw, 1.0, 0.0)
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

        if compact and two_d:
            ftid = ((ty * bm_fine) // MHL) * n_flx + tx // CWL
            if refine_fine:
                @pl.when(s == 0)
                def _():
                    refiner(clf_ref, ccf_ref, ftid, cull, frl_ref, frc_ref)

                def scene(px, py, pz):
                    return scene_compact_ref(
                        lp_ref, opp_ref, frl_ref, frc_ref, 0, px, py, pz
                    )
            else:
                def scene(px, py, pz):
                    return scene_compact(
                        lp_ref, opp_ref, clf_ref, ccf_ref, ftid, px, py, pz
                    )
        else:
            def scene(px, py, pz):
                return scene_eval_f(
                    lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch,
                    px, py, pz, cull=cull,
                )

        if no_prepass:
            # Strict reference semantics: every (in-image) AA ray sphere-
            # traces from t=0 (wgsl:90); no prepass planes exist.
            t0 = dx * 0.0
            live0 = valid_px
        elif NI:
            starts = [pre_refs[j][:] for j in range(NI)]
            ends = [pre_refs[NI + j][:] for j in range(NI)]
            live0 = jnp.where(starts[0] < 9.0e37, dx * 0.0 + 1.0, 0.0)
            t0 = jnp.where(live0 > 0.0, starts[0], 0.0)
        else:
            t0 = pre_refs[0][:]
            live0 = pre_refs[1][:]
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
            if _dbg_skip_taps:
                z = px * 0.0
                return z + 1.0, z, z
            return _tet_taps(
                scene, px, py, pz, eps, spec.n_leaves >= TAP_LOOP_MIN_LEAVES
            )

        def do_surface():
            # _dbg_* knobs: WRONG-IMAGE bisection aids for kernel-time
            # attribution (see bench notes); never set in real rendering.
            if _dbg_skip_march:
                t, hit = t0, live0
            elif NI:
                t, hit = _fine_march_interval_tile(
                    scene, ox, oy, oz, dx, dy, dz, starts, ends, live0,
                    t_cap, cfg,
                )
            else:
                t, hit = _fine_march_tile(
                    scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg
                )
            px = ox + dx * t * hit
            py = oy + dy * t * hit
            pz = oz + dz * t * hit
            if no_prepass and not share_normals:
                # Hit-gated surface shading: tiles whose every ray missed
                # (escaped or exhausted the budget) skip the 4 normal taps
                # and the material eval entirely — without a prepass that is
                # most sky/floor tiles. With a prepass the any_near gate has
                # already filtered those tiles and the extra in-tile
                # reduction measurably costs more than it saves (~4% at
                # 1080p), so the gate is no-prepass-only. Miss lanes only
                # ever read hit * (mar * diff) = 0, so the shortcut is
                # structurally exact.
                def shade_hit():
                    nx, ny, nz = _normal_taps(px, py, pz)
                    ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
                    tlx = px - lx_
                    tly = py - ly_
                    tlz = pz - lz_
                    linv = jax.lax.rsqrt(
                        tlx * tlx + tly * tly + tlz * tlz + 1e-20
                    )
                    diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
                    diff = jnp.maximum(diff, cfg.ambient)
                    if color_eval is not None:
                        _, mar, mag, mab = color_eval(
                            lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                            px, py, pz, cull=cull,
                        )
                        mar = dx * 0.0 + mar
                        mag = dx * 0.0 + mag
                        mab = dx * 0.0 + mab
                    else:
                        mar = dx * 0.0 + ax_
                        mag = dx * 0.0 + ay_
                        mab = dx * 0.0 + az_
                    return diff, mar, mag, mab

                def shade_miss():
                    z = dx * 0.0
                    return z, z + ax_, z + ay_, z + az_

                diff, mar, mag, mab = jax.lax.cond(
                    jnp.max(hit) > 0.0, shade_hit, shade_miss
                )
                return t, hit, diff, mar, mag, mab
            elif not share_normals:
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
                _, mar, mag, mab = color_eval(
                    lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                    px, py, pz, cull=cull,
                )
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
        bounds = leaf_bound_spheres(spec, arrays, cfg, soft=soft)
        # The coarse kernel marches one cone (half-angle omega) per BxB
        # pixel block; its tile cone = corner angle + omega so it contains
        # every block cone probed by the near test.
        mask_c = tile_leaf_masks(
            bounds, cam_vec, cfg, width, height, n_cty, n_ctx,
            float(bm_coarse * bs), float(LANES * bs), extra_angle=omega,
        )
        if aa_packed:
            # Packed fine grid: masks at MH-pixel-row super-tiles (SMEM
            # scales with mask ROW count; see the geometry block).
            mask_f = tile_leaf_masks(
                bounds, cam_vec, cfg, width, height, n_mty, n_ftx,
                float(MH), float(LANES),
            )
        else:
            mask_f = tile_leaf_masks(
                bounds, cam_vec, cfg, width, height, n_fty, n_ftx,
                float(bm_fine), float(LANES),
            )
        return mask_c, mask_f

    def _fine_lists(arrays: TapeArrays, cam_vec):
        """Per-tile compacted fine-grid lists (the backward kernel streams
        these with the same MHL super-tile indexing as the fine kernel)."""
        bounds = leaf_bound_spheres(spec, arrays, cfg, soft=soft)
        mask_fl = tile_leaf_masks(
            bounds, cam_vec, cfg, width, height, n_flty, n_flx,
            float(MHL), float(LANES * CWL),
        )
        return compact_plan_rows(spec, plan, mask_fl)

    def _scene_args(arrays: TapeArrays, cam_vec):
        mask_c, mask_f = _cull_masks(arrays, cam_vec)
        if compact:
            bounds = leaf_bound_spheres(spec, arrays, cfg, soft=soft)
            mask_cl = tile_leaf_masks(
                bounds, cam_vec, cfg, width, height, n_clty, n_clx,
                float(bm_coarse * bs * CLG), float(LANES * bs * CLW),
                extra_angle=omega,
            )
            clc, ccc = compact_plan_rows(spec, plan, mask_cl)
            clf, ccf = _fine_lists(arrays, cam_vec)
        else:
            clc = clf = jnp.zeros((1, 1), jnp.int32)
            ccc = ccf = jnp.zeros((1, 1), jnp.int32)
        return (
            jnp.asarray(arrays.macro_ops),
            jnp.asarray(arrays.macro_arg),
            jnp.asarray(arrays.macro_slotk),
            jnp.asarray(arrays.op_param),
            jnp.asarray(arrays.leaf_params),
            compute_bound(spec, arrays),
            jnp.asarray(cam_vec, jnp.float32),
            mask_c,
            mask_f,
            clc,
            ccc,
            clf,
            ccf,
        )

    def run_coarse(scene_args):
        blk = pl.BlockSpec(
            (bm_coarse, LANES),
            lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        coarse_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=13,
            grid=(hb_p // bm_coarse, wb_p // LANES),
            in_specs=[],
            out_specs=[blk] * n_pre,
            scratch_shapes=list(_scratch_shapes(spec, bm_coarse))
            + (_refine_scratch if refine_coarse else []),
        )
        pre = pl.pallas_call(
            coarse_kernel,
            grid_spec=coarse_spec,
            out_shape=[
                jax.ShapeDtypeStruct((hb_p, wb_p), jnp.float32)
                for _ in range(n_pre)
            ],
            interpret=interpret,
        )(*scene_args)

        # Expand block-level prepass planes to pixel resolution: a plain XLA
        # broadcast-reshape (H*W*4 bytes each — bandwidth-trivial). Also
        # re-pads to the fine kernel's grid when bs == 1 (identity repeat).
        # Interval planes pad with +inf (= "no interval": dead lanes).
        def expand(v, fill):
            v = v[:hb, :wb]
            if bs > 1:
                v = jnp.repeat(jnp.repeat(v, bs, axis=0), bs, axis=1)
            v = v[:rows_out, :width].reshape(-1)
            return jnp.pad(v, (0, n_pad - hw), constant_values=fill).reshape(
                n_pad // LANES, LANES
            )

        pre = [expand(v, _INF if NI else 0.0) for v in pre]

        if prepass_chain and bs > 1:
            t0, status = pre
            # Level 2: refine the block-level start distances with a
            # per-pixel cone pass chained from them (rays start at the block
            # cone's stop distance instead of the camera).
            assert n_pad % (bm_coarse * LANES) == 0
            px_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=13,
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
            pre = [t0, status]

        return pre

    def run_fine(scene_args, pre, emit_th=False):
        """Fine pass over 2D image-rectangle tiles (see fine_kernel's two_d
        branch): background/floor tiles skip the march + normal taps. With
        emit_th, also returns each AA sample's (t, hit) residual planes in
        the same 2D tile layout, blocks indexed (ty*S + s, tx) so the
        backward kernel (ops.pallas_grad, same grid) streams them back with
        the identical index map."""
        fine_scratch = list(_scratch_shapes(spec, bm_fine))
        if share_normals:
            fine_scratch += [
                pltpu.VMEM((bm_fine, LANES), jnp.float32) for _ in range(4)
            ]

        def to2d(v):
            v = v.reshape(-1)[:hw].reshape(rows_out, width)
            # Padding: legacy status=0 / t0=0, intervals +inf — dead lanes
            # either way, never marched.
            fill = _INF if NI else 0.0
            return jnp.pad(
                v, ((0, Hp - rows_out), (0, Wp - width)), constant_values=fill
            )

        blk = pl.BlockSpec(
            (bm_fine, LANES),
            lambda ty, tx, s, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        out_specs = [blk, blk, blk]
        out_shape = [
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32) for _ in range(3)
        ]
        kernel = functools.partial(fine_kernel, two_d=True)
        if emit_th:
            th_spec = pl.BlockSpec(
                (bm_fine, LANES),
                lambda ty, tx, s, *_: (ty * S + s, tx),
                memory_space=pltpu.VMEM,
            )
            out_specs += [th_spec, th_spec]
            out_shape += [
                jax.ShapeDtypeStruct((Hp * S, Wp), jnp.float32)
                for _ in range(2)
            ]
            kernel = functools.partial(fine_kernel, emit_th=True, two_d=True)
        fine_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=13,
            grid=(Hp // bm_fine, Wp // LANES, S),
            in_specs=[blk] * n_pre,
            out_specs=out_specs,
            scratch_shapes=fine_scratch
            + (_refine_scratch if refine_fine else []),
        )
        r, g, b, *th = pl.pallas_call(
            kernel,
            grid_spec=fine_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*scene_args, *(to2d(v) for v in pre))

        img = jnp.stack(
            [v[:rows_out, :width] for v in (r, g, b)], axis=-1
        )
        if emit_th:
            return img, th[0], th[1]
        return img

    # ------------- AA-packed fine kernel --------------------------------
    # One invocation owns ALL S samples of an aa_pack-pixel-row strip:
    # sublane u = local_pixel_row * S + sample. See the builder docstring.
    def fine_packed_kernel(
        ops_ref, arg_ref, slot_ref, opp_ref, lp_ref, bnd_ref, cam_ref,
        cullc_ref, cullf_ref, clc_ref, ccc_ref, clf_ref, ccf_ref,
        *rest, emit_th=False,
    ):
        pre_refs = rest[:n_pre]
        if march_only:
            tm_ref, hm_ref, *scratch = rest[n_pre:]
            r_ref = g_ref = b_ref = None
        else:
            r_ref, g_ref, b_ref, *scratch = rest[n_pre:]
        if emit_th and not march_only:
            # Residual planes for the fused VJP: per-ray (t, hit) in the
            # SAME packed strip layout, block (TS, LANES) at (ty, tx).
            # Soft mode adds (s_min, t_min) for the envelope term.
            if soft:
                tm_ref, hm_ref, sm_ref, tmn_ref, *scratch = scratch
            else:
                tm_ref, hm_ref, *scratch = scratch
        if refine_fine:
            *scratch, prl_ref, prc_ref = scratch
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        u = jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 0)
        py = u // S
        s = u - py * S
        ii = ty * aa_pack + py
        jj = tx * LANES + jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 1)
        a = s // naa
        b = s - a * naa
        fa = (a.astype(jnp.float32) + 0.5) / naa - 0.5
        fb = (b.astype(jnp.float32) + 0.5) / naa - 0.5
        x = (
            2.0 * (jj.astype(jnp.float32) + 0.5) / width
            - 1.0
            + fa * (2.0 / width)
        )
        y = (
            1.0
            - 2.0 * (ii.astype(jnp.float32) + 0.5 + cam_ref[7]) / height
            + fb * (2.0 / height)
        )
        dx, dy, dz = _view_dirs(x, y, cam_ref)
        ox = jnp.full((TS, LANES), cam_ref[0], jnp.float32)
        oy = jnp.full((TS, LANES), cam_ref[1], jnp.float32)
        oz = jnp.full((TS, LANES), cam_ref[2], jnp.float32)
        valid_px = jnp.where(
            jnp.logical_and(ii < rows_out, jj < width), 1.0, 0.0
        )
        # Mask rows are 64-pixel-row super-tiles (see geometry block above).
        cull = cull_packed(cullf_ref, (ty * aa_pack) // MH, tx)

        if compact:
            ptid = ((ty * aa_pack) // MHL) * n_flx + tx // CWL
            if refine_fine:
                refiner(clf_ref, ccf_ref, ptid, cull, prl_ref, prc_ref)

                def scene(px, py_, pz):
                    return scene_compact_ref(
                        lp_ref, opp_ref, prl_ref, prc_ref, 0, px, py_, pz
                    )
            else:
                def scene(px, py_, pz):
                    return scene_compact(
                        lp_ref, opp_ref, clf_ref, ccf_ref, ptid, px, py_, pz
                    )
        else:
            def scene(px, py_, pz):
                return scene_eval_f(
                    lp_ref, ops_ref, arg_ref, slot_ref, opp_ref, scratch,
                    px, py_, pz, cull=cull,
                )

        def up(v):
            # Per-pixel prepass plane (aa_pack, LANES) -> per-ray (TS, LANES)
            # with each pixel row repeated for its S samples (py-major).
            return jnp.broadcast_to(
                v[:, None, :], (aa_pack, S, LANES)
            ).reshape(TS, LANES)

        if no_prepass:
            t0 = dx * 0.0
            live0 = valid_px
        elif NI:
            starts = [up(pre_refs[j][:]) for j in range(NI)]
            ends = [up(pre_refs[NI + j][:]) for j in range(NI)]
            live0 = jnp.where(starts[0] < 9.0e37, dx * 0.0 + 1.0, 0.0)
            t0 = jnp.where(live0 > 0.0, starts[0], 0.0)
        else:
            t0 = up(pre_refs[0][:])
            live0 = up(pre_refs[1][:])
        t_cap = dx * 0.0 + 3.0e38
        if cfg.bound_accel:
            bnd = (bnd_ref[0], bnd_ref[1], bnd_ref[2], bnd_ref[3], bnd_ref[4])
            _, _, t_cap = _bound_clip(
                bnd, ox, oy, oz, dx, dy, dz, live0, t0, t_cap, cfg
            )

        any_near = jnp.max(live0) > 0.0

        if march_only:
            # Write each sample's converged (t, hit) and stop: no normals,
            # no materials, no floor — the raw-march consumer's fast path.
            def do_march():
                if NI:
                    return _fine_march_interval_tile(
                        scene, ox, oy, oz, dx, dy, dz, starts, ends, live0,
                        t_cap, cfg,
                    )
                return _fine_march_tile(
                    scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg
                )

            def no_march():
                z = dx * 0.0
                return z, z

            t_m, hitm = jax.lax.cond(any_near, do_march, no_march)
            tm_ref[:] = t_m
            hm_ref[:] = hitm
            return

        def do_surface():
            if NI:
                t, hit = _fine_march_interval_tile(
                    scene, ox, oy, oz, dx, dy, dz, starts, ends, live0,
                    t_cap, cfg,
                )
            else:
                t, hit = _fine_march_tile(
                    scene, ox, oy, oz, dx, dy, dz, t0, live0, t_cap, cfg
                )
            px = ox + dx * t * hit
            py_ = oy + dy * t * hit
            pz = oz + dz * t * hit

            def shade_hit():
                nx, ny, nz = _tet_taps(
                    scene, px, py_, pz, eps,
                    spec.n_leaves >= TAP_LOOP_MIN_LEAVES,
                )
                ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
                tlx = px - lx_
                tly = py_ - ly_
                tlz = pz - lz_
                linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
                diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
                diff = jnp.maximum(diff, cfg.ambient)
                if color_eval is not None:
                    _, mar, mag, mab = color_eval(
                        lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                        px, py_, pz, cull=cull,
                    )
                    mar = dx * 0.0 + mar
                    mag = dx * 0.0 + mag
                    mab = dx * 0.0 + mab
                else:
                    mar = dx * 0.0 + ax_
                    mag = dx * 0.0 + ay_
                    mab = dx * 0.0 + az_
                return diff, mar, mag, mab

            def shade_miss():
                z = dx * 0.0
                return z, z + ax_, z + ay_, z + az_

            diff, mar, mag, mab = jax.lax.cond(
                jnp.max(hit) > 0.0, shade_hit, shade_miss
            )
            return t, hit, diff, mar, mag, mab

        def no_surface():
            z = dx * 0.0
            return z, z, z, z + ax_, z + ay_, z + az_

        if soft:
            # Soft coverage (ops.march.shade_soft semantics): the binary
            # hit mask becomes alpha = exp(-max(s_min - min_dist, 0)/beta)
            # and miss rays shade the surface term at their closest-
            # approach point; the common floor/mix tail below then blends
            # by alpha instead of hit — identical structure.
            if cfg.bound_accel:
                soft_infl = cfg.min_dist + cfg.soft_cull_log_alpha * cfg.coverage_beta
                bnd_soft = (
                    bnd_ref[0], bnd_ref[1], bnd_ref[2],
                    bnd_ref[3] + soft_infl, bnd_ref[4],
                )
            else:
                bnd_soft = None
            t_raw, hit_raw, s_min, t_min = _fine_march_tile_soft(
                scene, ox, oy, oz, dx, dy, dz, valid_px, cfg, bound=bnd_soft
            )
            if emit_th:
                tm_ref[:] = t_raw
                hm_ref[:] = hit_raw
                sm_ref[:] = s_min
                tmn_ref[:] = t_min
            alpha = jnp.exp(
                -jnp.maximum(s_min - cfg.min_dist, 0.0)
                * (1.0 / cfg.coverage_beta)
            )
            t_eff = jnp.where(hit_raw > 0.5, t_raw, t_min)
            live_s = alpha > 1e-4
            px = jnp.where(live_s, ox + dx * t_eff, ox)
            py_ = jnp.where(live_s, oy + dy * t_eff, oy)
            pz = jnp.where(live_s, oz + dz * t_eff, oz)

            def shade_surf():
                nx, ny, nz = _tet_taps(
                    scene, px, py_, pz, eps,
                    spec.n_leaves >= TAP_LOOP_MIN_LEAVES,
                )
                ninv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
                tlx = px - lx_
                tly = py_ - ly_
                tlz = pz - lz_
                linv = jax.lax.rsqrt(tlx * tlx + tly * tly + tlz * tlz + 1e-20)
                diff = (nx * tlx + ny * tly + nz * tlz) * (ninv * linv)
                diff = jnp.maximum(diff, cfg.ambient)
                if color_eval is not None:
                    _, mar, mag, mab = color_eval(
                        lp_ref, ops_ref, arg_ref, slot_ref, opp_ref,
                        px, py_, pz, cull=cull,
                    )
                    mar = dx * 0.0 + mar
                    mag = dx * 0.0 + mag
                    mab = dx * 0.0 + mab
                else:
                    mar = dx * 0.0 + ax_
                    mag = dx * 0.0 + ay_
                    mab = dx * 0.0 + az_
                return diff, mar, mag, mab

            def shade_none():
                z = dx * 0.0
                return z, z + ax_, z + ay_, z + az_

            diff, mar, mag, mab = jax.lax.cond(
                jnp.max(alpha) > 1e-4, shade_surf, shade_none
            )
            _t, hit = t_eff, alpha
        else:
            _t, hit, diff, mar, mag, mab = jax.lax.cond(
                any_near, do_surface, no_surface
            )
            if emit_th:
                tm_ref[:] = _t
                hm_ref[:] = hit

        dy_abs_ok = jnp.where(jnp.abs(dy) > 1e-8, 1.0, 0.0)
        dy_safe = jnp.where(jnp.abs(dy) > 1e-8, dy, 1e-8)
        ft = (cfg.floor_y - oy) / dy_safe
        fx = jnp.clip(ox + dx * ft, -1e7, 1e7)
        fz = jnp.clip(oz + dz * ft, -1e7, 1e7)
        ipx = jnp.round(fx + 0.5).astype(jnp.int32)
        ipz = jnp.round(fz + 0.5).astype(jnp.int32)
        parity = (jnp.bitwise_and(jnp.bitwise_xor(ipx, ipz), 1)).astype(
            jnp.float32
        )
        on_floor = jnp.where(ft > 0.0, dy_abs_ok, 0.0)
        fcol_r = (fb_r + cfg.floor_checker * parity) * on_floor
        fcol_g = (fb_g + cfg.floor_checker * parity) * on_floor
        fcol_b = (fb_b + cfg.floor_checker * parity) * on_floor

        miss = 1.0 - hit
        cr = jnp.sqrt(jnp.maximum(hit * (mar * diff) + miss * fcol_r, 0.0) + 1e-12)
        cg = jnp.sqrt(jnp.maximum(hit * (mag * diff) + miss * fcol_g, 0.0) + 1e-12)
        cb = jnp.sqrt(jnp.maximum(hit * (mab * diff) + miss * fcol_b, 0.0) + 1e-12)

        def aamean(v):
            # Mean over each pixel row's S sample sublanes (py-major).
            return jnp.sum(v.reshape(aa_pack, S, LANES), axis=1) * (1.0 / S)

        r_ref[:] = aamean(cr)
        g_ref[:] = aamean(cg)
        b_ref[:] = aamean(cb)

    def run_fine_packed(scene_args, pre, emit_th=False):
        def to2d_packed(v):
            v = v.reshape(-1)[:hw].reshape(rows_out, width)
            fill = _INF if NI else 0.0
            return jnp.pad(
                v,
                ((0, Hp_pack - rows_out), (0, Wp - width)),
                constant_values=fill,
            )

        blk = pl.BlockSpec(
            (aa_pack, LANES),
            lambda ty, tx, *_: (ty, tx),
            memory_space=pltpu.VMEM,
        )
        if march_only:
            th_blk = pl.BlockSpec(
                (TS, LANES),
                lambda ty, tx, *_: (ty, tx),
                memory_space=pltpu.VMEM,
            )
            fine_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=13,
                grid=(n_pty, Wp // LANES),
                in_specs=[blk] * n_pre,
                out_specs=[th_blk, th_blk],
                scratch_shapes=list(_scratch_shapes(spec, TS))
                + (_refine_scratch if refine_fine else []),
            )
            t_pl, h_pl = pl.pallas_call(
                fine_packed_kernel,
                grid_spec=fine_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_pty * TS, Wp), jnp.float32)
                    for _ in range(2)
                ],
                interpret=interpret,
            )(*scene_args, *(to2d_packed(v) for v in pre))

            def unpack(v):
                # Packed strip sublane u = pixel_row*S + sample -> flat
                # pixel-major ray order r = (i*W + j)*S + s (ops.raygen).
                v = v.reshape(n_pty * aa_pack, S, Wp)[:, :, :width]
                v = v.transpose(0, 2, 1).reshape(-1)
                return v[: rows_out * width * S]

            return unpack(t_pl), unpack(h_pl)
        out_specs = [blk, blk, blk]
        out_shape = [
            jax.ShapeDtypeStruct((Hp_pack, Wp), jnp.float32) for _ in range(3)
        ]
        kernel = fine_packed_kernel
        if emit_th:
            th_blk = pl.BlockSpec(
                (TS, LANES),
                lambda ty, tx, *_: (ty, tx),
                memory_space=pltpu.VMEM,
            )
            n_res = 4 if soft else 2  # + (s_min, t_min) in soft mode
            out_specs += [th_blk] * n_res
            out_shape += [
                jax.ShapeDtypeStruct((n_pty * TS, Wp), jnp.float32)
                for _ in range(n_res)
            ]
            kernel = functools.partial(fine_packed_kernel, emit_th=True)
        fine_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=13,
            grid=(n_pty, Wp // LANES),
            in_specs=[blk] * n_pre,
            out_specs=out_specs,
            scratch_shapes=list(_scratch_shapes(spec, TS))
            + (_refine_scratch if refine_fine else []),
        )
        r, g, b, *th = pl.pallas_call(
            kernel,
            grid_spec=fine_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*scene_args, *(to2d_packed(v) for v in pre))
        img = jnp.stack([v[:rows_out, :width] for v in (r, g, b)], axis=-1)
        if emit_th:
            return (img, *th)
        return img

    def render(arrays: TapeArrays, cam_vec):
        scene_args = _scene_args(arrays, cam_vec)
        pre = [] if no_prepass else run_coarse(scene_args)
        if aa_packed:
            return run_fine_packed(scene_args, pre)
        return run_fine(scene_args, pre)

    # Introspection: did this build take the compacted O(active) path?
    # (False when the scene is not foldable or the list SMEM floors exceed
    # the budget and the builder fell back to the gated evaluator.)
    render.compact = compact
    # Final list super-tile geometry after SMEM-budget coarsening:
    # (coarse-grid rows per coarse list tile, fine list tile pixel rows).
    render.compact_geometry = (CLG, CLW, MHL, CWL) if compact else None
    # Second-level in-kernel refinement engaged? (fine kernels, coarse kernel)
    render.compact_refined = (refine_fine, refine_coarse) if compact else None
    # Compact-plan plumbing for the O(active) backward (ops.pallas_grad):
    # the plan, the fine-list super-tile geometry, and the per-frame list
    # builder, so the backward kernel indexes the SAME lists the forward
    # fine kernel used.
    render.compact_info = (
        dict(plan=plan, MHL=MHL, CWL=CWL, n_flx=n_flx, n_flty=n_flty)
        if compact
        else None
    )
    render.fine_lists = _fine_lists if compact else None

    # Exposed for instrumentation / custom pipelines. `pre` is the prepass
    # plane list: [t0, status] (legacy) or NI (start, end) pairs.
    render.coarse = lambda arrays, cam_vec: run_coarse(_scene_args(arrays, cam_vec))
    render.fine = lambda arrays, cam_vec, pre: (
        run_fine_packed if aa_packed else run_fine
    )(_scene_args(arrays, cam_vec), pre)
    # Residual-emitting fine pass for the fused VJP (ops.pallas_grad): also
    # returns each AA sample's (t, hit) so the backward kernel skips the
    # re-march (HBM for the residuals is far cheaper than recomputing the
    # march: ~8 f32/pixel vs ~8 full scene evals per sample). Keeps the
    # per-sample grid (the backward kernel mirrors its layout).
    def _fine_res(arrays, cam_vec, pre):
        if aa_packed:
            # Residual planes come back in the packed strip layout
            # ((n_pty*128, Wp), block (128, LANES) at (ty, tx)); the packed
            # backward kernel (ops.pallas_grad) mirrors it.
            return run_fine_packed(_scene_args(arrays, cam_vec), pre, emit_th=True)
        return run_fine(_scene_args(arrays, cam_vec), pre, emit_th=True)

    render.fine_res = _fine_res
    return render


def make_pallas_image_march_fast(
    spec: TapeSpec, cfg: RenderConfig, width: int, height: int,
    interpret: bool = False, **kw,
):
    """March-only fast path: fn(arrays, cam_vec f32[8]) -> (t[N], hit[N])
    flat f32 arrays in pixel-major AA-ray order (ops.raygen), N = aa^2*H*W.

    Runs the cone-prepass + AA-packed 2-D tiled fine march (+ leaf
    cull/compact when enabled) and skips shading entirely — the fast raw
    march for custom losses and non-image pipelines. ~3x the flat-layout
    `pallas_march.make_pallas_image_march` at 1080p (which is kept for its
    per-ray step counts). Same conservative tolerance class as the fused
    renderer; pass `no_prepass=True` for strict reference semantics
    (wgsl:87-115)."""
    return make_pallas_image_render_aa(
        spec, cfg, width, height, interpret=interpret,
        aa_packed=True, march_only=True, **kw,
    )

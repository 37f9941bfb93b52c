"""Sphere-tracing march, shading, and the full differentiable renderer (jnp).

March semantics match the reference loop (src/ray_marching/ray_marching.wgsl:
87-115): step each ray by the scene distance until it falls below `min_dist`
(hit), exceeds `max_dist` (escape), or `max_iter` evaluations elapse. The
reference breaks per-pixel; on a vector machine we mask — a
`lax.while_loop` runs while *any* ray in the batch is live, so a batch whose
rays all resolve early exits early.

Differentiation: `lax.while_loop` is not reverse-differentiable, so the march
is wrapped in a `custom_vjp` whose backward pass applies the implicit-function
theorem at the converged hit point: with F(t; o, d, theta) = sdf(o + t*d, theta)
and F = 0 at the hit,

    dt/dtheta = -F_theta / (grad_x F . d),
    dt/do     = -grad_x F / (grad_x F . d),
    dt/dd     = -t * grad_x F / (grad_x F . d).

Miss rays get zero gradient through t (their color depends on o, d only).
An unrolled `lax.scan` marcher (`mode="unrolled"`) is reverse-differentiable
natively and cross-checks the implicit VJP in tests.

Shading (wgsl:96-130): tetrahedron-tap normals, Lambertian with the
reference's fixed light and albedo, analytic checkerboard floor on miss,
sqrt gamma per AA sample, AA average.
"""

from __future__ import annotations

import functools

from jax.ad_checkpoint import checkpoint_name
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RenderConfig
from .raygen import raygen_flat
from .sdf import make_scene_fn
from .tape import TapeArrays, TapeSpec


# ---------------------------------------------------------------------------
# March
# ---------------------------------------------------------------------------


def _march_while(scene, origins, dirs, arrays, cfg: RenderConfig):
    n = origins.shape[0]

    def cond(state):
        k, _, live, _, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.any(live))

    def body(state):
        k, t, live, hit, steps = state
        pos = origins + dirs * t[:, None]
        dist = scene(pos, arrays)
        newly_hit = jnp.logical_and(live, dist < cfg.min_dist)
        escaped = jnp.logical_and(live, dist > cfg.max_dist)
        live2 = jnp.logical_and(live, jnp.logical_not(newly_hit | escaped))
        t2 = jnp.where(live2, t + dist, t)
        return (k + 1, t2, live2, hit | newly_hit, steps + live.astype(jnp.int32))

    state = (
        jnp.int32(0),
        jnp.zeros(n, origins.dtype),
        jnp.ones(n, bool),
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
    )
    _, t, _, hit, steps = jax.lax.while_loop(cond, body, state)
    return t, hit.astype(origins.dtype), steps


def _march_scan(scene, origins, dirs, arrays, cfg: RenderConfig):
    """Fixed-iteration masked march via lax.scan: reverse-differentiable."""
    n = origins.shape[0]

    @jax.checkpoint
    def step(carry, _):
        t, live, hit = carry
        pos = origins + dirs * t[:, None]
        dist = scene(pos, arrays)
        newly_hit = jnp.logical_and(live, dist < cfg.min_dist)
        escaped = jnp.logical_and(live, dist > cfg.max_dist)
        live2 = jnp.logical_and(live, jnp.logical_not(newly_hit | escaped))
        t2 = jnp.where(live2, t + dist, t)
        return (t2, live2, hit | newly_hit), live.astype(jnp.int32)

    init = (jnp.zeros(n, origins.dtype), jnp.ones(n, bool), jnp.zeros(n, bool))
    (t, _, hit), live_hist = jax.lax.scan(step, init, None, length=cfg.max_iter)
    return t, hit.astype(origins.dtype), jnp.sum(live_hist, axis=0)


@functools.lru_cache(maxsize=None)
def make_march(spec: TapeSpec, cfg: RenderConfig, mode: str = "implicit"):
    """Build `march(origins[N,3], dirs[N,3], arrays) -> (t, hit_mask, steps)`.

    mode: "implicit" (while_loop fwd + implicit-function VJP),
          "unrolled" (scan, native reverse-mode), or
          "forward" (while_loop, no VJP — fastest for inference).
    """
    scene = make_scene_fn(spec, cfg)

    if mode == "forward":
        return functools.partial(_march_while, scene, cfg=cfg)
    if mode == "unrolled":
        return functools.partial(_march_scan, scene, cfg=cfg)
    if mode != "implicit":
        raise ValueError(f"unknown march mode: {mode}")

    @jax.custom_vjp
    def march(origins, dirs, arrays):
        return _march_while(scene, origins, dirs, arrays, cfg)

    def march_fwd(origins, dirs, arrays):
        out = _march_while(scene, origins, dirs, arrays, cfg)
        t, hit, _ = out
        return out, (origins, dirs, arrays, t, hit)

    def march_bwd(res, cotangents):
        origins, dirs, arrays, t, hit = res
        gt = cotangents[0]  # cotangents for hit/steps are zero by construction
        pos = origins + dirs * t[:, None]

        # Directional derivative of the SDF along the ray (denominator).
        _, fdot = jax.jvp(lambda p: scene(p, arrays), (pos,), (dirs,))
        c = cfg.grad_denom_clamp
        denom = jnp.where(jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c))
        w = -gt * hit / denom

        _, vjp_fn = jax.vjp(lambda p, a: scene(p, a), pos, arrays)
        gpos, garrays = vjp_fn(w)
        go = gpos
        gd = gpos * t[:, None]
        return go, gd, garrays

    march.defvjp(march_fwd, march_bwd)
    return march


# ---------------------------------------------------------------------------
# Soft-coverage march (silhouette gradients)
# ---------------------------------------------------------------------------


def _march_while_soft(scene, origins, dirs, arrays, cfg: RenderConfig):
    """March that additionally tracks the minimum scene distance along the
    ray and its parameter: (t, hit, s_min, t_min)."""
    n = origins.shape[0]

    def cond(state):
        k, _, live, _, _, _ = state
        return jnp.logical_and(k < cfg.max_iter, jnp.any(live))

    def body(state):
        k, t, live, hit, s_min, t_min = state
        pos = origins + dirs * t[:, None]
        dist = scene(pos, arrays)
        better = jnp.logical_and(live, dist < s_min)
        s_min2 = jnp.where(better, dist, s_min)
        t_min2 = jnp.where(better, t, t_min)
        newly_hit = jnp.logical_and(live, dist < cfg.min_dist)
        escaped = jnp.logical_and(live, dist > cfg.max_dist)
        live2 = jnp.logical_and(live, jnp.logical_not(newly_hit | escaped))
        t2 = jnp.where(live2, t + dist, t)
        return (k + 1, t2, live2, hit | newly_hit, s_min2, t_min2)

    state = (
        jnp.int32(0),
        jnp.zeros(n, origins.dtype),
        jnp.ones(n, bool),
        jnp.zeros(n, bool),
        jnp.full(n, jnp.inf, origins.dtype),
        jnp.zeros(n, origins.dtype),
    )
    _, t, _, hit, s_min, t_min = jax.lax.while_loop(cond, body, state)
    return t, hit.astype(origins.dtype), s_min, t_min


@functools.lru_cache(maxsize=None)
def make_march_soft(spec: TapeSpec, cfg: RenderConfig):
    """Build `march_soft(origins, dirs, arrays) -> (t, hit, s_min, t_min)`.

    Like make_march("implicit") plus the closest-approach channel that
    powers SILHOUETTE gradients: s_min = min over the march of the scene
    distance. Its VJP is the envelope (Danskin) derivative — the argmin
    point t_min is held fixed, so  d s_min/dtheta = F_theta(x(t_min)),
    d/d o = grad_x F, d/d d = t_min * grad_x F. The t channel keeps the
    implicit-function VJP of the plain march. (The reference renderer is
    non-differentiable, SURVEY.md §2.3; interior-only gradients were the
    documented round-1 limitation, fit.py:8-13.)
    """
    scene = make_scene_fn(spec, cfg)

    @jax.custom_vjp
    def march_soft(origins, dirs, arrays):
        return _march_while_soft(scene, origins, dirs, arrays, cfg)

    def fwd(origins, dirs, arrays):
        out = _march_while_soft(scene, origins, dirs, arrays, cfg)
        t, hit, s_min, t_min = out
        return out, (origins, dirs, arrays, t, hit, t_min)

    def bwd(res, cotangents):
        origins, dirs, arrays, t, hit, t_min = res
        gt, _ghit, gs, _gtm = cotangents

        # Implicit-function term for t (same as make_march's march_bwd).
        pos = origins + dirs * t[:, None]
        _, fdot = jax.jvp(lambda p: scene(p, arrays), (pos,), (dirs,))
        c = cfg.grad_denom_clamp
        denom = jnp.where(jnp.abs(fdot) > c, fdot, jnp.where(fdot >= 0, c, -c))
        w = -gt * hit / denom
        _, vjp_t = jax.vjp(lambda p, a: scene(p, a), pos, arrays)
        gpos_t, garr_t = vjp_t(w)

        # Envelope term for s_min at the frozen argmin point.
        pos_m = origins + dirs * t_min[:, None]
        _, vjp_m = jax.vjp(lambda p, a: scene(p, a), pos_m, arrays)
        gpos_m, garr_m = vjp_m(gs)

        go = gpos_t + gpos_m
        gd = gpos_t * t[:, None] + gpos_m * t_min[:, None]
        # Integer tape arrays carry float0 cotangents — pass them through.
        from jax.dtypes import float0

        garrays = jax.tree_util.tree_map(
            lambda a, b: a if a.dtype == float0 else a + b, garr_t, garr_m
        )
        return go, gd, garrays

    march_soft.defvjp(fwd, bwd)
    return march_soft


def shade_soft(scene, origins, dirs, t, hit, s_min, t_min, arrays,
               cfg: RenderConfig, albedo_fn=None):
    """Soft-coverage shading: like `shade`, but the binary hit mask is
    replaced by  alpha = exp(-max(s_min - min_dist, 0)/beta)  (1 on hits,
    smooth decay with the ray's closest approach outside), and miss rays
    shade the surface term at their closest-approach point. Forward images
    match `shade` up to the O(beta) silhouette halo; gradients additionally
    carry the coverage (silhouette) term through s_min."""
    beta = cfg.coverage_beta
    alpha = jnp.exp(-jnp.maximum(s_min - cfg.min_dist, 0.0) / beta)
    t_eff = jnp.where(hit > 0.5, t, t_min)
    pos = origins + dirs * t_eff[:, None]
    # NaN guard (see shade's double-where): rays with negligible coverage
    # contribute nothing; evaluate their surface term at the origin.
    live = alpha > 1e-4
    pos = jnp.where(live[:, None], pos, origins)
    normal = calculate_normals(scene, pos, arrays, cfg)
    to_light = pos - jnp.asarray(cfg.light_position, pos.dtype)
    to_light = to_light / jnp.maximum(
        jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-20
    )
    diffuse = jnp.maximum(cfg.ambient, jnp.sum(normal * to_light, axis=-1))
    if albedo_fn is not None:
        albedo = albedo_fn(pos, arrays)
    else:
        albedo = jnp.asarray(cfg.albedo, pos.dtype)[None, :]
    surf_color = albedo * diffuse[:, None]

    dy = dirs[:, 1]
    dy_safe = jnp.where(jnp.abs(dy) > 1e-8, dy, 1e-8)
    floor_t = (cfg.floor_y - origins[:, 1]) / dy_safe
    fpos = origins + dirs * floor_t[:, None]
    fxz = jnp.clip(fpos[:, [0, 2]], -1e7, 1e7)
    ip = jnp.round(fxz + 0.5).astype(jnp.int32)
    parity = ((ip[:, 0] ^ ip[:, 1]) & 1).astype(pos.dtype)
    floor_color = (
        jnp.asarray(cfg.floor_base, pos.dtype)[None, :]
        + cfg.floor_checker * parity[:, None]
    )
    on_floor = jnp.logical_and(floor_t > 0.0, jnp.abs(dy) > 1e-8)
    miss_color = jnp.where(on_floor[:, None], floor_color, 0.0)

    a = alpha[:, None]
    return a * surf_color + (1.0 - a) * miss_color


# ---------------------------------------------------------------------------
# Normals and shading
# ---------------------------------------------------------------------------

_TETRA_TAPS = (
    (1.0, -1.0, -1.0),
    (-1.0, -1.0, 1.0),
    (-1.0, 1.0, -1.0),
    (1.0, 1.0, 1.0),
)


def calculate_normals(scene, pos, arrays, cfg: RenderConfig):
    """Tetrahedron 4-tap normal estimate (reference wgsl:135-144)."""
    acc = jnp.zeros_like(pos)
    for tap in _TETRA_TAPS:
        k = jnp.asarray(tap, pos.dtype)
        acc = acc + k * scene(pos + k * cfg.normal_eps, arrays)[:, None]
    norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.maximum(norm, 1e-20)


def shade(scene, origins, dirs, t, hit, arrays, cfg: RenderConfig,
          albedo_fn=None):
    """Per-ray linear color (no gamma): Lambertian on hit, checkerboard floor
    on miss, black otherwise (reference wgsl:96-130).

    `albedo_fn(pos, arrays) -> rgb[N,3]` supplies per-hit albedo for scenes
    with materials (see sdf.make_scene_color_fn); None = the reference's
    fixed albedo (wgsl:103)."""
    pos = origins + dirs * t[:, None]
    # Double-where: evaluate the hit branch at a benign position for miss
    # rays so their (masked-out) normals can't leak NaN/Inf *gradients*
    # through the multiply-mask (escaped rays sit ~100 units out where the
    # 4-tap normal numerator underflows).
    hit_mask = hit[:, None] > 0.5
    pos = jnp.where(hit_mask, pos, origins)
    normal = calculate_normals(scene, pos, arrays, cfg)
    to_light = pos - jnp.asarray(cfg.light_position, pos.dtype)
    to_light = to_light / jnp.maximum(
        jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-20
    )
    diffuse = jnp.maximum(cfg.ambient, jnp.sum(normal * to_light, axis=-1))
    if albedo_fn is not None:
        albedo = albedo_fn(pos, arrays)
    else:
        albedo = jnp.asarray(cfg.albedo, pos.dtype)[None, :]
    hit_color = albedo * diffuse[:, None]

    dy = dirs[:, 1]
    dy_safe = jnp.where(jnp.abs(dy) > 1e-8, dy, 1e-8)
    floor_t = (cfg.floor_y - origins[:, 1]) / dy_safe
    fpos = origins + dirs * floor_t[:, None]
    # Clamp before the int cast: far-away floor positions (grazing rays) must
    # not overflow int32; the pattern out there is sub-pixel anyway.
    fxz = jnp.clip(fpos[:, [0, 2]], -1e7, 1e7)
    ip = jnp.round(fxz + 0.5).astype(jnp.int32)
    parity = ((ip[:, 0] ^ ip[:, 1]) & 1).astype(pos.dtype)
    floor_color = (
        jnp.asarray(cfg.floor_base, pos.dtype)[None, :]
        + cfg.floor_checker * parity[:, None]
    )
    on_floor = jnp.logical_and(floor_t > 0.0, jnp.abs(dy) > 1e-8)
    miss_color = jnp.where(on_floor[:, None], floor_color, 0.0)

    return hit[:, None] * hit_color + (1.0 - hit[:, None]) * miss_color


# ---------------------------------------------------------------------------
# Full renderer
# ---------------------------------------------------------------------------


def _gamma(color):
    """sqrt gamma (reference wgsl:68); the +1e-12 keeps the gradient finite
    at exactly-black pixels (sqrt'(0) = inf would NaN the backward pass)."""
    return jnp.sqrt(jnp.maximum(color, 0.0) + 1e-12)


def _make_albedo_fn(spec: TapeSpec, cfg: RenderConfig):
    """Per-hit albedo lookup for scenes with materials, else None (the
    reference's fixed-albedo path compiles zero extra code)."""
    if not spec.has_materials:
        return None
    from .sdf import make_scene_color_fn

    scene_color = make_scene_color_fn(spec, cfg)
    return lambda pos, arrays: scene_color(pos, arrays)[1]


def render_rays(spec, arrays, origins, dirs, cfg=DEFAULT_CONFIG, mode="implicit"):
    """March + shade + gamma for explicit rays -> color[N,3]."""
    scene = make_scene_fn(spec, cfg)
    march = make_march(spec, cfg, mode)
    t, hit, _ = march(origins, dirs, arrays)
    color = shade(scene, origins, dirs, t, hit, arrays, cfg, _make_albedo_fn(spec, cfg))
    return _gamma(color)


def make_renderer(
    spec: TapeSpec,
    width: int,
    height: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    mode: str = "implicit",
    chunk: Optional[int] = None,
    backend: str = "jnp",
    interpret: bool = False,
):
    """Build `render(arrays, camera) -> image[H,W,3]`.

    Rays (aa^2 per pixel) are generated on the fly from flat indices and
    processed in chunks via `lax.map` to bound live memory; `chunk=None`
    processes everything in one shot (fine up to ~512^2).
    `camera` is a utils.camera.Camera pytree (position, rotation) and the
    output is differentiable w.r.t. it and w.r.t. `arrays`.

    backend:
      "jnp"          — pure-XLA march (make_march; all modes).
      "pallas"       — Pallas march kernel per ray chunk; mode "forward"
                       uses the raw kernel, "implicit" pairs it with the
                       implicit-function VJP. ("unrolled" unsupported.)
      "pallas_image" — Pallas kernel with in-kernel ray generation (fastest
                       forward path; mode "forward" only): the kernel reads
                       only the scene from HBM, then shading runs as a
                       second jnp pass.
    """
    scene = make_scene_fn(spec, cfg)
    albedo_fn = _make_albedo_fn(spec, cfg)
    s = cfg.aa_samples * cfg.aa_samples
    total = s * height * width

    if backend == "jnp":
        march = (
            make_march_soft(spec, cfg)
            if mode == "soft"
            else make_march(spec, cfg, mode)
        )
    elif backend == "pallas":
        from .pallas_march import make_march_pallas, make_pallas_ray_march

        if mode == "forward":
            raw = make_pallas_ray_march(spec, cfg, interpret=interpret)
            march = lambda o, d, a: raw(a, o, d)
        elif mode == "implicit":
            march = make_march_pallas(spec, cfg, interpret=interpret)
        else:
            raise ValueError("pallas backend supports modes 'forward'/'implicit'")
    elif backend == "pallas_image":
        if mode != "forward":
            raise ValueError("pallas_image backend is forward-only")
        from .pallas_march import make_pallas_image_march

        image_march = make_pallas_image_march(spec, cfg, width, height, interpret=interpret)
    elif backend == "pallas_prepass":
        # Fastest forward path: cone-prepass fused renderer (see
        # ops.pallas_prepass). Forward-only; for gradients use pallas_fused.
        if mode != "forward":
            raise ValueError("pallas_prepass backend is forward-only")
        from .pallas_prepass import make_pallas_image_render_aa

        rp = make_pallas_image_render_aa(
            spec, cfg, width, height, prepass_block=1, interpret=interpret,
            aa_packed=not cfg.aa_shared_normals,
        )

        def render_prepass(arrays: TapeArrays, camera):
            cam_vec = jnp.concatenate(
                [
                    jnp.asarray(camera.position, jnp.float32),
                    jnp.asarray(camera.rotation, jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                ]
            )
            return rp(arrays, cam_vec)

        return render_prepass
    elif backend == "pallas_fused":
        # Fully fused fwd+bwd: cone-prepass forward + the Pallas backward
        # kernel (ops.pallas_grad). Differentiable w.r.t. arrays.leaf_params,
        # arrays.op_param, and the camera pytree. Static tapes only.
        # mode "soft" runs the soft-coverage variant (silhouette gradients
        # via the envelope term; shade_soft semantics).
        if mode not in ("implicit", "soft"):
            raise ValueError("pallas_fused backend supports 'implicit'/'soft'")
        from .pallas_grad import make_fused_render_vjp

        rv = make_fused_render_vjp(
            spec, cfg, width, height, interpret=interpret,
            soft=(mode == "soft"),
        )

        def render_fused(arrays: TapeArrays, camera):
            cam_vec = jnp.concatenate(
                [
                    jnp.asarray(camera.position, jnp.float32),
                    jnp.asarray(camera.rotation, jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                ]
            )
            return rv(arrays, cam_vec)

        return render_fused
    elif backend == "pallas_full":
        if mode != "forward":
            raise ValueError("pallas_full backend is forward-only")
        from .pallas_march import make_pallas_image_render

        rgb_render = make_pallas_image_render(spec, cfg, width, height, interpret=interpret)

        def render_full(arrays: TapeArrays, camera):
            cam_vec = jnp.concatenate(
                [
                    jnp.asarray(camera.position, jnp.float32),
                    jnp.asarray(camera.rotation, jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                ]
            )
            r, g, b = rgb_render(arrays, cam_vec)
            color = jnp.stack([r, g, b], axis=-1)
            return color.reshape(height, width, s, 3).mean(axis=2)

        return render_full
    else:
        raise ValueError(f"unknown backend: {backend}")

    def shade_chunk(idx, t, hit, arrays, camera):
        origins, dirs = raygen_flat(
            idx, camera.position, camera.rotation, width, height, cfg
        )
        color = shade(scene, origins, dirs, t, hit, arrays, cfg, albedo_fn)
        return _gamma(color)

    if backend == "pallas_image":

        def render(arrays: TapeArrays, camera):
            cam_vec = jnp.concatenate(
                [
                    jnp.asarray(camera.position, jnp.float32),
                    jnp.asarray(camera.rotation, jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                ]
            )
            t, hit, _ = image_march(arrays, cam_vec)
            if chunk is None:
                idx = jnp.arange(total, dtype=jnp.int32)
                colors = shade_chunk(idx, t, hit, arrays, camera)
            else:
                padded = ((total + chunk - 1) // chunk) * chunk
                idx = jnp.arange(padded, dtype=jnp.int32).reshape(-1, chunk)
                tp = jnp.pad(t, (0, padded - total)).reshape(-1, chunk)
                hp = jnp.pad(hit, (0, padded - total)).reshape(-1, chunk)
                colors = jax.lax.map(
                    lambda args: shade_chunk(args[0], args[1], args[2], arrays, camera),
                    (idx, tp, hp),
                ).reshape(-1, 3)[:total]
            return colors.reshape(height, width, s, 3).mean(axis=2)

        return render

    def per_rays(idx, arrays, camera):
        origins, dirs = raygen_flat(
            idx, camera.position, camera.rotation, width, height, cfg
        )
        if mode == "soft":
            t, hit, s_min, t_min = checkpoint_name(
                march(origins, dirs, arrays), "march"
            )
            color = shade_soft(
                scene, origins, dirs, t, hit, s_min, t_min, arrays, cfg,
                albedo_fn,
            )
        else:
            t, hit, _ = checkpoint_name(march(origins, dirs, arrays), "march")
            color = shade(scene, origins, dirs, t, hit, arrays, cfg, albedo_fn)
        return _gamma(color)

    # For chunked differentiable rendering, rematerialize everything except
    # the march outputs in the backward pass: t/hit are 2 floats/ray while
    # the shading intermediates are tens of floats/ray — without this the
    # reverse pass of lax.map materializes every chunk's intermediates at
    # once (OOM at 1080p x 16 AA).
    per_rays_remat = jax.checkpoint(
        per_rays,
        policy=jax.checkpoint_policies.save_only_these_names("march"),
    )

    def render(arrays: TapeArrays, camera):
        if chunk is None:
            idx = jnp.arange(total, dtype=jnp.int32)
            colors = per_rays(idx, arrays, camera)
        else:
            padded = ((total + chunk - 1) // chunk) * chunk
            idx = jnp.arange(padded, dtype=jnp.int32).reshape(-1, chunk)
            colors = jax.lax.map(
                lambda ix: per_rays_remat(ix, arrays, camera), idx
            ).reshape(-1, 3)[:total]
        return colors.reshape(height, width, s, 3).mean(axis=2)

    return render

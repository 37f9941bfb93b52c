"""Benchmark: forward rays/s at 1080p on the BASELINE config-2 scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N/1e9}
(baseline = BASELINE.json north-star target of 1e9 rays/s/chip forward.)

Headline: the cone-prepass fused Pallas renderer (coarse cone march shared by
all 16 AA rays of a pixel + fused raygen/march/shade/AA-mean fine kernel) on
a static-tape compile of the multi-primitive CSG scene (sphere/box/torus,
union + subtraction; floor rendered analytically on miss, exactly as the
reference does). Secondary numbers go to stderr: plain fused kernel (strict
per-AA-ray reference march semantics), dynamic-tape (zero-recompile-edit)
render, march-only + stats, and fwd+bwd.

Timing protocol: THROUGHPUT — each measurement dispatches `FRAMES` async
frames and syncs once on the final on-device scalar checksum, which is how a
renderer actually runs (frames pipelined, not one blocking round-trip per
frame). This machine reaches the TPU through a network tunnel whose one-way
sync costs ~30 ms, which would otherwise dominate and mismeasure a ~15 ms
frame; per-dispatch latency is reported separately to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

WIDTH, HEIGHT = 1920, 1080
BASELINE_RAYS_PER_S = 1e9
FRAMES = 20

# Round-over-round regression tracking: every timed row lands here and is
# written to BENCH_ROWS.json (committed), and the run compares itself
# against the previous file BEFORE overwriting — a silent regression on any
# row prints a loud REGRESSION line (the round-4 4K regression shipped
# unnoticed because only absolute numbers were printed).
_ROWS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_ROWS.json")
_ROWS: dict = {}
_REGRESSION_PCT = 8.0


def record_row(name, dt_s, n_rays):
    _ROWS[name] = {
        "ms": round(dt_s * 1e3, 3),
        "grays_per_s": round(n_rays / dt_s / 1e9, 4),
    }


def compare_and_write_rows(extra=None):
    prev = None
    if os.path.exists(_ROWS_PATH):
        try:
            with open(_ROWS_PATH) as f:
                prev = json.load(f)
        except Exception:
            prev = None
    n_reg = 0
    if prev and "rows" in prev:
        print("--- round-over-round vs previous BENCH_ROWS.json ---",
              file=sys.stderr)
        for name, cur in _ROWS.items():
            old = prev["rows"].get(name)
            if old is None:
                print(f"  {name}: NEW ({cur['ms']} ms)", file=sys.stderr)
                continue
            pct = (cur["ms"] / old["ms"] - 1.0) * 100.0
            tag = ""
            if pct > _REGRESSION_PCT:
                tag = "  <<< REGRESSION"
                n_reg += 1
            elif pct < -_REGRESSION_PCT:
                tag = "  (improved)"
            print(
                f"  {name}: {old['ms']} -> {cur['ms']} ms ({pct:+.1f}%){tag}",
                file=sys.stderr,
            )
        if n_reg:
            print(f"!!! {n_reg} row(s) regressed > {_REGRESSION_PCT}% — "
                  "investigate before shipping", file=sys.stderr)
    payload = {"rows": _ROWS}
    if extra:
        payload.update(extra)
    with open(_ROWS_PATH, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    return n_reg


def scene_config2(rm):
    """Multi-primitive CSG (BASELINE config 2): sphere/box/torus with union +
    subtraction. The floor is the analytic miss-path plane, as in the
    reference (wgsl:117-128) — not a marched primitive."""
    return (
        rm.sphere(center=(-0.6, 0.0, 0.0), radius=0.9)
        | rm.box(center=(0.8, 0.0, 0.0), half_extents=(0.5, 0.5, 0.5))
    ) - rm.torus(center=(0.0, 0.8, 0.0), major_radius=0.7, minor_radius=0.25)


def main():
    import jax
    import jax.numpy as jnp

    import raymarch_tpu as rm

    import dataclasses as _dc

    # Persistent compilation cache: affects compile time only (the new
    # fwd+bwd kernels take minutes of Mosaic compile each); steady-state
    # timings are unaffected.
    from raymarch_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg0 = rm.DEFAULT_CONFIG  # 4x4 AA = 16 rays/px, max_iter=100 (reference spec)
    # Headline config adds the bounding-sphere march acceleration and an
    # amortized early-exit check (both exact modulo grazing-threshold sample
    # sensitivity; see tests/test_bound_accel, tests/test_prepass).
    cfg = _dc.replace(cfg0, bound_accel=True, exit_check_every=4)
    cfg_ir = _dc.replace(cfg, relax=1.6)
    cfg64 = _dc.replace(cfg, relax=1.6, leaf_cull=True)
    scene = scene_config2(rm)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0.0, 0.0, 0.0))
    n_rays = WIDTH * HEIGHT * cfg.aa_samples**2

    def sync(out):
        return jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0]), out
        )

    def timeit(fn, *args, warmup=2, frames=FRAMES, reps=3):
        """Pipelined throughput: `frames` async dispatches, one sync."""
        out = None
        for _ in range(warmup):
            out = fn(*args)
        sync(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(frames):
                out = fn(*args)
            sync(out)  # drains the pipeline
            best = min(best, (time.perf_counter() - t0) / frames)
        return best, out

    def timeit_latency(fn, *args, warmup=2, iters=5):
        """Single-frame latency: dispatch + blocking sync per call."""
        for _ in range(warmup):
            sync(fn(*args))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn(*args))
            times.append(time.perf_counter() - t0)
        return min(times)

    # --- on-device parity gate ----------------------------------------------
    # Before timing anything, render one small frame per benchmarked kernel
    # configuration ON THE REAL CHIP (interpret=False) and compare it with
    # the NumPy oracle. The test suite pins itself to CPU and validates the
    # Pallas kernels in interpret mode (tests/conftest.py) — this gate is
    # what catches a Mosaic-vs-interpret miscompile on actual hardware.
    from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

    PW, PH = 256, 144
    # Gate camera tilts 31 deg down (> fovy/2) so the analytic floor's
    # HORIZON line is out of frame: at the horizon the checkerboard
    # frequency exceeds the pixel frequency and the 16-sample AA mean is
    # effectively stochastic — f32 kernel vs f64 oracle legitimately
    # disagree there per pixel, which would mask real miscompiles.
    pcam = rm.Camera.looking_at(position=(0.0, 2.6, 4.2), target=(0, 0, 0))
    pcv = jnp.asarray(
        np.concatenate([pcam.position, pcam.rotation, [0.0]]).astype(np.float32)
    )
    # Small cluster scene exercising the compact/cull path on-device.
    prng = np.random.default_rng(3)
    pcl = []
    for _ in range(4):
        c = prng.uniform(-1.5, 1.5, 3)
        c[1] = prng.uniform(-0.3, 0.8)
        base = rm.sphere(center=tuple(c), radius=float(prng.uniform(0.3, 0.5)))
        off = prng.uniform(-0.3, 0.3, 3)
        pcl.append(
            base.union(
                rm.sphere(center=tuple(c + off), radius=0.2), k=0.15
            ).subtract(rm.sphere(center=tuple(c - off), radius=0.2), k=0.12)
        )
    for _ in range(4):
        c = prng.uniform(-1.8, 1.8, 3)
        c[1] = prng.uniform(-0.3, 0.8)
        pcl.append(rm.sphere(center=tuple(c), radius=0.3))
    pscene_cl = pcl[0]
    for p in pcl[1:]:
        pscene_cl = pscene_cl | p

    # Second gate camera: steeper tilt (32 deg > fovy/2, horizon out of
    # frame) from a different azimuthal height — catches list-geometry /
    # band-offset miscompiles the primary camera's tile layout can miss
    # (the round-4 4K regression was invisible to a single-viewpoint gate).
    pcam2 = rm.Camera.looking_at(position=(0.0, 5.0, 8.0), target=(0, 0, 0))
    pcv2 = jnp.asarray(
        np.concatenate([pcam2.position, pcam2.rotation, [0.0]]).astype(
            np.float32
        )
    )

    _oracle_cache = {}

    def _oracle_img(sc, cam_o):
        key = (id(sc), id(cam_o))
        if key not in _oracle_cache:
            _oracle_cache[key] = rm.oracle.render(
                rm.encode_wire(sc), cam_o, PW, PH, cfg0
            )
        return _oracle_cache[key]

    def _neigh_diff(img, ref):
        """Per-pixel min over |img - ref| across ref's 3x3 neighborhood:
        absorbs half-pixel silhouette sampling shifts (f32 kernel vs f64
        oracle) while still flagging structural miscompiles."""
        H, W, _ = img.shape
        best = np.full((H, W), np.inf, np.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ys = slice(max(0, dy), H + min(0, dy))
                xs = slice(max(0, dx), W + min(0, dx))
                ys2 = slice(max(0, -dy), H + min(0, -dy))
                xs2 = slice(max(0, -dx), W + min(0, -dx))
                dd = np.abs(img[ys, xs] - ref[ys2, xs2]).max(-1)
                best[ys, xs] = np.minimum(best[ys, xs], dd)
        return best

    def parity(name, sc, cfg_p, static=True, tight=False, cam2=False, **kw):
        spec_p, arrays_p = rm.compile_scene(sc, static=static)
        rnd_p = make_pallas_image_render_aa(spec_p, cfg_p, PW, PH, **kw)
        img = np.asarray(jax.jit(rnd_p)(arrays_p, pcv2 if cam2 else pcv))
        ref = _oracle_img(sc, pcam2 if cam2 else pcam)
        d = np.abs(img - ref)
        nd = _neigh_diff(img, ref)
        frac = float((nd > 0.01).mean())
        if tight:
            # Exact reference march semantics: the kernel must match the
            # oracle everywhere (f32 rounding only).
            ok = d.max() < 1e-3
        else:
            # Accelerated paths (cone prepass / intervals / relax / cull):
            # grazing AA samples may flip hit/miss within the documented
            # conservative tolerance class — bound the mean and the
            # fraction of edge pixels instead of the max.
            ok = d.mean() < 5e-4 and frac < 0.008
        print(
            f"parity[{name}]: {'PASS' if ok else 'FAIL'} "
            f"mean={d.mean():.2e} max={d.max():.2e} frac_n>1e-2={frac:.4f}",
            file=sys.stderr,
        )
        assert ok, f"on-device parity FAIL for path '{name}'"

    parity("headline-prepass", scene, cfg, prepass_block=1, aa_packed=True)
    parity(
        "interval+relax", scene, cfg_ir,
        prepass_block=1, n_intervals=2, aa_packed=True,
    )
    parity(
        "no-prepass", scene, cfg, tight=True, no_prepass=True, aa_packed=True
    )
    parity(
        "strict-reference", scene, cfg0, tight=True,
        no_prepass=True, aa_packed=True,
    )
    parity(
        "dynamic-tape", scene, cfg, static=False,
        prepass_block=1, aa_packed=True,
    )
    parity(
        "compact-cull", pscene_cl, cfg64,
        prepass_block=1, n_intervals=2, aa_packed=True,
    )
    parity(
        "headline-cam2", scene, cfg, cam2=True,
        prepass_block=1, aa_packed=True,
    )

    # Band-offset gate: the 4K rows render through band_rows kernels whose
    # first image row arrives at runtime via cam_vec[7] — gate that exact
    # configuration by rendering the middle band of the gate frame and
    # comparing it against the full-frame oracle's crop.
    spec_bg, arrays_bg = rm.compile_scene(scene, static=True)
    rnd_bg = make_pallas_image_render_aa(
        spec_bg, cfg_ir, PW, PH, band_rows=48,
        prepass_block=1, n_intervals=2, aa_packed=True,
    )
    pcv_band = jnp.asarray(
        np.concatenate([pcam.position, pcam.rotation, [48.0]]).astype(
            np.float32
        )
    )
    img_band = np.asarray(jax.jit(rnd_bg)(arrays_bg, pcv_band))
    ref_band = _oracle_img(scene, pcam)[48:96]
    d_b = np.abs(img_band - ref_band)
    nd_b = _neigh_diff(img_band, ref_band)
    frac_b = float((nd_b > 0.01).mean())
    ok_b = d_b.mean() < 5e-4 and frac_b < 0.008
    print(
        f"parity[band-offset]: {'PASS' if ok_b else 'FAIL'} "
        f"mean={d_b.mean():.2e} max={d_b.max():.2e} frac_n>1e-2={frac_b:.4f}",
        file=sys.stderr,
    )
    assert ok_b, "on-device parity FAIL for path 'band-offset'"

    # --- headline: cone-prepass fused renderer, static tape -----------------
    spec_s, arrays_s = rm.compile_scene(scene, static=True)

    rnd = make_pallas_image_render_aa(
        spec_s, cfg, WIDTH, HEIGHT, prepass_block=1, aa_packed=True
    )
    cam_vec = jnp.asarray(
        np.concatenate([cam.position, cam.rotation, [0.0]]).astype(np.float32)
    )
    headline = jax.jit(lambda a, c: jnp.sum(rnd(a, c)))
    dt_head, _ = timeit(headline, arrays_s, cam_vec)
    fwd_rays_per_s = n_rays / dt_head
    print(
        f"cone-prepass fused render (static tape): {dt_head*1e3:.2f} ms/frame, "
        f"{fwd_rays_per_s/1e9:.3f} Grays/s",
        file=sys.stderr,
    )
    record_row("headline_prepass_static", dt_head, n_rays)
    lat = timeit_latency(headline, arrays_s, cam_vec)
    print(
        f"  single-frame latency (incl. tunnel round-trip): {lat*1e3:.1f} ms",
        file=sys.stderr,
    )

    # --- secondary: interval prepass + relaxed stepping ---------------------
    # (same conservative tolerance class; see ops.pallas_prepass docstrings)
    rnd_ir = make_pallas_image_render_aa(
        spec_s, cfg_ir, WIDTH, HEIGHT, prepass_block=1, n_intervals=2,
        aa_packed=True,
    )
    fast = jax.jit(lambda a, c: jnp.sum(rnd_ir(a, c)))
    dt_ir, _ = timeit(fast, arrays_s, cam_vec)
    print(
        f"interval-prepass + relaxed render (static): {dt_ir*1e3:.2f} ms/frame, "
        f"{n_rays/dt_ir/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("interval_relax_static", dt_ir, n_rays)

    # --- secondary: 64-primitive scene (BASELINE config-5 class) ------------
    # Per-tile subtree culling + interval prepass + relaxed stepping breaks
    # the O(n_leaves)-per-query cost (reference interprets the whole tape
    # per query, wgsl:197-202).
    rng64 = np.random.default_rng(7)
    parts = []
    for _ in range(64):
        c = rng64.uniform(-3, 3, 3)
        c[1] = rng64.uniform(-1.0, 1.5)
        parts.append(
            rm.sphere(center=tuple(c), radius=float(rng64.uniform(0.15, 0.5)))
        )
    scene64 = parts[0]
    for p in parts[1:]:
        scene64 = scene64 | p
    spec64, arrays64 = rm.compile_scene(scene64, static=True)
    # Gate the EXACT 64-leaf kernel configuration the rows below time, from
    # the second camera (round-5 parity-gate hardening: the timed compact
    # plan geometries get their own on-device oracle check).
    parity(
        "compact-64leaf-cam2", scene64, cfg64, cam2=True,
        prepass_block=1, n_intervals=2, aa_packed=True,
    )
    cam64 = rm.Camera.looking_at(position=(0.0, 2.5, 9.0), target=(0.0, 0.0, 0.0))
    cam64_vec = jnp.asarray(
        np.concatenate([cam64.position, cam64.rotation, [0.0]]).astype(np.float32)
    )
    rnd64 = make_pallas_image_render_aa(
        spec64, cfg64, WIDTH, HEIGHT, prepass_block=1, n_intervals=2,
        aa_packed=True,
    )
    f64 = jax.jit(lambda a, c: jnp.sum(rnd64(a, c)))
    dt_64, _ = timeit(f64, arrays64, cam64_vec)
    print(
        f"64-primitive render (cull+intervals+relax): {dt_64*1e3:.2f} ms/frame, "
        f"{n_rays/dt_64/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("64leaf_cull_intervals", dt_64, n_rays)

    # --- secondary: 64-primitive MIXED-ops scene ----------------------------
    # Smooth unions and subtractions over the hard-union bulk: the general
    # scene class of the segmented compact plan (pallas_march.
    # build_compact_plan) — the many-primitive number must hold beyond the
    # pure-union best case.
    partsm = []
    for _ in range(48):
        c = rng64.uniform(-3, 3, 3)
        c[1] = rng64.uniform(-1.0, 1.5)
        partsm.append(
            rm.sphere(center=tuple(c), radius=float(rng64.uniform(0.15, 0.5)))
        )
    scene_m = partsm[0]
    for p in partsm[1:]:
        scene_m = scene_m | p
    for _ in range(8):
        c = rng64.uniform(-2.5, 2.5, 3)
        c[1] = rng64.uniform(-0.8, 1.2)
        scene_m = scene_m.union(
            rm.sphere(center=tuple(c), radius=float(rng64.uniform(0.2, 0.45))),
            k=float(rng64.uniform(0.1, 0.3)),
        )
    for _ in range(4):
        c = rng64.uniform(-2.5, 2.5, 3)
        c[1] = rng64.uniform(-0.8, 1.2)
        scene_m = scene_m - rm.sphere(
            center=tuple(c), radius=float(rng64.uniform(0.3, 0.6))
        )
    for _ in range(4):
        c = rng64.uniform(-2.5, 2.5, 3)
        c[1] = rng64.uniform(-0.8, 1.2)
        scene_m = scene_m.subtract(
            rm.sphere(center=tuple(c), radius=float(rng64.uniform(0.3, 0.6))),
            k=float(rng64.uniform(0.1, 0.25)),
        )
    spec_m, arrays_m = rm.compile_scene(scene_m, static=True)
    rnd_m = make_pallas_image_render_aa(
        spec_m, cfg64, WIDTH, HEIGHT, prepass_block=1, n_intervals=2,
        aa_packed=True,
    )
    assert rnd_m.compact, "mixed-ops scene must take the compacted path"
    fm = jax.jit(lambda a, c: jnp.sum(rnd_m(a, c)))
    dt_m, _ = timeit(fm, arrays_m, cam64_vec)
    print(
        f"64-primitive smooth-CHAIN render (global coupling worst case): "
        f"{dt_m*1e3:.2f} ms/frame, {n_rays/dt_m/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("64leaf_smooth_chain", dt_m, n_rays)

    # 64-leaf CLUSTER scene: 16 spatially-local clusters of (base sphere
    # smooth-unioned with a blob, smooth-subtracted dent) + 16 bare
    # spheres, all hard-unioned — the representative mixed-op scene class
    # (blends as local design features). Path-aware per-leaf cull bounds
    # (culling._leaf_op_incidence) + the multi-segment stream fold keep
    # this O(active-local); the chain row above is the honest
    # everything-coupled worst case where sum-k activity is math-mandated.
    clparts = []
    for _ in range(16):
        c = rng64.uniform(-3, 3, 3)
        c[1] = rng64.uniform(-1.0, 1.5)
        base = rm.sphere(
            center=tuple(c), radius=float(rng64.uniform(0.25, 0.5))
        )
        off = rng64.uniform(-0.35, 0.35, 3)
        blob = rm.sphere(
            center=tuple(c + off), radius=float(rng64.uniform(0.15, 0.3))
        )
        dent = rm.sphere(
            center=tuple(c - off), radius=float(rng64.uniform(0.15, 0.3))
        )
        clparts.append(
            base.union(blob, k=float(rng64.uniform(0.1, 0.25))).subtract(
                dent, k=float(rng64.uniform(0.1, 0.2))
            )
        )
    for _ in range(16):
        c = rng64.uniform(-3, 3, 3)
        c[1] = rng64.uniform(-1.0, 1.5)
        clparts.append(
            rm.sphere(center=tuple(c), radius=float(rng64.uniform(0.15, 0.5)))
        )
    scene_cl = clparts[0]
    for p in clparts[1:]:
        scene_cl = scene_cl | p
    spec_cl, arrays_cl = rm.compile_scene(scene_cl, static=True)
    rnd_cl = make_pallas_image_render_aa(
        spec_cl, cfg64, WIDTH, HEIGHT, prepass_block=1, n_intervals=2,
        aa_packed=True,
    )
    assert rnd_cl.compact, "cluster scene must take the compacted path"
    fcl = jax.jit(lambda a, c: jnp.sum(rnd_cl(a, c)))
    dt_cl, _ = timeit(fcl, arrays_cl, cam64_vec)
    print(
        f"64-primitive MIXED cluster render (stream compact plan): "
        f"{dt_cl*1e3:.2f} ms/frame, {n_rays/dt_cl/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("64leaf_mixed_cluster", dt_cl, n_rays)

    # 256-primitive scene: evidence the O(active) machinery scales past the
    # BASELINE config-5 size (exercises the SMEM-budget list coarsening;
    # see tests/test_compact.py::test_256_leaf_*).
    rng256 = np.random.default_rng(21)
    p256 = []
    for _ in range(256):
        c = rng256.uniform(-6, 6, 3)
        c[1] = rng256.uniform(-1.0, 2.0)
        p256.append(
            rm.sphere(center=tuple(c), radius=float(rng256.uniform(0.15, 0.45)))
        )
    while len(p256) > 1:
        p256 = [
            p256[i] | p256[i + 1] if i + 1 < len(p256) else p256[i]
            for i in range(0, len(p256), 2)
        ]
    spec256, arrays256 = rm.compile_scene(p256[0], static=True)
    cam256 = rm.Camera.looking_at(position=(0.0, 4.0, 16.0), target=(0, 0, 0))
    cam256_vec = jnp.asarray(
        np.concatenate([cam256.position, cam256.rotation, [0.0]]).astype(
            np.float32
        )
    )
    # prepass_block=4 for the many-leaf rows: one cone per 4x4-pixel block
    # cuts the coarse pass ~2x at 256+ leaves (measured: 61.9 -> 51.8 ms)
    # while 64-leaf scenes are faster at block=1 (18.7 vs 21.2 ms) — wider
    # block cones start fine rays earlier than they save coarse work there.
    rnd256 = make_pallas_image_render_aa(
        spec256, cfg64, WIDTH, HEIGHT, prepass_block=4, n_intervals=2,
        aa_packed=True,
    )
    assert rnd256.compact, "256-leaf scene must take the compacted path"
    f256 = jax.jit(lambda a, c: jnp.sum(rnd256(a, c)))
    dt_256, _ = timeit(f256, arrays256, cam256_vec)
    print(
        f"256-primitive render (compact, coarsened lists): "
        f"{dt_256*1e3:.2f} ms/frame, {n_rays/dt_256/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("256leaf_compact", dt_256, n_rays)

    # 1024-primitive scene (round-5 scale ceiling): list x-coarsening keeps
    # the compact path alive where row-only coarsening forced the gated
    # O(L) fallback.
    rng1k = np.random.default_rng(33)
    p1k = []
    for _ in range(1024):
        c = rng1k.uniform(-12, 12, 3)
        c[1] = rng1k.uniform(-1.0, 2.5)
        p1k.append(
            rm.sphere(center=tuple(c), radius=float(rng1k.uniform(0.15, 0.45)))
        )
    while len(p1k) > 1:
        p1k = [
            p1k[i] | p1k[i + 1] if i + 1 < len(p1k) else p1k[i]
            for i in range(0, len(p1k), 2)
        ]
    spec1k, arrays1k = rm.compile_scene(p1k[0], static=True)
    cam1k = rm.Camera.looking_at(position=(0.0, 6.0, 30.0), target=(0, 0, 0))
    cam1k_vec = jnp.asarray(
        np.concatenate([cam1k.position, cam1k.rotation, [0.0]]).astype(
            np.float32
        )
    )
    rnd1k = make_pallas_image_render_aa(
        spec1k, cfg64, WIDTH, HEIGHT, prepass_block=4, n_intervals=2,
        aa_packed=True,
    )
    assert rnd1k.compact, "1024-leaf scene must take the compacted path"
    f1k = jax.jit(lambda a, c: jnp.sum(rnd1k(a, c)))
    dt_1k, _ = timeit(f1k, arrays1k, cam1k_vec, frames=10, reps=2)
    print(
        f"1024-primitive render (compact, xy-coarsened lists): "
        f"{dt_1k*1e3:.2f} ms/frame, {n_rays/dt_1k/1e9:.3f} Grays/s",
        file=sys.stderr,
    )
    record_row("1024leaf_compact", dt_1k, n_rays)

    # BASELINE config 5 at full 4K on the single chip, rendered as 3 row
    # bands of 720 (the row-sharded multi-chip structure; also keeps the
    # per-kernel grid small enough for SMEM — Mosaic's scoped SMEM grows
    # with grid-step count and a monolithic 4K cull grid exceeds the 1 MB
    # budget by ~4%).
    rnd4k = make_pallas_image_render_aa(
        spec64, cfg64, 3840, 2160, prepass_block=1, n_intervals=2,
        band_rows=720, aa_packed=True,
    )
    offs = [
        jnp.asarray(
            np.concatenate(
                [cam64.position, cam64.rotation, [float(r)]]
            ).astype(np.float32)
        )
        for r in (0, 720, 1440)
    ]

    def frame4k(a, cvs):
        return sum(jnp.sum(rnd4k(a, cv)) for cv in cvs)

    f4k = jax.jit(frame4k)
    dt_4k, _ = timeit(f4k, arrays64, offs, frames=5, reps=2)
    n4k = 3840 * 2160 * cfg.aa_samples**2
    print(
        f"64-primitive 4K render (BASELINE config 5, 1 chip, 3 bands): "
        f"{dt_4k*1e3:.2f} ms/frame, {n4k/dt_4k/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("64leaf_4k_3band", dt_4k, n4k)

    # --- secondary: per-AA-ray march (no prepass; bound accel + K=4) --------
    rnd_np = make_pallas_image_render_aa(
        spec_s, cfg, WIDTH, HEIGHT, no_prepass=True, aa_packed=True
    )
    fused = jax.jit(lambda a, c: jnp.sum(rnd_np(a, c)))
    dt_fused, _ = timeit(fused, arrays_s, cam_vec)
    print(
        f"per-AA-ray march render (no prepass): {dt_fused*1e3:.2f} ms/frame, "
        f"{n_rays/dt_fused/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("no_prepass", dt_fused, n_rays)

    # --- secondary: STRICT reference march semantics (no accel at all) ------
    # Every AA ray sphere-traces from t=0, plain steps, per-step exit check,
    # no bound/cone/interval/relax/cull — exactly wgsl:87-115. The 2D image-
    # rectangle tiling + in-kernel AA mean + hit-gated normals are pure
    # scheduling choices (identical math), so this is the honest
    # apples-to-apples number for the reference's own cost model.
    rnd_na = make_pallas_image_render_aa(
        spec_s, cfg0, WIDTH, HEIGHT, no_prepass=True, aa_packed=True
    )
    fused_na = jax.jit(lambda a, c: jnp.sum(rnd_na(a, c)))
    dt_na, _ = timeit(fused_na, arrays_s, cam_vec)
    print(
        f"strict-reference-semantics render (no accel): {dt_na*1e3:.2f} ms/frame, "
        f"{n_rays/dt_na/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("strict_reference", dt_na, n_rays)

    # --- secondary: dynamic tape (zero-recompile runtime edits) -------------
    # Same cone-prepass configuration as the static headline; the macro-op
    # interpreter (ops.tape.macroize_streams) keeps the gap ~1.4x.
    spec_d, arrays_d = rm.compile_scene(scene)
    rnd_d = make_pallas_image_render_aa(
        spec_d, cfg, WIDTH, HEIGHT, prepass_block=1, aa_packed=True
    )
    fused_d = jax.jit(lambda a, c: jnp.sum(rnd_d(a, c)))
    dt_dyn, _ = timeit(fused_d, arrays_d, cam_vec)
    print(
        f"cone-prepass render (dynamic tape): {dt_dyn*1e3:.2f} ms/frame, "
        f"{n_rays/dt_dyn/1e9:.3f} Grays/s",
        file=sys.stderr,
    )

    record_row("dynamic_tape_prepass", dt_dyn, n_rays)

    # --- secondary: march-only + stats --------------------------------------
    from raymarch_tpu.ops.pallas_march import make_pallas_image_march

    im = make_pallas_image_march(spec_s, cfg, WIDTH, HEIGHT)
    march_fn = jax.jit(
        lambda a, c: (lambda t, h, s: (jnp.sum(t), jnp.mean(h), jnp.mean(s)))(
            *im(a, c)
        )
    )
    dt_march, out = timeit(march_fn, arrays_s, cam_vec)
    _, hit_rate, avg_steps = (float(np.asarray(x)) for x in out)
    print(
        f"march-only: {dt_march*1e3:.2f} ms, {n_rays/dt_march/1e9:.3f} Grays/s, "
        f"avg steps/ray {avg_steps:.1f}, hit rate {hit_rate:.3f}",
        file=sys.stderr,
    )

    record_row("march_only", dt_march, n_rays)

    # Fast march-only (round 5): the raw-march API on the fused path's
    # scheduling — cone prepass + AA-packed 2-D tiles, shading skipped.
    from raymarch_tpu.ops.pallas_prepass import make_pallas_image_march_fast

    imf = make_pallas_image_march_fast(
        spec_s, cfg_ir, WIDTH, HEIGHT, prepass_block=1, n_intervals=2
    )
    march_fast = jax.jit(
        lambda a, c: (lambda t, h: (jnp.sum(t), jnp.mean(h)))(*imf(a, c))
    )
    dt_mf, outf = timeit(march_fast, arrays_s, cam_vec)
    hit_rate_f = float(np.asarray(outf[1]))
    print(
        f"march-only FAST (prepass+packed): {dt_mf*1e3:.2f} ms, "
        f"{n_rays/dt_mf/1e9:.3f} Grays/s, hit rate {hit_rate_f:.3f}",
        file=sys.stderr,
    )
    record_row("march_only_fast", dt_mf, n_rays)

    # --- secondary: fwd+bwd (pixel-loss gradient wrt scene params + camera) -
    try:
        import dataclasses

        from raymarch_tpu.ops.pallas_grad import make_fused_render_vjp

        rv = make_fused_render_vjp(spec_s, cfg, WIDTH, HEIGHT, bm=128)

        def loss_fused(lp, opp, c):
            a = dataclasses.replace(arrays_s, leaf_params=lp, op_param=opp)
            return jnp.mean(rv(a, c) ** 2)

        grad_fused = jax.jit(
            lambda lp, opp, c: jax.grad(loss_fused, argnums=(0, 1, 2))(lp, opp, c)
        )
        lp = jnp.asarray(arrays_s.leaf_params)
        opp = jnp.asarray(arrays_s.op_param)
        dt_bwd, _ = timeit(grad_fused, lp, opp, cam_vec, warmup=2, frames=10, reps=2)
        print(
            f"fwd+bwd (fused Pallas vjp): {dt_bwd*1e3:.1f} ms, "
            f"{n_rays/dt_bwd/1e9:.3f} Grays/s",
            file=sys.stderr,
        )

        record_row("fwdbwd_fused", dt_bwd, n_rays)

        # Soft-coverage fwd+bwd (silhouette gradients at fused speed):
        # packed no-prepass forward with (s_min, t_min) residuals + the
        # envelope term in the Pallas backward. bound_accel/relax off by
        # the soft path's exactness requirements.
        cfg_soft = _dc.replace(cfg0, exit_check_every=4, bound_accel=True)
        rv_soft = make_fused_render_vjp(
            spec_s, cfg_soft, WIDTH, HEIGHT, soft=True
        )

        def loss_soft(lp, opp, c):
            a = dataclasses.replace(arrays_s, leaf_params=lp, op_param=opp)
            return jnp.mean(rv_soft(a, c) ** 2)

        grad_soft = jax.jit(
            lambda lp, opp, c: jax.grad(loss_soft, argnums=(0, 1, 2))(
                lp, opp, c
            )
        )
        dt_soft, _ = timeit(grad_soft, lp, opp, cam_vec, warmup=2)
        print(
            f"soft-coverage fwd+bwd (fused Pallas vjp + envelope): "
            f"{dt_soft*1e3:.1f} ms, {n_rays/dt_soft/1e9:.3f} Grays/s",
            file=sys.stderr,
        )

        record_row("fwdbwd_soft", dt_soft, n_rays)

        # 64-primitive fwd+bwd through the O(active) compact backward
        # (winner-masked min-fold transpose; pallas_grad._make_compact_bwd).
        rv64 = make_fused_render_vjp(spec64, cfg64, WIDTH, HEIGHT)
        assert rv64.compact_bwd, "64-leaf scene must take the compact backward"

        def loss64(lp, opp, c):
            a = dataclasses.replace(arrays64, leaf_params=lp, op_param=opp)
            return jnp.mean(rv64(a, c) ** 2)

        grad64 = jax.jit(
            lambda lp, opp, c: jax.grad(loss64, argnums=(0, 1, 2))(lp, opp, c)
        )
        lp64_ = jnp.asarray(arrays64.leaf_params)
        opp64_ = jnp.asarray(arrays64.op_param)
        dt_b64, _ = timeit(
            grad64, lp64_, opp64_, cam64_vec, warmup=2, frames=10, reps=2
        )
        print(
            f"64-primitive fwd+bwd (compact O(active) vjp): {dt_b64*1e3:.1f} ms, "
            f"{n_rays/dt_b64/1e9:.3f} Grays/s",
            file=sys.stderr,
        )

        record_row("fwdbwd_64leaf_compact", dt_b64, n_rays)

        # 64-leaf MIXED cluster fwd+bwd: the round-5 generalized O(active)
        # backward (stream plan fold replay + reverse sweeps) — training
        # speed for the general scene class, not just pure hard unions.
        rv_cl = make_fused_render_vjp(spec_cl, cfg64, WIDTH, HEIGHT)
        assert rv_cl.compact_bwd, (
            "cluster scene must take the compact backward: "
            + str(rv_cl.backward_info)
        )

        def loss_cl(lp, opp, c):
            a = dataclasses.replace(arrays_cl, leaf_params=lp, op_param=opp)
            return jnp.mean(rv_cl(a, c) ** 2)

        grad_cl = jax.jit(
            lambda lp, opp, c: jax.grad(loss_cl, argnums=(0, 1, 2))(lp, opp, c)
        )
        dt_bcl, _ = timeit(
            grad_cl,
            jnp.asarray(arrays_cl.leaf_params),
            jnp.asarray(arrays_cl.op_param),
            cam64_vec,
            warmup=2, frames=10, reps=2,
        )
        print(
            f"64-leaf MIXED cluster fwd+bwd (compact stream vjp): "
            f"{dt_bcl*1e3:.1f} ms, {n_rays/dt_bcl/1e9:.3f} Grays/s",
            file=sys.stderr,
        )
        record_row("fwdbwd_64leaf_cluster", dt_bcl, n_rays)

        # Painted-material 64-leaf fwd+bwd: winner-routed albedo gradients
        # through the compact backward (pool-only painted plans).
        rngp = np.random.default_rng(17)
        pparts = []
        for _ in range(64):
            c = rngp.uniform(-3, 3, 3)
            c[1] = rngp.uniform(-1.0, 1.5)
            pparts.append(
                rm.sphere(
                    center=tuple(c),
                    radius=float(rngp.uniform(0.15, 0.5)),
                    material=tuple(rngp.uniform(0.1, 0.9, 3)),
                )
            )
        scene_p = pparts[0]
        for p in pparts[1:]:
            scene_p = scene_p | p
        spec_p, arrays_p = rm.compile_scene(scene_p, static=True)
        rv_p = make_fused_render_vjp(spec_p, cfg64, WIDTH, HEIGHT)
        assert rv_p.compact_bwd, (
            "painted 64-leaf scene must take the compact backward: "
            + str(rv_p.backward_info)
        )

        def loss_p(lp, opp, c):
            a = dataclasses.replace(arrays_p, leaf_params=lp, op_param=opp)
            return jnp.mean(rv_p(a, c) ** 2)

        grad_p = jax.jit(
            lambda lp, opp, c: jax.grad(loss_p, argnums=(0, 1, 2))(lp, opp, c)
        )
        dt_bp, _ = timeit(
            grad_p,
            jnp.asarray(arrays_p.leaf_params),
            jnp.asarray(arrays_p.op_param),
            cam64_vec,
            warmup=2, frames=10, reps=2,
        )
        print(
            f"64-leaf PAINTED fwd+bwd (compact vjp, winner-routed albedo): "
            f"{dt_bp*1e3:.1f} ms, {n_rays/dt_bp/1e9:.3f} Grays/s",
            file=sys.stderr,
        )
        record_row("fwdbwd_64leaf_painted", dt_bp, n_rays)

        # 64-leaf SOFT fwd+bwd (round 5): silhouette/coverage gradients at
        # many-primitive scale — per-leaf soft bound inflation keeps the
        # cull/compact machinery exact, the compact backward adds the
        # envelope sweep at the frozen closest approach.
        cfg_soft64 = _dc.replace(
            cfg0, exit_check_every=4, bound_accel=True, leaf_cull=True
        )
        rv_s64 = make_fused_render_vjp(
            spec64, cfg_soft64, WIDTH, HEIGHT, soft=True
        )
        assert rv_s64.compact_bwd, (
            "soft 64-leaf scene must take the compact backward: "
            + str(rv_s64.backward_info)
        )

        def loss_s64(lp, opp, c):
            a = dataclasses.replace(arrays64, leaf_params=lp, op_param=opp)
            return jnp.mean(rv_s64(a, c) ** 2)

        grad_s64 = jax.jit(
            lambda lp, opp, c: jax.grad(loss_s64, argnums=(0, 1, 2))(
                lp, opp, c
            )
        )
        dt_s64, _ = timeit(
            grad_s64,
            jnp.asarray(arrays64.leaf_params),
            jnp.asarray(arrays64.op_param),
            cam64_vec,
            warmup=2, frames=10, reps=2,
        )
        print(
            f"64-leaf SOFT fwd+bwd (compact vjp + envelope): "
            f"{dt_s64*1e3:.1f} ms, {n_rays/dt_s64/1e9:.3f} Grays/s",
            file=sys.stderr,
        )
        record_row("fwdbwd_64leaf_soft", dt_s64, n_rays)

        # Fast-soft config: soft_cull_log_alpha=24 makes leaf culling
        # effective in soft mode (directly dropped alpha <= 4e-11;
        # sample-phase tolerance class on grazing edge pixels — see
        # RenderConfig.soft_cull_log_alpha).
        cfg_soft24 = _dc.replace(cfg_soft64, soft_cull_log_alpha=24.0)
        rv_s24 = make_fused_render_vjp(
            spec64, cfg_soft24, WIDTH, HEIGHT, soft=True
        )
        assert rv_s24.compact_bwd

        def loss_s24(lp, opp, c):
            a = dataclasses.replace(arrays64, leaf_params=lp, op_param=opp)
            return jnp.mean(rv_s24(a, c) ** 2)

        grad_s24 = jax.jit(
            lambda lp, opp, c: jax.grad(loss_s24, argnums=(0, 1, 2))(
                lp, opp, c
            )
        )
        dt_s24, _ = timeit(
            grad_s24,
            jnp.asarray(arrays64.leaf_params),
            jnp.asarray(arrays64.op_param),
            cam64_vec,
            warmup=2, frames=10, reps=2,
        )
        print(
            f"64-leaf SOFT fwd+bwd (fast cull, log_alpha=24): "
            f"{dt_s24*1e3:.1f} ms, {n_rays/dt_s24/1e9:.3f} Grays/s",
            file=sys.stderr,
        )
        record_row("fwdbwd_64leaf_soft_la24", dt_s24, n_rays)

        render = rm.make_renderer(
            spec_s, WIDTH, HEIGHT, cfg, mode="implicit", backend="pallas",
            chunk=1 << 20,
        )

        def loss(lp, camera):
            img = render(dataclasses.replace(arrays_s, leaf_params=lp), camera)
            return jnp.mean(img**2)

        grad_fn = jax.jit(lambda lp, c: jax.grad(loss)(lp, c))
        dt_bwd2, _ = timeit(grad_fn, lp, cam, warmup=1, frames=4, reps=2)
        print(
            f"fwd+bwd (jnp shading path): {dt_bwd2*1e3:.1f} ms, "
            f"{n_rays/dt_bwd2/1e9:.3f} Grays/s",
            file=sys.stderr,
        )
        record_row("fwdbwd_jnp", dt_bwd2, n_rays)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"fwd+bwd benchmark failed: {type(e).__name__}: {e}", file=sys.stderr)

    # --- predicted multi-chip efficiency from measured band times -----------
    # The strongest 8->32 evidence a one-chip environment can produce
    # (BASELINE north star >= 95% efficiency): time each of 32 contiguous row
    # bands on the real chip, then compute per-device utilization efficiency
    # mean/max for (a) contiguous assignment (device d = bands 4d..4d+3) and
    # (b) parallel.render row_interleave=4 (device d = bands d, d+8, ...).
    # The all-reduce payload is ~KB (one collective/step, ARCHITECTURE
    # "Communication analysis"), so band-compute skew IS the efficiency model.
    eff = {}
    try:
        import bench_bands as bb

        for name, (sp, ar, cm, cg, bw, bh, kw) in {
            "config2_1080p": (
                spec_s, arrays_s, cam, cfg, WIDTH, HEIGHT,
                dict(prepass_block=1, aa_packed=True),
            ),
            "config5_4k_64leaf": (
                spec64, arrays64, cam64, cfg64, 3840, 2160,
                dict(prepass_block=1, n_intervals=2, aa_packed=True),
            ),
        }.items():
            # Per-band timing noise inflates max/mean (downward-biased
            # efficiency): 1080p bands are sub-millisecond, so each needs
            # MANY pipelined frames per rep for the min-of-3 to converge
            # (frames=10 left the config2 estimate swinging 0.89-0.97
            # between runs).
            times = bb.band_times(
                rm, jax, jnp, sp, ar, cm, cg, bw, bh, 32,
                frames=30, reps=3, **kw
            )
            contig = times.reshape(8, 4).sum(1)
            inter = times.reshape(4, 8).sum(0)
            eff[name] = {
                "predicted_8chip_efficiency_contiguous": round(
                    float(contig.mean() / contig.max()), 4
                ),
                "predicted_8chip_efficiency_interleave4": round(
                    float(inter.mean() / inter.max()), 4
                ),
            }
            print(
                f"bands[{name}]: predicted 8-chip efficiency "
                f"contiguous={eff[name]['predicted_8chip_efficiency_contiguous']:.3f} "
                f"interleave4={eff[name]['predicted_8chip_efficiency_interleave4']:.3f}",
                file=sys.stderr,
            )
        print(json.dumps({"predicted_8chip_efficiency": eff}), file=sys.stderr)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"band-efficiency proxy failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    compare_and_write_rows(extra={"predicted_8chip_efficiency": eff})

    result = {
        "metric": "fwd_rays_per_sec_1080p_16aa",
        "value": fwd_rays_per_s,
        "unit": "rays/s",
        "vs_baseline": fwd_rays_per_s / BASELINE_RAYS_PER_S,
    }
    if eff:
        # Headline efficiency = BASELINE config 5 (the 64-primitive 4K
        # multi-host config the north star's 8->32 clause targets). The
        # 1080p config's bands are sub-millisecond, so its per-band
        # estimator carries ~±4% launch-overhead/timing noise (observed
        # 0.89-0.97 across runs with identical code) — reported in
        # BENCH_ROWS.json alongside, but not as the headline.
        key = "config5_4k_64leaf" if "config5_4k_64leaf" in eff else next(
            iter(eff)
        )
        result["predicted_8chip_efficiency_interleave4"] = eff[key][
            "predicted_8chip_efficiency_interleave4"
        ]
    print(json.dumps(result))


if __name__ == "__main__":
    main()

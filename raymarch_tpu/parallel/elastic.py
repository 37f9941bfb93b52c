"""Failure detection + elastic recovery for long fit runs (SURVEY.md §5).

The reference is an interactive toy with no failure story at all; a
production fit job on a pod slice needs one. JAX's execution model shapes
what "elastic" means here: device meshes are fixed at initialization, so a
lost host cannot be spliced out of a running program — the recoverable unit
is the JOB. The subsystem therefore provides the three pieces that make
job-level recovery cheap and automatic:

- **FitCheckpointer** — atomic, versioned checkpoints of the full fit state
  (TapeArrays, camera pose, optimizer state, loss history). Writes go to a
  temp file then `os.replace` (a crash mid-write can never corrupt the
  latest checkpoint); only process 0 writes; `keep` bounds disk use.
- **Watchdog** — detects a WEDGED step, the failure mode a crashed peer
  actually produces (a collective blocks forever on the dead host; nothing
  raises). A background thread watches step heartbeats and, after
  `timeout` seconds of silence, invokes `on_stall` — by default logging
  loudly; `exit_code` turns it into supervised-restart behavior
  (`os._exit`), which is the correct remedy: die fast, let the supervisor
  relaunch, resume from the last checkpoint.
- **fit_scene(..., checkpoint_dir=, resume=True)** (see fit.py) — wires
  both into the fit loop: every `checkpoint_every` steps a checkpoint is
  written; a restarted job finds the latest one and continues as if never
  interrupted (bitwise-identical state on the same backend).

`tests/test_elastic.py` kills a live two-process distributed fit mid-run
and restarts it; the resumed run must match an uninterrupted one.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, List, Optional, Tuple

import numpy as np

from ..ops.tape import TapeArrays, TapeSpec, arrays_from_streams

_PREFIX = "fitckpt_"


def _spec_fingerprint(spec: TapeSpec) -> str:
    from ..io import _spec_fingerprint as fp

    return fp(spec)


class FitCheckpointer:
    """Atomic npz checkpoints of fit state in `directory`.

    State = (step, TapeArrays, camera pytree, optimizer-state leaves, loss
    history). The optimizer state is stored as flattened leaves and
    restored against a TEMPLATE state (from `step.init_opt_state`) — pytree
    structure is code, leaves are data. Checkpoints are keyed by step;
    `keep` most recent are retained. In a multi-process job only process 0
    writes; `directory` must be shared storage (or any path, for
    single-host jobs) and every process restores from it.
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = max(1, int(keep))
        os.makedirs(directory, exist_ok=True)

    def _is_writer(self) -> bool:
        import jax

        return jax.process_index() == 0

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{_PREFIX}{step:08d}.npz")

    def _steps(self) -> List[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith(_PREFIX) and name.endswith(".npz"):
                try:
                    out.append(int(name[len(_PREFIX):-4]))
                except ValueError:
                    continue
        return sorted(out)

    def save(self, step, spec, arrays, camera, opt_state, losses) -> Optional[str]:
        """Write checkpoint for `step`; returns its path (None on
        non-writer processes)."""
        if not self._is_writer():
            return None
        import jax

        opt_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(opt_state)]
        payload = {
            "step": np.asarray(int(step)),
            "spec": np.frombuffer(
                _spec_fingerprint(spec).encode("utf-8"), dtype=np.uint8
            ),
            "leaf_params": np.asarray(arrays.leaf_params),
            "tape_ops": np.asarray(arrays.tape_ops),
            "tape_arg": np.asarray(arrays.tape_arg),
            "op_param": np.asarray(arrays.op_param),
            "out_slot": np.asarray(arrays.out_slot),
            "cam_position": np.asarray(camera.position),
            "cam_rotation": np.asarray(camera.rotation),
            "losses": np.asarray(losses, dtype=np.float64),
            "n_opt": np.asarray(len(opt_leaves)),
        }
        for i, leaf in enumerate(opt_leaves):
            payload[f"opt_{i}"] = leaf
        path = self._path(int(step))
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)  # atomic publish
        for old in self._steps()[: -self.keep]:
            try:
                os.remove(self._path(old))
            except OSError:  # pragma: no cover - concurrent cleanup
                pass
        return path

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(
        self, spec: TapeSpec, opt_state_template
    ) -> Optional[Tuple[int, TapeArrays, object, object, List[float]]]:
        """Load the newest checkpoint -> (step, arrays, camera, opt_state,
        losses), or None if the directory has no checkpoint. Raises if the
        checkpoint belongs to a different TapeSpec (topology changed —
        stale checkpoints must not silently poison a new run)."""
        step = self.latest_step()
        if step is None:
            return None
        import jax

        from ..utils.camera import Camera

        with np.load(self._path(step)) as z:
            saved = bytes(z["spec"].tobytes()).decode("utf-8")
            if saved != _spec_fingerprint(spec):
                raise ValueError(
                    "checkpoint belongs to a different TapeSpec (scene "
                    "topology/bucketing changed); clear the checkpoint "
                    "directory or recompile the matching scene"
                )
            arrays = arrays_from_streams(
                spec,
                z["leaf_params"],
                z["tape_ops"],
                z["tape_arg"],
                z["op_param"],
                z["out_slot"],
            )
            camera = Camera(
                position=z["cam_position"], rotation=z["cam_rotation"]
            )
            leaves = [z[f"opt_{i}"] for i in range(int(z["n_opt"]))]
            treedef = jax.tree_util.tree_structure(opt_state_template)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            losses = [float(x) for x in z["losses"]]
        return int(step), arrays, camera, opt_state, losses


class Watchdog:
    """Detect a stalled training/render loop.

    The loop calls `beat()` once per step. A daemon thread checks the time
    since the last beat every `timeout / 4` seconds; past `timeout` it
    fires `on_stall(seconds_since_beat)` once. If `exit_code` is not None
    the process then hard-exits with it — the supervised-restart remedy for
    a collective wedged on a dead peer (nothing inside the process can
    unwedge it; a fast exit lets the job restart and resume from the last
    checkpoint). Use as a context manager to guarantee shutdown.
    """

    def __init__(
        self,
        timeout: float,
        on_stall: Optional[Callable[[float], None]] = None,
        exit_code: Optional[int] = None,
    ):
        self.timeout = float(timeout)
        self.on_stall = on_stall
        self.exit_code = exit_code
        self.stalled = False
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def beat(self) -> None:
        self._last = time.monotonic()

    def _run(self) -> None:
        while not self._stop.wait(min(self.timeout / 4.0, 1.0)):
            silent = time.monotonic() - self._last
            if silent > self.timeout:
                self.stalled = True
                if self.on_stall is not None:
                    self.on_stall(silent)
                else:  # pragma: no cover - default logging path
                    print(
                        f"[raymarch_tpu.Watchdog] no step progress for "
                        f"{silent:.1f}s (timeout {self.timeout}s) — peer "
                        "failure or wedged collective suspected",
                        flush=True,
                    )
                if self.exit_code is not None:  # pragma: no cover
                    os._exit(self.exit_code)
                return

    def __enter__(self) -> "Watchdog":
        self.beat()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)

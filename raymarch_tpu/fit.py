"""High-level inverse rendering: fit scene parameters to target images.

BASELINE config 3: "smooth-blend CSG scene with differentiable blend radii;
fit primitive params to a target image via pixel-loss gradients". Wraps the
distributed fit step (parallel.render.make_fit_step) with optimizer setup,
parameter masking, and a simple loop with per-step logging.

Gradient model: mode="implicit" (default) differentiates interior signal
only (implicit-function VJP at hit points + shading); mode="soft" adds
SILHOUETTE coverage gradients (ops.march.make_march_soft: closest-approach
alpha with an envelope-theorem VJP), which is what translation-/pose-
dominated fits need — see tests/test_soft_coverage.py. Either way, mask the
fit to the parameters you mean to move — adaptive optimizers otherwise
follow noise directions of untouched parameters.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from .config import DEFAULT_CONFIG, RenderConfig
from .ops.tape import TapeArrays, TapeSpec


@dataclasses.dataclass
class FitResult:
    arrays: TapeArrays
    camera: object
    losses: list
    steps_per_sec: float
    # Which backward implementation the fit trained through (and, when the
    # fast O(active) kernel was skipped, why) — make_fit_step.backward_info.
    backward_info: Optional[dict] = None


def fit_scene(
    spec: TapeSpec,
    arrays: TapeArrays,
    camera,
    target,
    *,
    width: int,
    height: int,
    cfg: RenderConfig = DEFAULT_CONFIG,
    steps: int = 100,
    learning_rate: float = 1e-2,
    optimizer=None,
    mesh=None,
    leaf_mask: Optional[np.ndarray] = None,
    op_mask: Optional[np.ndarray] = None,
    fit_camera: bool = False,
    camera_optimizer=None,
    mode: str = "implicit",
    backend: str = "jnp",
    log_every: int = 0,
    log_fn: Callable[[str], None] = print,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 25,
    resume: bool = True,
    stall_timeout: Optional[float] = None,
    stall_exit_code: Optional[int] = None,
) -> FitResult:
    """Gradient-descend scene parameters toward a target image.

    `leaf_mask` / `op_mask` (same shapes as the parameter arrays, 1.0 =
    trainable) restrict the fit; None trains everything of that group.
    `mesh=None` builds a mesh over all visible devices (single device = a
    1-mesh; the same code path scales to a pod slice).

    Elastic recovery (parallel.elastic): `checkpoint_dir` writes an atomic
    checkpoint of the full fit state every `checkpoint_every` steps; with
    `resume` (default) a restarted job continues from the latest one —
    crash/preemption costs at most `checkpoint_every` steps of work.
    `stall_timeout` arms a Watchdog on step progress: a step wedged longer
    than that (the signature of a dead peer blocking a collective) fires a
    loud report, and `stall_exit_code` upgrades it to a hard exit so a
    supervisor can relaunch the job into the resume path.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from .parallel import make_fit_step, make_mesh

    if mesh is None:
        mesh = make_mesh()
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    grad_mask = None
    if leaf_mask is not None or op_mask is not None:
        grad_mask = (
            np.ones_like(arrays.leaf_params) if leaf_mask is None else leaf_mask,
            np.ones_like(arrays.op_param) if op_mask is None else op_mask,
        )

    step = make_fit_step(
        spec,
        width,
        height,
        mesh,
        optimizer,
        cfg,
        mode=mode,
        backend=backend,
        fit_camera=fit_camera,
        camera_optimizer=camera_optimizer,
        grad_mask=grad_mask,
    )
    jstep = jax.jit(step)
    opt_state = step.init_opt_state(arrays, camera if fit_camera else None)
    target = jnp.asarray(target, jnp.float32)

    # Surface which backward this fit trains through (see
    # make_fit_step.backward_info): a smooth or painted scene can fall off
    # the O(active) kernel onto the O(n_leaves) legacy one, and that ~10x
    # cliff should be visible, not silent.
    bwd = getattr(step, "backward_info", None)
    if bwd is not None and log_every:
        msg = f"fit: backward = {bwd['kind']}"
        if bwd.get("reason"):
            msg += f" (fast path skipped: {bwd['reason']})"
        log_fn(msg)

    losses = []
    start = 0
    a, cam = arrays, camera
    ckpt = None
    if checkpoint_dir is not None:
        from .parallel.elastic import FitCheckpointer

        ckpt = FitCheckpointer(checkpoint_dir)
        if resume:
            restored = ckpt.restore(spec, opt_state)
            if restored is not None:
                start, a, cam, opt_state, losses = restored
                log_fn(f"fit: resumed from checkpoint at step {start}")

    from .parallel.elastic import Watchdog

    watchdog = (
        Watchdog(stall_timeout, exit_code=stall_exit_code)
        if stall_timeout is not None
        else None
    )

    def _loop():
        nonlocal a, cam, opt_state
        for i in range(start, steps):
            a, cam, opt_state, loss = jstep(a, cam, opt_state, target)
            losses.append(float(loss))  # device sync: the step completed
            if watchdog is not None:
                watchdog.beat()
            if log_every and (i % log_every == 0 or i == steps - 1):
                log_fn(f"fit step {i:4d}: loss {losses[-1]:.6f}")
            if ckpt is not None and (
                (i + 1) % max(1, checkpoint_every) == 0 or i == steps - 1
            ):
                ckpt.save(i + 1, spec, a, cam, opt_state, losses)

    t0 = time.perf_counter()
    if watchdog is not None:
        with watchdog:
            _loop()
    else:
        _loop()
    elapsed = time.perf_counter() - t0
    done = max(steps - start, 1)
    return FitResult(
        arrays=a,
        camera=cam,
        losses=losses,
        steps_per_sec=done / max(elapsed, 1e-9),
        backward_info=bwd,
    )

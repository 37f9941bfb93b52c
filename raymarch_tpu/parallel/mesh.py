"""Device mesh construction and multi-host initialization.

The reference has no distribution at all (SURVEY.md §2.3); this module is the
TPU-native scaling layer: a 1-D `Mesh` over the ray/tile axis ("rays"), with
XLA collectives over ICI/DCN doing all communication. The same program runs
on 1 chip, a host's 8 chips, or a multi-host pod slice — only the mesh
changes. Multi-host init is a thin wrapper over `jax.distributed.initialize`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the ray axis. `n_devices=None` uses all visible devices
    (across all hosts when jax.distributed is initialized)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"make_mesh: {n_devices} devices requested but only "
                    f"{len(devices)} visible ({devices[:2]}...). For local "
                    "testing force a virtual CPU mesh first: "
                    "jax.config.update('jax_platforms', 'cpu'); "
                    "jax.config.update('jax_num_cpu_devices', N)."
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    retries: int = 3,
    retry_delay: float = 5.0,
    initialization_timeout: Optional[float] = None,
) -> None:
    """Initialize cross-host JAX. On TPU pods with standard env vars every
    argument is auto-detected; arguments are for manual/CPU bring-up.

    Safe to call when already initialized (no-op) or single-process
    (RuntimeError from JAX is swallowed only for the no-cluster case).

    `retries`/`retry_delay` cover the common elastic-restart race: after a
    job relaunch the coordinator process may come up seconds after its
    workers, so worker-side handshake failures retry with a delay before
    surfacing. `initialization_timeout` (seconds) bounds each attempt where
    the installed JAX version supports it.
    """
    kwargs = {}
    if initialization_timeout is not None:
        import inspect

        sig = inspect.signature(jax.distributed.initialize)
        if "initialization_timeout" in sig.parameters:
            kwargs["initialization_timeout"] = int(initialization_timeout)
    last = None
    for attempt in range(max(1, retries)):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
            return
        except (RuntimeError, ValueError) as e:
            msg = str(e).lower()
            if "already" in msg or num_processes in (None, 1):
                return  # already initialized / no cluster to join
            last = e
            if attempt + 1 < max(1, retries):
                import time

                time.sleep(retry_delay)
    raise last

"""Persistent XLA compilation cache for the production paths.

The reference's headline interactivity property is that any edit is a buffer
write (reference README.md:7; renderer.rs:230-239) — the TPU-native analogue
is the tiered runtime (runtime.TieredRenderer): edits render instantly via
the dynamic interpreter while the static program compiles in the background.
That background compile costs seconds per NEW topology on a real chip, and
without a persistent cache every process restart pays it again for every
topology. JAX's compilation cache persists compiled executables keyed by HLO,
so revisited topologies — across restarts, not just within one process —
skip XLA entirely (a warm hit costs ~100 ms of deserialization instead of
tens of seconds; measured numbers in ARCHITECTURE.md).

The test suite configures the same cache for CPU (tests/conftest.py); this
module is the production entry point, called by TieredRenderer and
viewer.serve by default.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Configure JAX's persistent compilation cache.

    With `cache_dir=None`, respects an already-configured cache (user code,
    the test conftest) and otherwise defaults to
    `$RAYMARCH_TPU_CACHE_DIR` or `~/.cache/raymarch_tpu/xla`. An explicit
    `cache_dir` always wins. Returns the active cache directory (None only
    if directory creation failed — the cache is an optimization, never a
    hard requirement)."""
    import jax

    if cache_dir is None:
        current = jax.config.jax_compilation_cache_dir
        if current:
            return current
        cache_dir = os.environ.get("RAYMARCH_TPU_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "raymarch_tpu", "xla"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:  # pragma: no cover - unwritable home; run uncached
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Static-tier compiles are multi-second; cache everything that takes
    # over a second, with no entry-size floor (the tape programs are small).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir

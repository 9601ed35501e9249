"""Process-level runtime knobs: the persistent XLA compilation cache.

Compiles on this environment's TPU go through a remote tunnel at ~20-40 s
per jit shape (CLAUDE.md), and the tunnel-side cache churns on source edits,
so a "cold" end-to-end run pays several minutes of compiles. JAX's local
persistent compilation cache sidesteps the tunnel entirely: serialized
executables are stored on local disk keyed by a source-metadata-free HLO
hash (``jax_compilation_cache_include_metadata_in_key=False`` is the
default), so they survive both process restarts AND repo edits that don't
change the computation. Measured on the axon backend: a second process's
first call drops from full-compile cost to ~30 ms.

The reference has nothing comparable (it's a CPU/numpy pipeline); this is
TPU-production plumbing in the spirit of its pickle artifact memoization
(``01_make_dict_parallel.py:163-167``) applied to executables instead of
data.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a local directory.

    Idempotent; returns the cache directory. Every pipeline entry point
    (CLI, bench, driver entry) calls this before first device use. Override
    the location with ``EVC_XLA_CACHE_DIR``; set it to ``off`` to disable.
    """
    global _ENABLED
    cache = path or os.environ.get(
        "EVC_XLA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "exemplars_vc_tpu", "xla"),
    )
    if cache == "off":
        return cache
    if _ENABLED:
        return cache
    import jax

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache everything: tunnel round trips make even "fast" compiles slow,
    # and entries are small relative to the artifacts we already store
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # a corrupt/incompatible entry must degrade to a recompile, not an error
    jax.config.update("jax_raise_persistent_cache_errors", False)
    _ENABLED = True
    return cache

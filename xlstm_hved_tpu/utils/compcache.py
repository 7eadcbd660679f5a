"""Persistent XLA compilation cache (round-4 VERDICT #6).

The protocol orchestrator restarts training as bounded subprocess chunks
(relay host-RSS leak, scripts/full_scale_run.py::run_cli), and the driver's
bench / multi-chip dryrun run in fresh interpreters; without a persistent
cache every one of those pays the full XLA compile again (~10 min for the
128x192x128 train step on the relay chip, ~2 min for the CPU dryrun's
train step). One config line amortizes that across processes.

Call enable_persistent_cache() BEFORE the first jit execution. Safe to call
multiple times. The cache dir defaults to <repo>/.jax_cache (gitignored) and
can be overridden with XLSTM_HVED_JAX_CACHE=path or disabled with
XLSTM_HVED_JAX_CACHE=off.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir (or None
    when disabled). Caches every compile that takes >=1 s regardless of
    entry size — the train-step / sweep executables this repo cares about
    are all multi-second compiles."""
    import jax

    cache_dir = cache_dir or os.environ.get("XLSTM_HVED_JAX_CACHE") or _DEFAULT
    if cache_dir.lower() in ("off", "0", "none", "disabled"):
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

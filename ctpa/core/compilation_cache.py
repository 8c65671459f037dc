"""Persistent XLA compilation cache for serving/bench cold-start.

Full-scale ctpa programs (preproc+encode, 7B decode) cost minutes of XLA/
Mosaic compile on first execution — unacceptable for serving cold-start and
for on-chip CI (BENCH_r02 measured a 288 s compile+first).  JAX's persistent
compilation cache keys the compiled executable on the serialized HLO +
compile options + backend version, so a second process with an unchanged
program loads the binary in O(100 ms).

Call `enable_compilation_cache()` BEFORE the first jit execution (it is a
no-op if the config is already set).  Every ctpa CLI and bench script does.
"""

from __future__ import annotations

import os


DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    <repo>/.jax_cache, overridable via $CTPA_XLA_CACHE_DIR).  Returns the
    directory in use (empty string when disabled).

    DISABLED on the axon relay backend (override: CTPA_XLA_CACHE_ON_RELAY=1)
    for the same measured reason core/aot_cache.py disables executable blobs
    there: the relay keeps no cross-process executable cache, so a local
    cache HIT skips the local compile but pays a full REMOTE recompile at
    first execution — measured round 5: hit = 30.4 s load + 287.6 s first
    exec (318 s total) vs plain compile = ~45 s ready + 0.1 s first exec.
    On standard TPU hosts the deserialized executable IS the program and
    the cache stays on."""
    import jax

    if ("axon" in os.environ.get("JAX_PLATFORMS", "")
            and not os.environ.get("CTPA_XLA_CACHE_ON_RELAY")):
        return ""
    cache_dir = (cache_dir or os.environ.get("CTPA_XLA_CACHE_DIR")
                 or DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took >1s to compile, regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

"""Serialized-executable cache — cold-start elimination where JAX's
persistent compilation cache structurally cannot help.

On relay-style TPU backends (axon) the real compile happens REMOTELY at
first execution: `Lowered.compile()` returns in <1 s locally, so JAX's
persistent cache skips the entry ("took < 1.00 seconds to compile") while
the first execution still pays minutes of remote compilation
(docs/ROUND3_NOTES.md, compile-time investigation).  Persisting the
COMPILED executable via jax.experimental.serialize_executable sidesteps
that: the second process deserializes and loads the binary instead of
compiling at all.

Keys include the backend, device kind, device count, JAX version, and the
jaxpr-level signature (shapes/dtypes + a hash of the lowered StableHLO), so
a stale or foreign-topology blob can never be loaded.  Executables are
inherently device-specific; this cache is per-machine, like ~/.cache/jit.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


def _default_dir() -> str:
    return os.environ.get(
        "CTPA_AOT_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_aot_cache"))


def _key(name: str, lowered) -> str:
    dev = jax.devices()[0]
    sig = hashlib.sha256()
    sig.update(lowered.as_text().encode())
    sig.update(f"{jax.__version__}|{jax.default_backend()}|"
               f"{dev.device_kind}|{jax.device_count()}".encode())
    return f"{name}-{sig.hexdigest()[:16]}"


def load_or_compile(
    name: str,
    fn: Callable,
    *args: Any,
    cache_dir: Optional[str] = None,
    jit_kwargs: Optional[dict] = None,
    **kwargs: Any,
):
    """`jax.jit(fn, **jit_kwargs).lower(*args, **kwargs).compile()`, served
    from the serialized-executable cache when an entry matches.  Returns the
    loaded/compiled executable (callable with the same arg structure).

    Failures to serialize/deserialize (backends without executable
    serialization support) degrade silently to a plain compile — the cache
    is an optimization, never a correctness dependency."""
    cache_dir = cache_dir or _default_dir()
    lowered = jax.jit(fn, **(jit_kwargs or {})).lower(*args, **kwargs)
    path = os.path.join(cache_dir, _key(name, lowered) + ".bin")
    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                return se.deserialize_and_load(*pickle.load(f))
        except Exception:   # stale/foreign blob: fall through to compile
            pass
    compiled = lowered.compile()
    try:
        from jax.experimental import serialize_executable as se

        blob = se.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
    except Exception:       # backend can't serialize executables: still usable
        pass
    return compiled

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

The cache key deliberately does NOT lower the program: Mosaic lowering of
the pallas kernels in the shipped encode pipeline costs ~140 s (measured
round 4 — deserialize itself is 0.6 s), so a key derived from
`lowered.as_text()` would make every cache HIT pay the full lowering.
Instead the key hashes (name, arg shapes/dtypes/shardings, jit static
options, caller-provided `key_extra`, jax version, backend, device
kind/count) plus a CONTENT HASH OF THE ctpa SOURCE TREE — any code change
invalidates every entry, which errs on recompiling, never on staleness.

Caveat the source hash cannot cover: values CLOSED OVER by `fn` (configs,
constants baked into the trace).  Callers whose function captures
configuration must fold it into `key_extra` (bench.py passes the repr of
its config objects); two differently-configured closures under the same
name and key_extra WOULD collide.
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=1)
def _source_tree_hash() -> str:
    """Content hash of every .py/.cc file under the ctpa package (~ms)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith((".py", ".cc", ".h")):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, pkg_root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


def _leaf_sig(x) -> str:
    shape = tuple(getattr(x, "shape", ()))
    dtype = getattr(x, "dtype", type(x).__name__)
    sharding = getattr(x, "sharding", None)
    return f"{shape}/{dtype}/{sharding}"


def _key(name: str, args, kwargs, jit_kwargs, key_extra: str) -> str:
    dev = jax.devices()[0]
    sig = hashlib.sha256()
    leaves, treedef = jax.tree.flatten((args, kwargs))
    sig.update(str(treedef).encode())
    for leaf in leaves:
        sig.update(_leaf_sig(leaf).encode())
    sig.update(repr(sorted((jit_kwargs or {}).items(),
                           key=lambda kv: kv[0])).encode())
    sig.update(key_extra.encode())
    sig.update(_source_tree_hash().encode())
    sig.update(f"{jax.__version__}|{jax.default_backend()}|"
               f"{dev.device_kind}|{jax.device_count()}".encode())
    return f"{name}-{sig.hexdigest()[:16]}"


def load_or_compile(
    name: str,
    fn: Callable,
    *args: Any,
    cache_dir: Optional[str] = None,
    jit_kwargs: Optional[dict] = None,
    key_extra: str = "",
    **kwargs: Any,
):
    """`jax.jit(fn, **jit_kwargs).lower(*args, **kwargs).compile()`, served
    from the serialized-executable cache when an entry matches — WITHOUT
    tracing or lowering on a hit (see module docstring for the key).
    Returns the loaded/compiled executable (callable with the same arg
    structure).

    `key_extra` must capture any configuration `fn` closes over.

    Failures to serialize/deserialize (backends without executable
    serialization support, stale blobs) degrade silently to a plain
    compile — the cache is an optimization, never a correctness
    dependency.

    On the axon RELAY backend the cache is DISABLED by default (override
    with CTPA_AOT_CACHE_ON_RELAY=1): measured round 4 on chip, a local
    cache hit deserializes in 0.9 s but the relay recompiles remotely at
    first execution — 466.9 s, WORSE than the 227 s plain compile path
    (whose remote compile happens inside .compile() and apparently
    through a better-fed path).  The remote side keeps no cross-process
    executable cache, so the local blob saves only the ~140 s Mosaic
    lowering and then pays it back double at first exec.  On standard
    TPU hosts (no relay) deserialize_and_load IS the executable — the
    cache stays on."""
    cache_dir = cache_dir or _default_dir()
    if (jax.default_backend() == "axon"
            and not os.environ.get("CTPA_AOT_CACHE_ON_RELAY")):
        return jax.jit(fn, **(jit_kwargs or {})).lower(
            *args, **kwargs).compile()
    path = os.path.join(cache_dir,
                        _key(name, args, kwargs, jit_kwargs, key_extra)
                        + ".bin")
    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                return se.deserialize_and_load(*pickle.load(f))
        except Exception:   # stale/foreign blob: fall through to compile
            pass
    compiled = jax.jit(fn, **(jit_kwargs or {})).lower(
        *args, **kwargs).compile()
    try:
        from jax.experimental import serialize_executable as se

        blob = se.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
    except Exception:       # backend can't serialize executables: still usable
        pass
    return compiled

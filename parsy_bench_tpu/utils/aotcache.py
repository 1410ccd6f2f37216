"""AOT compiled-executable cache: warm starts skip tracing AND lowering.

The reference's contract is that the whole symbolic phase is cacheable
(orderings can be read back from disk, common/Util.h:187); in this
framework the XLA compile IS symbolic-phase work — the program shape is a
pure function of the plan — so the compiled executables are cached next
to the analysis artifact, keyed by a fingerprint of everything that
shapes the program (plan structure, pool shapes, executor source, dtype,
backend).  Measured motivation (RESULTS_r04): of the 72 s "warm" bench
compile at n = 110k, ~50 s was Python tracing + lowering and most of the
rest persistent-compile-cache key hashing — all of it skipped by
deserializing the serialized PJRT executable directly
(jax.experimental.serialize_executable; deserialize measured in
milliseconds through the axon tunnel).

Table VALUES never enter the fingerprint: all index tables are runtime
arguments of the cached programs, so one cached executable serves every
matrix with the same plan structure.
"""
from __future__ import annotations

import hashlib
import os
import pickle

import jax

#: bump to invalidate every cached executable (schema / semantics change)
CACHE_SCHEMA = 1


def source_hash(*fns) -> str:
    """Hash of the given functions' sources: editing the numeric code a
    cached program was traced from auto-invalidates its executables.
    Per-function (not per-file) so solve-path edits don't invalidate
    factorize executables and vice versa."""
    import inspect
    h = hashlib.sha256()
    for f in fns:
        h.update(inspect.getsource(f).encode())
    return h.hexdigest()[:16]


def backend_tag() -> tuple:
    d = jax.devices()[0]
    return (jax.__version__, d.platform,
            getattr(d, "device_kind", "?"), jax.device_count())


def fingerprint(*parts) -> str:
    h = hashlib.sha256()
    h.update(str(CACHE_SCHEMA).encode())
    h.update(pickle.dumps(backend_tag()))
    for p in parts:
        h.update(p if isinstance(p, bytes) else pickle.dumps(p))
    return h.hexdigest()[:32]


def load_or_compile(cache_dir: str | None, key: str, build,
                    devices=None):
    """Return a compiled executable for ``key``: deserialized from
    ``cache_dir`` when present, else ``build()`` (a thunk returning a
    ``jax.stages.Compiled``) with the result stored for next time.

    ``devices``: execution devices of the program (default: the first
    device — single-device programs; deserialize_and_load would otherwise
    spread the executable over EVERY addressable device and reject
    single-shard arguments on a multi-device host).

    Falls back silently to plain compilation when the backend does not
    support executable serialization or the cached blob is stale."""
    from jax.experimental import serialize_executable as se
    if devices is None:
        devices = [jax.devices()[0]]
    path = os.path.join(cache_dir, key + ".aot") if cache_dir else None
    if path and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            return se.deserialize_and_load(payload, in_tree, out_tree,
                                           execution_devices=devices)
        except Exception:
            pass  # corrupt / jax-version drift: recompile below
    compiled = build()
    if path:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            blob = pickle.dumps(se.serialize(compiled),
                                protocol=pickle.HIGHEST_PROTOCOL)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        except Exception:
            pass  # serialization unsupported on this backend
    return compiled

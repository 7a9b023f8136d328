"""Persistent traced-program cache (jax.export) for host-side cold starts.

The fused wave program (``solve_wave_multi``) costs seconds of pure Python
TRACING per process — the multi-anchor seed prologue's nested
vmap/jacfwd/scan trees dominate (measured: ~2/3 of the 3.7 s round-4 cold
demo solve; the rest is the XLA compile-cache load).  A serve loop's first
batch pays this on every process start.

This cache is the tracing analogue of the XLA compile cache: the first
process exports the traced+lowered program (StableHLO, jax.export) to
``~/.cache/arslam/export/`` keyed by (jax version, backend, shapes,
statics); later processes deserialize in ~6 ms and skip tracing entirely.
Any mismatch — version skew, shape drift, deserialization failure — falls
back to the normal jit path.

Set ``ARSLAM_EXPORT_CACHE=0`` to disable.
"""

from __future__ import annotations

import hashlib
import logging
import os

logger = logging.getLogger(__name__)

_MEM: dict[str, object] = {}


def cache_dir() -> str | None:
    if os.environ.get("ARSLAM_EXPORT_CACHE", "1") == "0":
        return None
    d = os.path.join(os.path.expanduser("~"), ".cache", "arslam", "export")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def _key(name: str, backend: str, args, statics_repr: str) -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(backend.encode())
    h.update(name.encode())
    for a in args:
        h.update(str((tuple(getattr(a, "shape", ())),
                      str(getattr(a, "dtype", type(a))))).encode())
    h.update(statics_repr.encode())
    return h.hexdigest()[:32]


def cached_exported(name: str, build_fn, example_args, statics_repr: str):
    """Return a callable for ``build_fn``'s jitted computation, restored
    from the export cache when possible.

    ``build_fn()`` must return a jit-wrapped function of exactly
    ``example_args`` (positional).  Returns None when caching is disabled
    or anything fails — the caller should then use its normal path.
    """
    import jax

    d = cache_dir()
    if d is None:
        return None
    try:
        from jax import export as jexport

        backend = jax.default_backend()
        # CPU is excluded: cross-process deserialize+call of a module with
        # lapack custom calls (linalg.inv/solve) SEGFAULTS on the XLA:CPU
        # backend of this jax version (reproduced with a 3-line program);
        # the TPU lowering round-trips fine and is where cold-start
        # latency matters.
        if backend == "cpu":
            return None
        key = _key(name, backend, example_args, statics_repr)
        if key in _MEM:
            return _MEM[key]
        path = os.path.join(d, f"{name}-{key}.bin")
        if os.path.exists(path):
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            call = exp.call
            _MEM[key] = call
            return call
        exp = jexport.export(build_fn())(*example_args)
        blob = exp.serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, path)
        call = exp.call
        _MEM[key] = call
        return call
    except Exception as e:  # noqa: BLE001 — always safe to fall back
        logger.debug("export cache miss/failure for %s: %s", name, e)
        return None

"""Accelerator backend: TPU routing for the batched integer kernels.

The encoder's hot data-parallel primitives (subpel interpolation, OBMC
blending, SAD sweeps, trial transforms) have bit-exact jax twins of
their numpy/native-C++ implementations.  When a real accelerator is
present, the host pipeline routes those batches through one jitted XLA
computation per (shape, config) — the integer arithmetic is identical,
so streams do not change; only where the arithmetic runs does.

Gates:
  DTPU_ACCEL_OPS=1  route the per-primitive host calls through the
                    accelerator (opt-in: pays on a directly-attached
                    TPU; over a high-latency tunnel the per-call
                    round trips cost more than the host compute —
                    measured ~30-180 ms per transfer here, so the
                    default host path stays faster for single frames).
  DTPU_DEVICE=0     never use the accelerator.
  DTPU_DEVICE=1     allow the jax backend even on CPU (route testing).

The chunked whole-pipeline device paths (pipeline/device*.py) are NOT
gated by DTPU_ACCEL_OPS: they batch frames per dispatch, which is the
design that amortizes any link.
"""

from __future__ import annotations

import os

__all__ = ["accel", "put"]

_DEV = None
_PID = None


def accel():
    """The accelerator jax device, or None when unavailable/disabled.

    Forked workers (GOP/tile parallel encoders) must not reuse the
    parent's device client, so the cached device is pid-scoped: in a
    child process this returns None and the bit-exact host twins run
    instead."""
    global _DEV, _PID
    pid = os.getpid()
    if _DEV is not None:
        return (_DEV or None) if pid == _PID else None
    if (os.environ.get("DTPU_DEVICE") == "0"
            or not os.environ.get("DTPU_ACCEL_OPS")):
        _DEV = False
        return None
    try:
        import jax

        dev = jax.devices()[0]
        if dev.platform == "cpu" and os.environ.get("DTPU_DEVICE") != "1":
            _DEV = False
            return None
        _DEV = dev
        _PID = pid
        return dev
    except Exception:
        _DEV = False
        return None


_CACHE = {}


def put(a):
    """Device residency cache for read-only host arrays (reference
    planes): repeated kernels on the same frame transfer it once.  The
    cache entry dies with the exact host array object, so in-place
    mutation of a cached array must not happen (callers pass freshly
    padded, never-mutated planes)."""
    dev = accel()
    if dev is None:
        return a
    key = id(a)
    ent = _CACHE.get(key)
    if ent is not None:
        return ent
    import weakref

    import jax

    da = jax.device_put(a, dev)
    _CACHE[key] = da
    try:
        weakref.finalize(a, _CACHE.pop, key, None)
    except TypeError:
        pass  # not weakref-able: cache until process end
    return da

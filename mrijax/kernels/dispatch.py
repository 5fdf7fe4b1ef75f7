"""Global Pallas-kernel dispatch switch.

Auto-dispatch ("use the Pallas kernel when the backend is TPU") consults
``jax.default_backend()``, which is a *process-global* fact — it stays "tpu"
even while computation is deliberately placed on host CPU (e.g. flax
``model.init`` under ``jax.default_device(cpu)``, the cheap-init trick for
136M-param models behind a slow device tunnel). Running a Pallas TPU kernel
on CPU is an error, so CPU-placed regions must disable Pallas explicitly:

    with disable_pallas():
        params = model.init(...)

``pallas_enabled()`` is the single predicate every auto-dispatching op
(fused GroupNorm+SiLU, flash attention) consults.

Semantics to keep in mind:

* The predicate is consulted at TRACE time: the choice is baked into the
  jitted executable and cached per (avals, device). Don't warm a jit cache
  entry under ``disable_pallas()`` with the same input avals/devices the
  hot path will use, or the XLA fallback gets cached for it. (Cross-backend
  init — CPU-committed inputs — produces a different cache entry, so the
  standard init-on-CPU flow is safe.)
* The switch is PROCESS-global, not per-thread: tracing triggered from a
  worker thread (e.g. BatchLoader prefetch materializing a transform) sees
  the same state as the main thread.
"""

import threading
import warnings
from contextlib import contextmanager

import jax

_lock = threading.Lock()
_disabled = 0
_disabling_threads: dict = {}  # thread ident -> reentry count
_warned_cross_thread = False


def pallas_enabled() -> bool:
    global _warned_cross_thread
    if _disabled > 0:
        # Guard for the process-global flag's one hazard: a DIFFERENT thread
        # tracing a TPU-destined executable during this window would bake
        # the XLA fallback into the TPU jit cache for those avals. Warn once
        # so a mis-scheduled warmup is diagnosable instead of silently slow.
        if (
            not _warned_cross_thread
            and threading.get_ident() not in _disabling_threads
            and jax.default_backend() == "tpu"
        ):
            _warned_cross_thread = True
            warnings.warn(
                "pallas_enabled() consulted from a thread that did not enter "
                "disable_pallas() while a disable window is active on a TPU "
                "backend — if this trace targets the TPU, the XLA fallback "
                "will be cached for its avals. Warm hot-path executables "
                "outside disable_pallas() windows.",
                RuntimeWarning,
                stacklevel=3,
            )
        return False
    return jax.default_backend() == "tpu"


@contextmanager
def disable_pallas():
    global _disabled
    ident = threading.get_ident()
    with _lock:
        _disabled += 1
        _disabling_threads[ident] = _disabling_threads.get(ident, 0) + 1
    try:
        yield
    finally:
        # remove THIS thread's claim when its own (possibly nested) windows
        # close — keeping stale idents around until the global count hit 0
        # would suppress the cross-thread warning for exactly the thread
        # the guard exists to catch
        with _lock:
            _disabled -= 1
            n = _disabling_threads.get(ident, 1) - 1
            if n:
                _disabling_threads[ident] = n
            else:
                _disabling_threads.pop(ident, None)


@contextmanager
def host_init():
    """CPU-pinned, Pallas-free window for flax ``model.init``.

    flax ``init`` EXECUTES the forward pass, so initializing a large model
    on a TPU-tunnel backend would (a) run the whole network through the
    slow tunnel and (b) auto-dispatch Pallas TPU kernels that then get
    lowered for the pinned CPU device and crash. Every template/param init
    in the package goes through this one window so the invariant is
    structural, not a per-call-site convention:

        with host_init():
            params = model.init(key, *dummy_args)
        params = jax.device_put(params, ...)   # then place for real

    Uses ``jax.local_devices(backend="cpu")`` (not ``jax.devices``): in a
    multi-process job process 0's CPU is non-addressable from other ranks —
    a real-process crash pinned by ``tests/test_multiprocess_dcn.py``.
    """
    with jax.default_device(
        jax.local_devices(backend="cpu")[0]
    ), disable_pallas():
        yield

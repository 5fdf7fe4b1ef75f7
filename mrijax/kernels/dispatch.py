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
"""

import threading
from contextlib import contextmanager

import jax

_state = threading.local()


def pallas_enabled() -> bool:
    if getattr(_state, "disabled", 0) > 0:
        return False
    return jax.default_backend() == "tpu"


@contextmanager
def disable_pallas():
    _state.disabled = getattr(_state, "disabled", 0) + 1
    try:
        yield
    finally:
        _state.disabled -= 1

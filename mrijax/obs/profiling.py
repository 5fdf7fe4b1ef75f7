"""Profiler integration: jax.profiler traces + named step annotations.

The reference's tracing story is Perun sampling + nvidia-smi side-logs
(SURVEY.md §5); the TPU-native equivalent is XLA's own profiler: traces
capture per-op device time, HBM traffic, and host↔device transfers, viewable
in TensorBoard/Perfetto (`tensorboard --logdir <dir>`).

Usage:
    with trace("profiles/run1"):
        for step in range(10):
            with step_annotation("train_step", step):
                state, loss = train_step(state, batch, key)
"""

from contextlib import contextmanager
from pathlib import Path

import jax


@contextmanager
def trace(log_dir, *, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed region."""
    log_dir = str(Path(log_dir))
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def step_annotation(name: str, step: int = 0):
    """Label a region so it shows up as a named span in the trace."""
    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield


def annotate(name: str):
    """Function decorator adding a named trace span."""
    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco

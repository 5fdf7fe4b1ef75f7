"""Step timing and device memory telemetry.

Replaces the reference's ad-hoc steps/s prints (`model.py:180-192`) and
``torch.cuda.max_memory_allocated`` probes (`train.py:285-287`) with a timer
that understands async dispatch (block_until_ready before reading the clock)
and TPU memory stats from the device API.
"""

import threading
import time
from typing import Dict, Optional

import jax

# Process-wide accumulated device-busy wall time (every timed step adds its
# duration). EnergyMonitor snapshots this to derive an honest busy/idle
# fraction for its measurement window (helpers/perun_utils.py:39-66 analog)
# without chip power telemetry.
_BUSY_LOCK = threading.Lock()
_BUSY_TOTAL_S = 0.0


def add_busy_seconds(dt: float) -> None:
    global _BUSY_TOTAL_S
    with _BUSY_LOCK:
        _BUSY_TOTAL_S += dt


def busy_seconds() -> float:
    with _BUSY_LOCK:
        return _BUSY_TOTAL_S


class StepTimer:
    """Accumulates step wall-times without forcing a device sync.

    Async-dispatch-honest usage (the trainer's): ``start()``/``stop()``
    around each dispatch, then ``finalize()`` AFTER a value readback has
    forced all queued steps to complete — it stretches the accumulated
    time to the true first-dispatch→completion wall, so ``steps_per_s``
    measures device execution rather than dispatch. (A per-step
    ``block_until_ready`` would serialize host and device — and does not
    reliably block through the axon TPU tunnel anyway.) ``stop(block_on=x)``
    remains available for synchronous micro-timing."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.num_steps = 0
        self.total_s = 0.0
        self._t0 = None
        self._first = None

    def start(self):
        self._t0 = time.perf_counter()
        if self._first is None:
            self._first = self._t0

    def stop(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.num_steps += 1
        self.total_s += dt
        add_busy_seconds(dt)
        return dt

    def finalize(self):
        """Call after the timed work's results have been READ BACK (the
        reliable completion signal on the axon tunnel): extends the
        accumulated time to cover device work that was still in flight
        when the per-step ``stop()`` calls returned."""
        if self._first is None:
            return
        wall = time.perf_counter() - self._first
        if wall > self.total_s:
            add_busy_seconds(wall - self.total_s)
            self.total_s = wall

    @property
    def steps_per_s(self) -> float:
        return self.num_steps / max(self.total_s, 1e-8)


def device_memory_stats(device=None) -> Dict[str, float]:
    """Peak/current device memory in GiB (TPU analog of the reference's
    peak-GPU-memory prints)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    gib = 1024 ** 3
    return {
        "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
    }

"""Pluggable energy/power accounting (the Perun-bridge equivalent).

The reference wraps its train function in the Perun profiler and walks the
resulting data tree into MLflow metrics — energy (J/kWh), runtime, CO₂, cost,
average power, GPU utilization and idle-fraction
(`helpers/perun_utils.py:17-148`, `.perun.ini`). TPUs expose no NVML; this
module keeps the accounting *interface* and derives the same report from a
pluggable sensor:

* ``NullEnergySensor``   — runtime only (default; honest zeros for power).
* ``ConstantPowerSensor``— energy = assumed chip TDP × runtime (documented
  estimate, useful for cost/CO₂ budgeting).

The idle-fraction is NOT derived from the (possibly constant) power samples:
it comes from the trainer's own step timing — every ``StepTimer.stop`` adds
its measured step duration to a process-wide busy counter
(``mrijax.obs.timing.busy_seconds``), and the monitor reports
``1 − busy/runtime`` over its window. This measures real device-busy time
(steps block on results); untimed device work (validation, sampling) counts
as idle, so the figure is a lower bound on utilization. Chip POWER remains
an estimate until TPU power telemetry is exposed — the busy fraction is the
honest part of the report.

Samples are polled on a background thread at ``interval_s`` (Perun's 1 s
default), and the summary mirrors the reference's metric names.
"""

import threading
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional


class NullEnergySensor:
    """No power telemetry available — reports zeros."""

    def read_power_w(self) -> float:
        return 0.0


@dataclass
class ConstantPowerSensor:
    """Assume a constant average chip power draw (e.g. ~170 W for v5e)."""

    power_w: float = 170.0

    def read_power_w(self) -> float:
        return self.power_w


class EnergyMonitor:
    """Samples a sensor on a background thread and produces a Perun-style
    summary (energy J/kWh, CO₂ kg, cost €, average power)."""

    def __init__(
        self,
        sensor=None,
        interval_s: float = 1.0,
        emissions_g_per_kwh: float = 230.0,  # .perun.ini:  emissions factor
        price_per_kwh: float = 0.2678,       # .perun.ini:  energy price
    ):
        self.sensor = sensor or NullEnergySensor()
        self.interval_s = interval_s
        self.emissions_g_per_kwh = emissions_g_per_kwh
        self.price_per_kwh = price_per_kwh
        self._samples = []
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._t_start = None
        self._t_stop = None

    def _loop(self):
        while self._running:
            self._samples.append(self.sensor.read_power_w())
            time.sleep(self.interval_s)

    def start(self):
        from mrijax.obs.timing import busy_seconds

        self._t_start = time.time()
        self._busy0 = busy_seconds()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> Dict[str, float]:
        self._running = False
        self._t_stop = time.time()
        if self._thread:
            self._thread.join(timeout=2 * self.interval_s)
        return self.summary()

    def summary(self) -> Dict[str, float]:
        from mrijax.obs.timing import busy_seconds

        runtime_s = (self._t_stop or time.time()) - (self._t_start or time.time())
        avg_power_w = (
            sum(self._samples) / len(self._samples) if self._samples else 0.0
        )
        energy_j = avg_power_w * runtime_s
        energy_kwh = energy_j / 3.6e6
        # busy/idle from measured step time in this window, not from the
        # (degenerate) power samples — see module docstring
        busy_s = max(busy_seconds() - getattr(self, "_busy0", 0.0), 0.0)
        idle = max(0.0, 1.0 - busy_s / runtime_s) if runtime_s > 0 else 1.0
        return {
            "runtime_s": runtime_s,
            "avg_power_w": avg_power_w,
            "energy_joules": energy_j,
            "energy_kwh": energy_kwh,
            "co2_kg": energy_kwh * self.emissions_g_per_kwh / 1000.0,
            "cost_eur": energy_kwh * self.price_per_kwh,
            "device_busy_s": busy_s,
            "device_idle_fraction": idle,
        }


def run_with_energy(fn: Callable, logger=None, sensor=None, prefix: str = "energy"):
    """Run ``fn()`` under an EnergyMonitor and log the summary — the
    equivalent of ``run_with_perun(fn, data_out=...)``
    (`helpers/perun_utils.py:132-148`)."""
    mon = EnergyMonitor(sensor=sensor)
    mon.start()
    try:
        result = fn()
    finally:
        summary = mon.stop()
        if logger is not None:
            for k, v in summary.items():
                logger.log_metric(f"{prefix}_{k}", v)
        else:
            print(f"[EnergyMonitor] {summary}")
    return result

"""Observability: metrics logging, signals, timing, energy accounting."""

from mrijax.obs.logger import MetricsLogger, NullLogger
from mrijax.obs.signals import install_signal_handlers, should_terminate, reset_termination
from mrijax.obs.timing import StepTimer, device_memory_stats
from mrijax.obs.energy import EnergyMonitor, NullEnergySensor, run_with_energy
from mrijax.obs.analyze import analyze_run, format_report
from mrijax.obs.profiling import trace, step_annotation, annotate

__all__ = [
    "MetricsLogger",
    "NullLogger",
    "install_signal_handlers",
    "should_terminate",
    "reset_termination",
    "StepTimer",
    "device_memory_stats",
    "EnergyMonitor",
    "NullEnergySensor",
    "run_with_energy",
    "analyze_run",
    "format_report",
    "trace",
    "step_annotation",
    "annotate",
]

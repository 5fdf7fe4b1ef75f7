"""Preemption-graceful shutdown via POSIX signals.

Parity with `model_scripts/helpers/signals.py:1-23`: SLURM sends SIGUSR1
600 s before the time limit (`training_job.sh:7 --signal=SIGUSR1@600`) and
SIGTERM on scancel; handlers set a module flag that trainers poll between
epochs (and, unlike the reference where the inner-step checks are commented
out, our epoch drivers also poll between steps) so checkpoints/metrics
finalize cleanly before the kill.
"""

import signal

_terminate_requested = False


def _handler(signum, frame):  # pragma: no cover - signal path
    global _terminate_requested
    _terminate_requested = True
    print(f"[mrijax.obs.signals] Received signal {signum}; "
          "will stop at the next safe point.")


def install_signal_handlers(signals=(signal.SIGUSR1, signal.SIGTERM)) -> None:
    for s in signals:
        try:
            signal.signal(s, _handler)
        except (ValueError, OSError):  # non-main thread / unsupported
            pass


def should_terminate() -> bool:
    return _terminate_requested


def reset_termination() -> None:
    global _terminate_requested
    _terminate_requested = False

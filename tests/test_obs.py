"""Observability tests: metrics logger, run analyzer, energy monitor,
multi-model eval harness."""

import json

import numpy as np
import pytest

from mrijax.obs import (
    EnergyMonitor,
    MetricsLogger,
    analyze_run,
    format_report,
)
from mrijax.obs.energy import ConstantPowerSensor


def test_metrics_logger_roundtrip(tmp_path):
    log = MetricsLogger("exp", run_name="r1", root=str(tmp_path), use_mlflow=False)
    log.log_params({"lr": 1e-3, "bs": 8})
    for e in range(3):
        log.log_metric("train_loss", 1.0 / (e + 1), step=e)
        log.log_metric("steps_per_s", 10.0 + e, step=e)
        log.log_metric("epoch_time_s", 5.0, step=e)
        log.log_metric("peak_mem_gib", 1.5, step=e)
    log.set_tags({"family": "test"})
    log.finish()

    run_dir = tmp_path / "exp" / "r1"
    assert json.loads((run_dir / "params.json").read_text())["bs"] == 8
    recs = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(recs) == 12


def test_analyze_run(tmp_path):
    log = MetricsLogger("exp", run_name="r2", root=str(tmp_path), use_mlflow=False)
    for e in range(4):
        log.log_metric("train_loss", 2.0 - 0.3 * e, step=e)
        log.log_metric("steps_per_s", 8.0 + e, step=e)
        log.log_metric("epoch_time_s", 10.0, step=e)
        log.log_metric("peak_mem_gib", 2.0 + 0.1 * e, step=e)
    log.finish()
    report = analyze_run(tmp_path / "exp" / "r2")
    assert report["train"]["epochs"] == 4
    assert report["train"]["steps_per_s_mean"] == pytest.approx(9.5)
    assert report["train"]["epoch_time_s_total"] == pytest.approx(40.0)
    assert report["train"]["train_loss_last"] == pytest.approx(1.1)
    text = format_report(report)
    assert "steps_per_s_mean" in text
    with pytest.raises(FileNotFoundError):
        analyze_run(tmp_path / "nope")


def test_energy_monitor_constant_sensor():
    import time

    mon = EnergyMonitor(sensor=ConstantPowerSensor(power_w=100.0), interval_s=0.05)
    mon.start()
    time.sleep(0.3)
    summary = mon.stop()
    assert summary["avg_power_w"] == pytest.approx(100.0)
    assert summary["energy_joules"] > 0
    assert summary["runtime_s"] >= 0.25


def test_multi_eval_records_errors(tmp_path):
    from mrijax.evals import FeatureExtractor, evaluate_runs

    # nonexistent run dir -> recorded error, no crash; summary written
    summary = evaluate_runs(
        [{"run_dir": str(tmp_path / "missing"), "name": "gone"}],
        tmp_path / "evalout",
        feature_extractor=FeatureExtractor(image_size=32, widths=(4,)),
        progress=False,
    )
    assert "error" in summary["gone"]
    assert (tmp_path / "evalout" / "summary.json").exists()
    assert (tmp_path / "evalout" / "gone_ERROR.txt").exists()


def test_energy_monitor_busy_fraction_from_step_timing():
    """Idle fraction derives from StepTimer-measured busy time, not from the
    degenerate power samples (Null sensor used to report idle=1.0 always,
    Constant sensor idle=0.0 always)."""
    import time as _time

    from mrijax.obs.energy import ConstantPowerSensor, EnergyMonitor
    from mrijax.obs.timing import StepTimer

    mon = EnergyMonitor(sensor=ConstantPowerSensor(100.0), interval_s=0.05)
    mon.start()
    timer = StepTimer()
    t_all = _time.time()
    # ~60% busy window
    for _ in range(3):
        timer.start()
        _time.sleep(0.06)
        timer.stop()
        _time.sleep(0.04)
    summary = mon.stop()
    assert summary["device_busy_s"] > 0.15
    assert 0.0 < summary["device_idle_fraction"] < 0.8
    assert summary["avg_power_w"] == 100.0

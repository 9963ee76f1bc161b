"""Loggers: file tracker, fan-out, status, tqdm mirroring, banner, monitors."""

import json
import logging
import time

from human_pose_tpu.loggers import (
    FileTrackerLogger,
    Loggers,
    Status,
    SystemMetricsMonitor,
    TerminalLogger,
    TpuInfoMonitor,
    collect_sample,
    get_pylogger,
    log_breaking_point,
    logged_tqdm,
)


def test_file_tracker_metrics_and_status(tmp_path):
    lg = FileTrackerLogger(tmp_path, "exp", "run")
    lg.log_metrics({"loss": 1.5}, step=1, split="train")
    lg.log_metrics({"loss": 1.2}, step=2, split="train")
    lg.log_params({"lr": 0.1})
    lg.finalize(Status.FINISHED)
    lines = (tmp_path / "tracker" / "metrics_train.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.2
    run = json.loads((tmp_path / "tracker" / "run.json").read_text())
    assert run["status"] == "FINISHED"
    assert (tmp_path / "tracker" / "params.yaml").exists()
    # run-dir layout (reference loggers.py:72-81)
    for d in ("checkpoints", "logs", "model", "eval_examples", "data_examples"):
        assert (tmp_path / d).is_dir()


def test_fanout_and_state(tmp_path):
    fan = Loggers([TerminalLogger(tmp_path), FileTrackerLogger(tmp_path)], tmp_path)
    fan.log_metrics({"a": 1.0}, 0, "val")
    state = fan.state_dict()
    assert len(state["run_ids"]) == 2
    fan.load_state_dict(state)
    fan.finalize(Status.KILLED)


def test_logged_tqdm_and_banner(caplog):
    logger = get_pylogger("test_lt")
    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="test_lt"):
        total = 0
        for x in logged_tqdm(range(5), logger=logger, every_n=2, disable=True):
            total += x
        assert total == 10
    log_breaking_point("PHASE", logger=logger)


def test_system_monitor_samples():
    sample = collect_sample()
    assert "cpu_percent" in sample and "memory_percent" in sample
    mon = SystemMetricsMonitor(interval_s=0.05)
    mon.start()
    time.sleep(0.2)
    mon.stop()
    assert len(mon.storage.samples) >= 1


def test_tpu_info_monitor(tmp_path):
    mon = TpuInfoMonitor(str(tmp_path / "tpu.log"), interval_s=0.05)
    mon.start()
    time.sleep(0.2)
    mon.stop()
    assert (tmp_path / "tpu.log").exists()

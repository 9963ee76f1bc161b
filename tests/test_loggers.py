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


def test_html_metric_plots(tmp_path):
    """Self-contained interactive HTML plots (plotly-equivalent,
    reference src/base/visualization.py:45-127)."""
    from human_pose_tpu.train.html_plots import (
        plot_metrics_html,
        plot_system_monitoring_html,
    )
    from human_pose_tpu.train.storage import MetricsStorage, SystemMonitoringStorage

    storage = MetricsStorage("metrics")
    for epoch in range(5):
        storage.append({"loss": 1.0 / (epoch + 1), "AP": 0.1 * epoch}, epoch, epoch, "train")
        storage.append({"loss": 1.2 / (epoch + 1)}, epoch, epoch, "val")
        storage.append({"loss": 9.9}, epoch, epoch, "sanity_check")  # excluded
    path = tmp_path / "metrics.html"
    plot_metrics_html(storage, path)
    doc = path.read_text()
    assert "<svg" in doc and "<script>" in doc  # charts + interactivity inline
    assert "http" not in doc.split("<title")[0]  # no external assets
    assert "loss" in doc and "AP" in doc and "val" in doc
    assert "sanity" not in doc

    mon = SystemMonitoringStorage()
    for i in range(4):
        mon.append({"timestamp": 100.0 + i, "cpu_percent": 10.0 * i})
    mpath = tmp_path / "system.html"
    plot_system_monitoring_html(mon, mpath)
    assert "cpu_percent" in mpath.read_text()

    # empty storage writes nothing rather than a blank page
    plot_metrics_html(MetricsStorage(), tmp_path / "empty.html")
    assert not (tmp_path / "empty.html").exists()


def test_mlflow_file_logger(tmp_path):
    """MlflowFileLogger writes the MLflow FileStore layout (reference
    MLFlowLogger, src/logger/loggers.py:231-371)."""
    from human_pose_tpu.loggers import MlflowFileLogger

    lg = MlflowFileLogger(tmp_path / "run", "pose-exp", "run-a", resume=True)
    lg.log_metrics({"loss": 0.5, "AP": 0.1}, step=0, split="train")
    lg.log_metrics({"loss": 0.4}, step=1, split="train")
    lg.log_params({"setup": {"seed": 42}, "lr": 1e-3})
    art = tmp_path / "plot.jpg"
    art.write_bytes(b"jpg")
    lg.log_artifact(art)
    lg.finalize(Status.FINISHED)

    store = tmp_path / "run" / "mlruns"
    exp_dirs = [d for d in store.iterdir() if d.is_dir() and d.name.isdigit()]
    assert len(exp_dirs) == 1
    assert "name: pose-exp" in (exp_dirs[0] / "meta.yaml").read_text()
    run_dir = store / exp_dirs[0].name / lg.run_id
    # metric wire format: "ts_ms value step" lines
    lines = (run_dir / "metrics" / "train_loss").read_text().splitlines()
    assert len(lines) == 2
    ts, value, step = lines[1].split()
    assert float(value) == 0.4 and step == "1"
    assert (run_dir / "params" / "setup.seed").read_text() == "42"
    assert (run_dir / "artifacts" / "plot.jpg").exists()
    meta = (run_dir / "meta.yaml").read_text()
    assert "status: 3" in meta  # FINISHED
    assert (run_dir / "tags" / "mlflow.runName").read_text() == "run-a"

    # finalize() must keep start_time as an int (FileStore sorts runs by it;
    # an empty value breaks `mlflow ui` run listing) and set an int end_time
    start_line = next(l for l in meta.splitlines() if l.startswith("start_time:"))
    end_line = next(l for l in meta.splitlines() if l.startswith("end_time:"))
    assert start_line.split(":", 1)[1].strip().isdigit()
    assert end_line.split(":", 1)[1].strip().isdigit()
    assert int(end_line.split(":")[1]) >= int(start_line.split(":")[1])

    # resume-by-run-name reattaches to the same run (reference loggers.py:296)
    # and keeps the original start_time (mlflow resume semantics)
    lg2 = MlflowFileLogger(tmp_path / "run", "pose-exp", "run-a", resume=True)
    assert lg2.run_id == lg.run_id
    assert lg2.start_time_ms == int(start_line.split(":")[1])
    # a different run name under the same experiment gets a new run
    lg3 = MlflowFileLogger(tmp_path / "run", "pose-exp", "run-b")
    assert lg3.run_id != lg.run_id
    assert lg3.run_dir.parent == run_dir.parent

    # experiment matching is exact-name, not substring: "pose" must NOT
    # reattach to the existing "pose-exp" (whose meta contains "name: pose-exp")
    lg4 = MlflowFileLogger(tmp_path / "run", "pose", "run-c")
    assert lg4.experiment_id != lg.experiment_id
    # while the exact name still reattaches
    lg5 = MlflowFileLogger(tmp_path / "run", "pose-exp", "run-d")
    assert lg5.experiment_id == lg.experiment_id

"""Experiment tracking loggers.

Counterpart of reference src/logger/loggers.py: a rank-0-gated ``Loggers``
fan-out over backends, each creating the run directory layout
``checkpoints/ logs/ model/ eval_examples/ data_examples/`` and logging
metrics/params/artifacts with a terminal Status (FINISHED/FAILED/KILLED).

Backends:
* ``TerminalLogger`` — local-only (reference loggers.py:212-225)
* ``FileTrackerLogger`` — an MLFlow-equivalent local tracker: params yaml,
  metrics jsonl per split, artifact copies under ``tracker/`` (the reference's
  MLFlow server is an external service; this keeps the same information on
  disk; a real MLFlow backend can be slotted in when the package exists)
"""

from __future__ import annotations

import enum
import json
import shutil
import time
from pathlib import Path

from ..utils.files import save_yaml
from ..utils.utils import is_main_process
from .pylogger import log


class Status(str, enum.Enum):
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    FAILED = "FAILED"
    KILLED = "KILLED"


class BaseLogger:
    def __init__(self, log_path: str | Path, experiment_name: str = "exp", run_name: str = "run"):
        self.log_path = Path(log_path)
        self.experiment_name = experiment_name
        self.run_name = run_name
        self.ckpt_dir = self.log_path / "checkpoints"
        self.logs_dir = self.log_path / "logs"
        self.model_dir = self.log_path / "model"
        self.eval_examples_dir = self.log_path / "eval_examples"
        self.data_examples_dir = self.log_path / "data_examples"
        for d in (
            self.ckpt_dir,
            self.logs_dir,
            self.model_dir,
            self.eval_examples_dir,
            self.data_examples_dir,
        ):
            d.mkdir(parents=True, exist_ok=True)

    def log_metrics(self, metrics: dict, step: int, split: str = "train") -> None:
        pass

    def log_params(self, params: dict) -> None:
        pass

    def log_config(self, cfg_dict: dict) -> None:
        save_yaml(cfg_dict, self.log_path / "config.yaml")

    def log_artifact(self, path: str | Path, dst_subdir: str = "") -> None:
        pass

    def finalize(self, status: Status) -> None:
        pass

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


class TerminalLogger(BaseLogger):
    def log_metrics(self, metrics: dict, step: int, split: str = "train") -> None:
        parts = ", ".join(f"{k}={v:.5g}" for k, v in metrics.items())
        log.info(f"[{split} @ step {step}] {parts}")

    def finalize(self, status: Status) -> None:
        log.info(f"run finalized with status {status.value}")


class FileTrackerLogger(BaseLogger):
    """Local tracker with the information content of the reference's MLFlow
    backend (metrics/params/artifacts/status per run)."""

    def __init__(self, log_path, experiment_name="exp", run_name="run", run_id: str | None = None):
        super().__init__(log_path, experiment_name, run_name)
        self.tracker_dir = self.log_path / "tracker"
        self.tracker_dir.mkdir(parents=True, exist_ok=True)
        self.run_id = run_id or f"{experiment_name}-{run_name}-{int(time.time())}"
        self._metrics_files: dict[str, object] = {}
        (self.tracker_dir / "run.json").write_text(
            json.dumps({"run_id": self.run_id, "status": Status.RUNNING.value})
        )

    def log_metrics(self, metrics: dict, step: int, split: str = "train") -> None:
        f = self._metrics_files.get(split)
        if f is None:
            f = open(self.tracker_dir / f"metrics_{split}.jsonl", "a")
            self._metrics_files[split] = f
        f.write(json.dumps({"step": int(step), "ts": time.time(), **{k: float(v) for k, v in metrics.items()}}) + "\n")
        f.flush()

    def log_params(self, params: dict) -> None:
        save_yaml(params, self.tracker_dir / "params.yaml")

    def log_artifact(self, path: str | Path, dst_subdir: str = "") -> None:
        src = Path(path)
        if not src.exists():
            return
        dst = self.tracker_dir / "artifacts" / dst_subdir
        dst.mkdir(parents=True, exist_ok=True)
        if src.is_dir():
            shutil.copytree(src, dst / src.name, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst / src.name)

    def finalize(self, status: Status) -> None:
        (self.tracker_dir / "run.json").write_text(
            json.dumps({"run_id": self.run_id, "status": status.value})
        )
        for f in self._metrics_files.values():
            f.close()
        self._metrics_files.clear()

    def state_dict(self) -> dict:
        return {"run_id": self.run_id}

    def load_state_dict(self, state: dict) -> None:
        self.run_id = state.get("run_id", self.run_id)


class Loggers:
    """Rank-0-gated fan-out (reference loggers.py:152-209)."""

    def __init__(self, loggers: list[BaseLogger], log_path: str | Path):
        self.loggers = loggers if is_main_process() else []
        self.log_path = Path(log_path)

    def log_metrics(self, metrics: dict, step: int, split: str = "train") -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step, split)

    def log_params(self, params: dict) -> None:
        for lg in self.loggers:
            lg.log_params(params)

    def log_config(self, cfg_dict: dict) -> None:
        for lg in self.loggers:
            lg.log_config(cfg_dict)

    def log_artifact(self, path, dst_subdir: str = "") -> None:
        for lg in self.loggers:
            lg.log_artifact(path, dst_subdir)

    def finalize(self, status: Status) -> None:
        for lg in self.loggers:
            lg.finalize(status)

    def state_dict(self) -> dict:
        return {"run_ids": [lg.state_dict() for lg in self.loggers]}

    def load_state_dict(self, state: dict) -> None:
        for lg, st in zip(self.loggers, state.get("run_ids", [])):
            lg.load_state_dict(st)

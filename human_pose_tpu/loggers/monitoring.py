"""System metrics monitoring.

Counterpart of reference src/logger/monitoring/: a daemon-thread sampler
collecting CPU / memory / disk / network via psutil plus TPU device memory via
jax's memory_stats (the pynvml/nvidia-smi analogs), feeding a
SystemMonitoringStorage that callbacks render to plots.
"""

from __future__ import annotations

import threading
import time

import psutil


def collect_sample() -> dict:
    vm = psutil.virtual_memory()
    disk = psutil.disk_usage("/")
    net = psutil.net_io_counters()
    sample = {
        "timestamp": time.time(),
        "cpu_percent": psutil.cpu_percent(),
        "memory_percent": vm.percent,
        "memory_used_gb": vm.used / 1e9,
        "disk_percent": disk.percent,
        "net_sent_mb": net.bytes_sent / 1e6,
        "net_recv_mb": net.bytes_recv / 1e6,
    }
    try:
        import jax

        for i, d in enumerate(jax.local_devices()):
            stats = d.memory_stats() or {}
            if "bytes_in_use" in stats:
                sample[f"tpu{i}_mem_gb"] = stats["bytes_in_use"] / 1e9
            if "peak_bytes_in_use" in stats:
                sample[f"tpu{i}_peak_mem_gb"] = stats["peak_bytes_in_use"] / 1e9
    except Exception:
        pass
    return sample


class SystemMetricsMonitor:
    """Daemon-thread sampler (reference monitoring/base.py:9-53)."""

    def __init__(self, interval_s: float = 10.0):
        # lazy import: loggers <-> train would otherwise be circular
        from ..train.storage import SystemMonitoringStorage

        self.interval_s = interval_s
        self.storage = SystemMonitoringStorage()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.storage.append(collect_sample())
            except Exception:
                pass

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
            self._thread = None


class TpuInfoMonitor:
    """Periodic device-stats dump to a log file — the TPU analog of the
    reference's NvidiaSmiMonitor (src/logger/monitoring/nvidia_smi.py:8-48):
    per-device HBM in-use/peak/limit every ``interval_s`` seconds on rank 0."""

    def __init__(self, filepath: str, interval_s: float = 5.0):
        self.filepath = filepath
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        import jax

        from pathlib import Path

        Path(self.filepath).parent.mkdir(parents=True, exist_ok=True)
        while not self._stop.wait(self.interval_s):
            try:
                lines = [time.strftime("%Y-%m-%d %H:%M:%S")]
                for d in jax.local_devices():
                    stats = d.memory_stats() or {}
                    in_use = stats.get("bytes_in_use", 0) / 1e9
                    peak = stats.get("peak_bytes_in_use", 0) / 1e9
                    limit = stats.get("bytes_limit", 0) / 1e9
                    lines.append(
                        f"  {d.device_kind} #{d.id}: {in_use:.2f}/{limit:.2f} GB"
                        f" (peak {peak:.2f} GB)"
                    )
                with open(self.filepath, "w") as f:
                    f.write("\n".join(lines) + "\n")
            except Exception:
                pass

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
            self._thread = None

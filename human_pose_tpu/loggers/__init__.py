from .pylogger import (
    log,
    get_pylogger,
    add_file_handler,
    set_device_tag,
    logged_tqdm,
    log_breaking_point,
)
from .loggers import Loggers, BaseLogger, TerminalLogger, FileTrackerLogger, MlflowFileLogger, Status
from .monitoring import SystemMetricsMonitor, TpuInfoMonitor, collect_sample

__all__ = [
    "log",
    "get_pylogger",
    "add_file_handler",
    "set_device_tag",
    "logged_tqdm",
    "log_breaking_point",
    "Loggers",
    "BaseLogger",
    "TerminalLogger",
    "FileTrackerLogger",
    "MlflowFileLogger",
    "Status",
    "SystemMetricsMonitor",
    "TpuInfoMonitor",
    "collect_sample",
]

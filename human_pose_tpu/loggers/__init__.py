from .pylogger import log, get_pylogger, add_file_handler, set_device_tag

__all__ = ["log", "get_pylogger", "add_file_handler", "set_device_tag"]

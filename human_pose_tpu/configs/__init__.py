from .structured import structure, unstructure
from .cli import parse_cli_value, update_dict, parse_args_for_config, update_config

__all__ = [
    "structure",
    "unstructure",
    "parse_cli_value",
    "update_dict",
    "parse_args_for_config",
    "update_config",
]

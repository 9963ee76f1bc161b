from .files import load_yaml, save_yaml, load_json, save_json
from .utils import seed_everything, elapsed_timer, get_rank, is_main_process
from .export import export_stablehlo, export_weights_npz
from .model_info import count_params, param_table, model_cost

__all__ = [
    "load_yaml",
    "save_yaml",
    "load_json",
    "save_json",
    "seed_everything",
    "elapsed_timer",
    "get_rank",
    "is_main_process",
    "export_stablehlo",
    "export_weights_npz",
    "count_params",
    "param_table",
    "model_cost",
]

from .batched_eval import BatchedKeypointsEvaluator, evaluate_dataset_batched
from .models import (
    InferenceClassificationModel,
    InferenceKeypointsModel,
    load_variables_from_ckpt,
)
from .results import ClassificationResult, InferenceKeypointsResult, KeypointsResult
from .serving import (
    BatchedClassificationPredictor,
    BatchedKeypointsPredictor,
    DynamicBatcher,
    make_server,
)
from .visualization import (
    plot_connections,
    plot_grouped_ae_tags,
    plot_heatmaps,
    plot_top_probs,
)

__all__ = [
    "BatchedKeypointsEvaluator",
    "evaluate_dataset_batched",
    "InferenceClassificationModel",
    "InferenceKeypointsModel",
    "load_variables_from_ckpt",
    "ClassificationResult",
    "InferenceKeypointsResult",
    "KeypointsResult",
    "BatchedClassificationPredictor",
    "BatchedKeypointsPredictor",
    "DynamicBatcher",
    "make_server",
    "plot_connections",
    "plot_grouped_ae_tags",
    "plot_heatmaps",
    "plot_top_probs",
]

from .rasterize import rasterize_results, bresenham_line
from .instance_eval import evaluate_instances, InstanceEvalConfig
from .harness import run_instance_eval

__all__ = [
    "rasterize_results",
    "bresenham_line",
    "evaluate_instances",
    "InstanceEvalConfig",
    "run_instance_eval",
]

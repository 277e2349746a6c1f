"""L5 observability: CSV/JSONL metric logs, param counting, profiling."""

from .cache import setup_compile_cache
from .logging import CSVLogger, JSONLLogger
from .summary import count_parameters, print_model_summary
from .viz import (
    compare_stage_outputs,
    device_memory_report,
    estimate_memory_usage,
    plot_feature_maps,
    plot_training_curves,
)

__all__ = [
    "setup_compile_cache",
    "CSVLogger",
    "JSONLLogger",
    "count_parameters",
    "print_model_summary",
    "plot_training_curves",
    "plot_feature_maps",
    "compare_stage_outputs",
    "device_memory_report",
    "estimate_memory_usage",
]

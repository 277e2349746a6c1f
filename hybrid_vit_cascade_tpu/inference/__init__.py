"""L4 inference: checkpoint-driven reconstruction with NIfTI/PNG/metrics
export (reference: inference_direct.py, inference_progressive.py,
inference_direct128.py, inference_visualization.py, inspect_checkpoint.py)."""

from .infer import (
    InferenceEngine,
    denormalize_ct,
    export_nifti,
    export_orthogonal_views,
    inspect_checkpoint,
    load_serving,
)

__all__ = [
    "InferenceEngine",
    "denormalize_ct",
    "export_nifti",
    "export_orthogonal_views",
    "inspect_checkpoint",
    "load_serving",
]

"""L2b losses & metrics — one canonical definition each (the reference had
three PSNR variants and three SSIM copies; SURVEY.md §2.8.5)."""

from .metrics import psnr, psnr_dynamic_range, ssim_metric, mae
from .multiscale import (
    MultiScaleLoss,
    TriPlanarPerceptualLoss,
    drr_reprojection_loss,
    frequency_loss,
    l1_loss,
    ssim_loss,
    total_variation_loss,
)
from .direct256 import Direct256Loss, focal_frequency_loss
from .diagnostics import DiagnosticLosses, analyze_component_health
from .feature_metrics import ComprehensiveFeatureMetrics, LPIPS3D, MultiLevelFeatureExtractor

__all__ = [
    "psnr",
    "psnr_dynamic_range",
    "ssim_metric",
    "mae",
    "l1_loss",
    "ssim_loss",
    "total_variation_loss",
    "frequency_loss",
    "drr_reprojection_loss",
    "TriPlanarPerceptualLoss",
    "MultiScaleLoss",
    "Direct256Loss",
    "focal_frequency_loss",
    "DiagnosticLosses",
    "analyze_component_health",
    "MultiLevelFeatureExtractor",
    "LPIPS3D",
    "ComprehensiveFeatureMetrics",
]

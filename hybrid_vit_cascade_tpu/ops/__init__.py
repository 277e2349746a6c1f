"""L1 core ops: the XLA/Pallas equivalents of the reference's cuDNN hot paths.

Every op here is a pure function (jit-friendly, static shapes) with an exact
numerical contract against the PyTorch reference, tested in tests/ against
torch-CPU goldens.
"""

from .conv3d import ConvNCDHW, GroupNormNCDHW, group_norm_core
from .resize import (
    resize_linear,
    resize_bilinear,
    resize_trilinear,
    upsample_nearest,
)
from .pool import avg_pool_nd, max_pool_nd, box_filter_same
from .drr import drr_beer_lambert, drr_mean_projection
from .ssim import ssim3d, ssim3d_map
from .fft import fft_magnitude_3d, high_freq_mask

__all__ = [
    "ConvNCDHW",
    "GroupNormNCDHW",
    "group_norm_core",
    "resize_linear",
    "resize_bilinear",
    "resize_trilinear",
    "upsample_nearest",
    "avg_pool_nd",
    "max_pool_nd",
    "box_filter_same",
    "drr_beer_lambert",
    "drr_mean_projection",
    "ssim3d",
    "ssim3d_map",
    "fft_magnitude_3d",
    "high_freq_mask",
]

"""L2 model assemblies (flax.linen, channels-last internally).

Public __call__ signatures keep the reference's array layouts — xrays
(B, V, 1, H, W), volumes (B, 1, D, H, W) — so a reference user can switch
without relearning shapes; internally everything is NDHWC for TPU.
"""

from .layers import AdaLNModulation, Mlp, SinusoidalTimeEmbedding
from .attention import MultiHeadCrossAttention, MultiHeadSelfAttention, collect_attention_maps
from .vit3d import HybridViT3D, HybridViTBlock3D
from .encoders import (
    MultiScaleXrayEncoder,
    SimpleXrayEncoder,
    XrayConditioningModule,
    XRayEncoderB200,
)
from .direct import DirectCTRegression
from .cascade import (
    ProgressiveCascadeModel,
    Stage1Base64,
    Stage2Refiner128,
    Stage3Refiner256,
)
from .cnn_models import (
    CBAM,
    Direct128ModelH200,
    Direct256ModelB200,
    Direct256ModelH200,
    ResidualDenseBlock,
)
from .depth_lifting import CascadedDepthLifting, ResolutionDepthPriors
from .diffusion import UnifiedCascadeStage, UnifiedHybridViTCascade, NoiseSchedule

__all__ = [
    "AdaLNModulation",
    "Mlp",
    "SinusoidalTimeEmbedding",
    "MultiHeadSelfAttention",
    "MultiHeadCrossAttention",
    "HybridViT3D",
    "HybridViTBlock3D",
    "XrayConditioningModule",
    "MultiScaleXrayEncoder",
    "SimpleXrayEncoder",
    "XRayEncoderB200",
    "DirectCTRegression",
    "ProgressiveCascadeModel",
    "Stage1Base64",
    "Stage2Refiner128",
    "Stage3Refiner256",
    "ResidualDenseBlock",
    "CBAM",
    "Direct128ModelH200",
    "Direct256ModelH200",
    "Direct256ModelB200",
    "CascadedDepthLifting",
    "ResolutionDepthPriors",
    "UnifiedCascadeStage",
    "UnifiedHybridViTCascade",
    "NoiseSchedule",
]

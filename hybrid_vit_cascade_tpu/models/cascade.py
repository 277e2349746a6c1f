"""Progressive 64³→128³→256³ cascade (reference: model_progressive.py).

Stage 1 generates 64³ from a learnable seed volume; stages 2/3 trilinearly
upsample the previous stage, refine it with a ViT (plus a CNN detail branch at
stage 3) and blend with learned residual weights. Stage freezing is handled in
the optimizer (training/schedules.py: optax masking over the `stage*` param
subtrees), not by mutating modules — the functional equivalent of
model_progressive.py:404-432.

Reference quirk preserved: Stage1 owns its *own* MultiScaleXrayEncoder
distinct from the cascade-level one (model_progressive.py:103 vs :332); both
exist in the reference checkpoints, and only stage1's copy feeds stage-1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_trilinear
from .encoders import MultiScaleXrayEncoder
from .layers import Dtype, gelu_exact, group_norm, torch_default_init
from .vit3d import HybridViT3D


def _nchw3d(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 1)


def _ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, 1, -1)


class UpsampleConvBlock(nn.Module):
    """Upsample(×2, trilinear, align_corners=False) → Conv3d → GN → GELU
    (model_progressive.py:169-174, 238-243). Operates feature-first (NCDHW):
    at 128³/256³ with ≤32 channels, channels-last would pad the 128-lane tile
    4× (ops/conv3d.py)."""

    features: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, C, D, H, W)
        from ..ops.conv3d import ConvNCDHW, GroupNormNCDHW

        d, h, w = x.shape[2:5]
        x = resize_trilinear(x, (2 * d, 2 * h, 2 * w), align_corners=False).astype(self.dtype)
        x = ConvNCDHW(self.features, 3, padding=1, dtype=self.dtype)(x)
        x = GroupNormNCDHW(self.groups, dtype=self.dtype)(x)
        return gelu_exact(x)


class Stage1Base64(nn.Module):
    """Base 64³ reconstruction (model_progressive.py:86-149)."""

    volume_size: Tuple[int, int, int] = (64, 64, 64)
    voxel_dim: int = 256
    vit_depth: int = 4
    num_heads: int = 4
    xray_feature_dim: int = 512
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = xrays.shape[0]
        D, H, W = self.volume_size
        feats, cond, _ = MultiScaleXrayEncoder(
            base_dim=self.xray_feature_dim, num_views=2, dtype=self.dtype, name="xray_encoder"
        )(xrays, stage=1, train=train)

        initial_volume = self.param(
            "initial_volume", nn.initializers.normal(stddev=0.01), (1, D, H, W, 1), jnp.float32
        )
        x = jnp.broadcast_to(initial_volume, (B, D, H, W, 1)).astype(self.dtype)

        context = feats.reshape(B, -1, self.xray_feature_dim)
        vol = HybridViT3D(
            volume_size=self.volume_size,
            in_channels=1,
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="vit_backbone",
        )(x, context, cond, train=train)
        return vol  # (B, 64, 64, 64, 1) channels-last


class Stage2Refiner128(nn.Module):
    """64³ → 128³ refiner: upsample-conv stem → ViT → learned-weight residual
    (model_progressive.py:152-216)."""

    volume_size: Tuple[int, int, int] = (128, 128, 128)
    voxel_dim: int = 256
    vit_depth: int = 6
    num_heads: int = 8
    xray_feature_dim: int = 512
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(
        self, volume_64: jnp.ndarray, xray_feats: jnp.ndarray, cond: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        B = volume_64.shape[0]
        vol_nc = _nchw3d(volume_64)  # (B, 1, 64³)
        x = UpsampleConvBlock(32, 8, dtype=self.dtype, name="upsample_from_64")(vol_nc)  # (B, 32, 128³)
        context = xray_feats.reshape(B, -1, self.xray_feature_dim)
        refinement = HybridViT3D(
            volume_size=self.volume_size,
            in_channels=32,
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            layout="NCDHW",
            name="vit_refiner",
        )(x, context, cond, train=train)

        residual_weight = self.param("residual_weight", nn.initializers.constant(0.5), (1,), jnp.float32)
        base = _ndhwc(resize_trilinear(vol_nc, self.volume_size, align_corners=False))
        return base + residual_weight.astype(base.dtype) * refinement


class _ConvGNGelu(nn.Module):
    """One NCDHW conv→GN→GELU unit, separable so each can be rematerialized
    on its own (bounds how many 256³ activations are live in the backward)."""

    features: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, C, D, H, W)
        from ..ops.conv3d import ConvNCDHW, GroupNormNCDHW

        x = ConvNCDHW(self.features, 3, padding=1, dtype=self.dtype)(x)
        x = GroupNormNCDHW(self.groups, dtype=self.dtype)(x)
        return gelu_exact(x)


class DetailEnhancer(nn.Module):
    """High-frequency CNN branch on the upsampled base volume
    (model_progressive.py:259-267). Per-layer remat (see _ConvGNGelu)."""

    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, base: jnp.ndarray) -> jnp.ndarray:  # (B, 1, D, H, W)
        from ..ops.conv3d import ConvNCDHW

        layer_cls = nn.remat(_ConvGNGelu) if self.remat else _ConvGNGelu
        d = base.astype(self.dtype)
        for ch, g in [(64, 16), (32, 8)]:
            d = layer_cls(ch, g, dtype=self.dtype)(d)
        return ConvNCDHW(1, 1, padding=0, dtype=self.dtype)(d)


class Stage3ViTTrunk(nn.Module):
    """upsample_from_128 stem + stage-3 ViT as one remat unit (see
    Stage3Refiner256.__call__)."""

    volume_size: Tuple[int, int, int]
    voxel_dim: int
    vit_depth: int
    num_heads: int
    xray_feature_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    inner_remat: bool = True

    @nn.compact
    def __call__(self, vol_nc: jnp.ndarray, context: jnp.ndarray, cond: jnp.ndarray, train: bool = False):
        x = UpsampleConvBlock(32, 8, dtype=self.dtype, name="upsample_from_128")(vol_nc)
        return HybridViT3D(
            volume_size=self.volume_size,
            in_channels=32,
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.inner_remat,
            layout="NCDHW",
            name="vit_refiner",
        )(x, context, cond, train=train)


class Stage3Refiner256(nn.Module):
    """128³ → 256³ refiner with CNN high-frequency branch
    (model_progressive.py:219-316). In training, the ViT, the upsample-conv
    stem AND the detail CNN all run under remat (the reference checkpoints
    only the ViT, :285-292, but at 256³ on a 16 GB chip the conv activations
    alone exceed HBM without it)."""

    volume_size: Tuple[int, int, int] = (256, 256, 256)
    voxel_dim: int = 256
    vit_depth: int = 8
    num_heads: int = 8
    xray_feature_dim: int = 512
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = True

    @nn.compact
    def __call__(
        self, volume_128: jnp.ndarray, xray_feats: jnp.ndarray, cond: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        B = volume_128.shape[0]
        vol_nc = _nchw3d(volume_128)  # (B, 1, 128³) — singleton move, no copy cost
        context = xray_feats.reshape(B, -1, self.xray_feature_dim)
        # upsample-conv + ViT fused into ONE remat region: a region boundary at
        # the 32-ch 256³ upsample output would save an ~8 GB (padded-layout)
        # residual; fusing makes the saved residual the 33 MB 1-ch input.
        trunk_cls = nn.remat(Stage3ViTTrunk, static_argnums=(4,)) if self.remat else Stage3ViTTrunk
        refinement = trunk_cls(
            volume_size=self.volume_size,
            voxel_dim=self.voxel_dim,
            vit_depth=self.vit_depth,
            num_heads=self.num_heads,
            xray_feature_dim=self.xray_feature_dim,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            inner_remat=self.remat,
            name="vit_trunk",
        )(vol_nc, context, cond, train)

        base_nc = resize_trilinear(vol_nc, self.volume_size, align_corners=False)  # (B, 1, 256³)

        details = DetailEnhancer(dtype=self.dtype, remat=self.remat, name="detail_enhancer")(base_nc)

        base = _ndhwc(base_nc)
        residual_weight = self.param("residual_weight", nn.initializers.constant(0.5), (1,), jnp.float32)
        detail_weight = self.param("detail_weight", nn.initializers.constant(0.3), (1,), jnp.float32)
        return (
            base
            + residual_weight.astype(base.dtype) * refinement
            + detail_weight.astype(base.dtype) * _ndhwc(details)
        )


class ProgressiveCascadeModel(nn.Module):
    """Full cascade with per-stage early exit (model_progressive.py:319-402).

    __call__(xrays (B,2,1,512,512), max_stage, return_intermediate) →
    (B, 1, S, S, S) at the max-stage resolution, or a dict of all stages.
    """

    xray_feature_dim: int = 512
    voxel_dim: int = 256
    # per-stage ViT depth/heads; the reference's H200 preset
    # (model_progressive_h200.py: voxel_dim 512, depth 8/12, heads 16 — an
    # *incomplete* file there, a config scale-up here) maps to
    # stage_depths=(4, 8, 12), stage_heads=(16, 16, 16), voxel_dim=512.
    stage_depths: Tuple[int, int, int] = (4, 6, 8)
    stage_heads: Tuple[int, int, int] = (4, 8, 8)
    # per-stage cube sizes (reference: 64→128→256); scaled-down values let the
    # full stagewise pipeline run in CPU tests
    stage_sizes: Tuple[int, int, int] = (64, 128, 256)
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    use_gradient_checkpointing: bool = True

    @nn.compact
    def __call__(
        self,
        xrays: jnp.ndarray,
        return_intermediate: bool = False,
        max_stage: int = 3,
        train: bool = False,
    ):
        outputs = {}
        # One cascade-level encoder instance, called once per refine stage —
        # repeated calls of the same linen submodule share parameters.
        xray_encoder = MultiScaleXrayEncoder(
            base_dim=self.xray_feature_dim, num_views=2, dtype=self.dtype, name="xray_encoder"
        )
        s1, s2, s3 = self.stage_sizes
        vol64 = Stage1Base64(
            volume_size=(s1, s1, s1),
            voxel_dim=self.voxel_dim,
            vit_depth=self.stage_depths[0],
            num_heads=self.stage_heads[0],
            xray_feature_dim=self.xray_feature_dim,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="stage1",
        )(xrays, train=train)
        outputs["stage1"] = _nchw3d(vol64)

        if max_stage >= 2:
            feats2, cond, _ = xray_encoder(xrays, stage=2, train=train)
            vol128 = Stage2Refiner128(
                volume_size=(s2, s2, s2),
                voxel_dim=self.voxel_dim,
                vit_depth=self.stage_depths[1],
                num_heads=self.stage_heads[1],
                xray_feature_dim=self.xray_feature_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name="stage2",
            )(vol64, feats2, cond, train=train)
            outputs["stage2"] = _nchw3d(vol128)

        if max_stage >= 3:
            feats3, cond, _ = xray_encoder(xrays, stage=3, train=train)
            vol256 = Stage3Refiner256(
                volume_size=(s3, s3, s3),
                voxel_dim=self.voxel_dim,
                vit_depth=self.stage_depths[2],
                num_heads=self.stage_heads[2],
                xray_feature_dim=self.xray_feature_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                remat=self.use_gradient_checkpointing,
                name="stage3",
            )(vol128, feats3, cond, train=train)
            outputs["stage3"] = _nchw3d(vol256)

        if return_intermediate:
            return outputs
        return outputs[f"stage{max_stage}"]

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
import jax
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
    store_attention: bool = False  # capture cross-attn maps for diagnostics

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
            store_attention=self.store_attention,
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


class _ChainParams:
    """Mixin-style helpers declaring conv/GroupNorm parameters for an
    ops.slab chain spec (parent-owned so the dense and slab-streamed
    execution paths share ONE parameter tree — a checkpoint trained with the
    memory-lean slab schedule loads directly into the dense inference path)."""

    def _conv_op(self, name: str, out_ch: int, in_ch: int, k: int, stride: int):
        kernel = self.param(f"{name}_kernel", torch_default_init, (out_ch, in_ch, k, k, k), jnp.float32)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (out_ch,), jnp.float32)
        return ("conv", kernel, bias, stride)

    def _gn_op(self, name: str, ch: int, groups: int):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (ch,), jnp.float32)
        return ("gn", groups, scale, bias)


class DetailEnhancer(nn.Module, _ChainParams):
    """High-frequency CNN branch on the upsampled base volume
    (model_progressive.py:259-267): conv(1→64)→GN→GELU→conv(64→32)→GN→GELU→
    conv1×1. With slab_scan=True the 64/32-channel full-resolution
    activations never materialize (ops/slab.py) — required to train 256³ on
    a 16 GB chip."""

    dtype: Dtype = jnp.float32
    remat: bool = False
    slab_scan: bool = False
    slab_count: int = 8
    # 'streamed' (endpoint-storing, round-3 scheme — ~2× less conv work) or
    # 'recompute' (round-2 zero-storage scheme); identical numerics
    slab_impl: str = "streamed"
    # endpoint-storing threshold override (None → chain_apply_streamed's
    # train-tuned default; 0.0 = store every segment endpoint, the eval policy)
    store_min_flops: Optional[float] = None

    @nn.compact
    def __call__(self, base: jnp.ndarray) -> jnp.ndarray:  # (B, 1, D, H, W)
        from ..ops.slab import chain_apply_dense, chain_apply_slab, chain_apply_streamed

        chain = [
            self._conv_op("conv0", 64, 1, 3, 1),
            self._gn_op("gn0", 64, 16),
            ("act", "gelu"),
            self._conv_op("conv1", 32, 64, 3, 1),
            self._gn_op("gn1", 32, 8),
            ("act", "gelu"),
            self._conv_op("conv_out", 1, 32, 1, 1),
        ]
        if self.slab_scan:
            if self.slab_impl == "streamed":
                kw = {} if self.store_min_flops is None else {"store_min_flops": self.store_min_flops}
                return chain_apply_streamed(base, chain, self.slab_count, dtype=self.dtype, **kw)
            return chain_apply_slab(base, chain, self.slab_count, dtype=self.dtype)
        if self.remat:
            from ..ops.slab import chain_apply_dense_remat

            return chain_apply_dense_remat(base, chain, self.dtype)
        return chain_apply_dense(base, chain, self.dtype)


class Stage3ViTTrunk(nn.Module, _ChainParams):
    """Stage-3 trunk: ×2 trilinear upsample → conv(1→32)+GN+GELU (the
    reference's upsample_from_128, model_progressive.py:238-243) → the ViT's
    stride-2 token stem → stage-3 ViT blocks.

    The upsample conv and the ViT stem are fused into ONE ops/slab chain so
    the 32-channel 256³ activation (the round-1 OOM buffer: ~8 GB at the
    TPU's channel-minor padded layout) exists only slab-by-slab when
    slab_scan=True; the ViT itself runs on the 32³ token grid (16 MB)."""

    volume_size: Tuple[int, int, int]
    voxel_dim: int
    vit_depth: int
    num_heads: int
    xray_feature_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    inner_remat: bool = True
    remat_mode: str = "block"  # 'block' | 'mlp' (see models/vit3d.py)
    slab_scan: bool = False
    slab_count: int = 8
    slab_impl: str = "streamed"
    store_min_flops: Optional[float] = None  # see DetailEnhancer

    @nn.compact
    def __call__(self, vol_nc: jnp.ndarray, context: jnp.ndarray, cond: jnp.ndarray, train: bool = False):
        from ..ops.slab import chain_apply_dense, chain_apply_slab, chain_apply_streamed
        from .vit3d import _stem_plan

        d, h, w = vol_nc.shape[2:5]
        x1 = resize_trilinear(vol_nc, (2 * d, 2 * h, 2 * w), align_corners=False).astype(self.dtype)

        blocks_ch, last_ch, _ = _stem_plan(self.volume_size, 32, self.voxel_dim)
        chain = [
            self._conv_op("upsample_conv", 32, 1, 3, 1),
            self._gn_op("upsample_gn", 32, 8),
            ("act", "gelu"),
        ]
        in_ch = 32
        for i, out_ch in enumerate(blocks_ch):
            chain.append(self._conv_op(f"stem_conv{i}", out_ch, in_ch, 3, 2))
            chain.append(self._gn_op(f"stem_gn{i}", out_ch, min(8, out_ch)))
            chain.append(("act", "silu"))
            in_ch = out_ch
        if last_ch != self.voxel_dim:
            chain.append(self._conv_op("proj_conv", self.voxel_dim, in_ch, 3, 1))

        if self.slab_scan:
            if self.slab_impl == "streamed":
                kw = {} if self.store_min_flops is None else {"store_min_flops": self.store_min_flops}
                feat = chain_apply_streamed(x1, chain, self.slab_count, dtype=self.dtype, **kw)
            else:
                feat = chain_apply_slab(x1, chain, self.slab_count, dtype=self.dtype)
        else:
            feat = chain_apply_dense(x1, chain, dtype=self.dtype)

        return HybridViT3D(
            volume_size=self.volume_size,
            in_channels=self.voxel_dim,
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.inner_remat,
            remat_mode=self.remat_mode,
            layout="NCDHW",
            external_stem=True,
            name="vit_refiner",
        )(feat, context, cond, train=train)


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
    remat_mode: str = "block"  # 'block' | 'mlp' (see models/vit3d.py)
    # stream the 256³ conv branches depth-slab-wise (ops/slab.py) — the
    # full-resolution intermediates never materialize, so no outer remat
    # region is needed; parameters are identical either way.
    slab_scan: bool = False
    slab_count: int = 8
    slab_impl: str = "streamed"
    store_min_flops: Optional[float] = None  # see DetailEnhancer
    # eval-time (train=False) conv-chain schedule:
    #   'auto'  — streamed flat-layout chains with one whole-volume slab and
    #             every endpoint stored. At eval no residuals are live, so
    #             memory is abundant and this is the measured-fastest
    #             schedule (v5e 256³ b1: 389 ms vs 455 dense vs 424 for the
    #             train-tuned 8-slab streaming — the dense rank-5 path pays
    #             ~104 ms of pure relayout at XLA↔Pallas-conv boundaries,
    #             wave-8 device trace).
    #   'train' — reuse the training-time flags above unchanged.
    # Parameters are identical across schedules (flip freely per call).
    eval_schedule: str = "auto"

    def _schedule(self, train: bool):
        """(slab_scan, slab_count, slab_impl, store_min_flops) for this call."""
        if not train and self.eval_schedule == "auto":
            return True, 1, "streamed", 0.0
        return self.slab_scan, self.slab_count, self.slab_impl, self.store_min_flops

    @nn.compact
    def __call__(
        self, volume_128: jnp.ndarray, xray_feats: jnp.ndarray, cond: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        slab_scan, slab_count, slab_impl, store_min_flops = self._schedule(train)
        B = volume_128.shape[0]
        vol_nc = _nchw3d(volume_128)  # (B, 1, 128³) — singleton move, no copy cost
        context = xray_feats.reshape(B, -1, self.xray_feature_dim)
        # Without slab streaming, upsample-conv + ViT fuse into ONE remat
        # region: a region boundary at the 32-ch 256³ upsample output would
        # save an ~8 GB (padded-layout) residual; fusing makes the saved
        # residual the 33 MB 1-ch input. With slab streaming the chain is
        # internally rematerialized per slab, so no outer region is needed.
        trunk_cls = Stage3ViTTrunk
        if self.remat and train and not slab_scan:
            trunk_cls = nn.remat(Stage3ViTTrunk, static_argnums=(4,))
        refinement = trunk_cls(
            volume_size=self.volume_size,
            voxel_dim=self.voxel_dim,
            vit_depth=self.vit_depth,
            num_heads=self.num_heads,
            xray_feature_dim=self.xray_feature_dim,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            inner_remat=self.remat,
            remat_mode=self.remat_mode,
            slab_scan=slab_scan,
            slab_count=slab_count,
            slab_impl=slab_impl,
            store_min_flops=store_min_flops,
            name="vit_trunk",
        )(vol_nc, context, cond, train)

        base_nc = resize_trilinear(vol_nc, self.volume_size, align_corners=False)  # (B, 1, 256³)

        details = DetailEnhancer(
            dtype=self.dtype, remat=self.remat and train and not slab_scan,
            slab_scan=slab_scan, slab_count=slab_count,
            slab_impl=slab_impl, store_min_flops=store_min_flops,
            name="detail_enhancer",
        )(base_nc)

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
    # stage-3 remat granularity: 'block' (min memory) | 'mlp' (faster —
    # attention not recomputed in backward; see models/vit3d.py)
    remat_mode: str = "block"
    # depth-slab streaming of the stage-3 256³ conv branches (ops/slab.py);
    # same parameters either way — flip freely between train and inference
    stage3_slab_scan: bool = False
    slab_count: int = 8
    # 'streamed' (endpoint-storing, ~2× faster) | 'recompute' (zero-storage)
    slab_impl: str = "streamed"
    # endpoint-storing threshold for the streamed impl (None → train-tuned
    # default in ops/slab.py; 0.0 = store every endpoint, the eval policy —
    # at eval no residuals are live so memory is abundant)
    stage3_store_min_flops: Optional[float] = None
    # eval-time stage-3 schedule: 'auto' (streamed slabs=1 store-all, the
    # measured-fastest eval path) | 'train' (reuse the flags above) —
    # see Stage3Refiner256.eval_schedule
    stage3_eval_schedule: str = "auto"
    # capture stage-1 cross-attention maps into 'intermediates' (run apply
    # with mutable=['intermediates'], then models.collect_attention_maps)
    store_attention: bool = False

    @nn.compact
    def __call__(
        self,
        xrays: jnp.ndarray,
        return_intermediate: bool = False,
        max_stage: int = 3,
        train: bool = False,
        stop_grad_stage1: bool = False,
        stage2_volume: Optional[jnp.ndarray] = None,
    ):
        """stop_grad_stage1: cut the backward at stage-1's output volume.
        During stage-2/3 training every stage-1 parameter (including its
        private encoder copy) is frozen, and xrays carry no gradient — the
        reference's requires_grad=False freeze therefore prunes the entire
        stage-1 backward (train_progressive_1gpu.py:229-231); optax masking
        alone would compute those gradients and discard them. Trainable-param
        gradients are mathematically unaffected (no trainable parameter lies
        upstream of vol64): asserted by tests/test_training.py.

        stage2_volume: a precomputed (B, 1, s2, s2, s2) stage-2 output; when
        given (with max_stage=3), stages 1-2 are skipped entirely and stage 3
        refines this volume. EXACT under the frozen-encoder stage-3 config
        (freeze_shared_encoder_stage3: vol128 is constant w.r.t. every
        trainable parameter) — used by the trainer's split stage-3 step to
        shrink the compiled program (the b2-at-256³ compile-OOM lever).
        NOTE: init must still run WITHOUT stage2_volume so stage-1/2 params
        materialize."""
        outputs = {}
        if stage2_volume is not None:
            assert max_stage >= 3, "stage2_volume requires max_stage=3"
            xray_encoder = MultiScaleXrayEncoder(
                base_dim=self.xray_feature_dim, num_views=2, dtype=self.dtype,
                name="xray_encoder"
            )
            s3 = self.stage_sizes[2]
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
                remat_mode=self.remat_mode,
                slab_scan=self.stage3_slab_scan,
                slab_count=self.slab_count,
                slab_impl=self.slab_impl,
                store_min_flops=self.stage3_store_min_flops,
                eval_schedule=self.stage3_eval_schedule,
                name="stage3",
            )(_ndhwc(stage2_volume), feats3, cond, train=train)
            outputs["stage3"] = _nchw3d(vol256)
            if return_intermediate:
                return outputs
            return outputs["stage3"]
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
            store_attention=self.store_attention,
            name="stage1",
        )(xrays, train=train)
        if stop_grad_stage1 and max_stage >= 2:
            vol64 = jax.lax.stop_gradient(vol64)
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
                remat_mode=self.remat_mode,
                slab_scan=self.stage3_slab_scan,
                slab_count=self.slab_count,
                slab_impl=self.slab_impl,
                store_min_flops=self.stage3_store_min_flops,
                eval_schedule=self.stage3_eval_schedule,
                name="stage3",
            )(vol128, feats3, cond, train=train)
            outputs["stage3"] = _nchw3d(vol256)

        if return_intermediate:
            return outputs
        return outputs[f"stage{max_stage}"]

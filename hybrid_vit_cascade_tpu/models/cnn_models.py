"""CNN decoder model family: coarse-to-fine learnable-seed decoders with
per-scale X-ray fusion (reference: model_direct128_h200.py,
model_direct256_h200.py, model_direct256_b200.py).

Common recipe: a learnable low-res seed volume is repeatedly (trilinear ×2 →
Conv3d → norm → act → ResidualDenseBlocks) upsampled; at every scale a
bilinear-resized copy of the 2D X-ray feature map is broadcast along depth
(optionally modulated by 1 + 0.3·sin(π·z/D)), concatenated and fused 1×1;
multi-scale skips are re-upsampled and fused before a conv refinement head.

torch gradient checkpointing (checkpoint(...) per stage) maps to nn.remat on
the per-stage blocks when `remat=True`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, resize_trilinear
from .encoders import SimpleXrayEncoder, XRayEncoderB200
from .layers import Dtype, gelu_exact, group_norm, torch_default_init


def _rdb_groups(growth_rate: int) -> int:
    g = min(8, growth_rate)
    while growth_rate % g != 0:
        g -= 1
    return g


def _fusion_groups(channels: int) -> int:
    g = min(32, channels)
    while channels % g != 0:
        g -= 1
    return g


class ResidualDenseBlock(nn.Module):
    """Dense-concat growth block with 1×1 compression + residual
    (model_direct128_h200.py:45-73)."""

    growth_rate: int = 32
    num_layers: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, D, H, W, C)
        feats = [x]
        g = _rdb_groups(self.growth_rate)
        for _ in range(self.num_layers):
            h = jnp.concatenate(feats, axis=-1)
            h = nn.Conv(self.growth_rate, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
            h = group_norm(g, dtype=self.dtype)(h)
            h = gelu_exact(h)
            feats.append(h)
        all_feats = jnp.concatenate(feats, axis=-1)
        compressed = nn.Conv(x.shape[-1], (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(all_feats)
        return x + compressed


class CBAM(nn.Module):
    """Channel + spatial attention (model_direct256_b200.py:31-65)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, D, H, W, C)
        C = x.shape[-1]
        fc1 = nn.Dense(C // self.reduction, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype)
        fc2 = nn.Dense(C, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype)
        avg = x.mean(axis=(1, 2, 3))
        mx = x.max(axis=(1, 2, 3))
        channel_att = nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        x = x * channel_att[:, None, None, None, :]

        avg_sp = x.mean(axis=-1, keepdims=True)
        max_sp = x.max(axis=-1, keepdims=True)
        sp = jnp.concatenate([avg_sp, max_sp], axis=-1)
        sp = nn.Conv(1, (7, 7, 7), padding=3, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype)(sp)
        return x * nn.sigmoid(sp)


class UpConvStage(nn.Module):
    """trilinear ×2 (align_corners=False) → Conv3d → GN → act → RDBs."""

    features: int
    groups: int
    rdbs: Sequence[tuple] = ()  # (growth_rate, num_layers) pairs
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h, w = x.shape[1:4]
        x = jnp.moveaxis(x, -1, 1)
        x = resize_trilinear(x, (2 * d, 2 * h, 2 * w), align_corners=False)
        x = jnp.moveaxis(x, 1, -1).astype(self.dtype)
        x = nn.Conv(self.features, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = group_norm(self.groups, dtype=self.dtype)(x)
        x = gelu_exact(x) if self.act == "gelu" else nn.relu(x)
        for growth, layers in self.rdbs:
            x = ResidualDenseBlock(growth_rate=growth, num_layers=layers, dtype=self.dtype)(x)
        return x


class XrayFusion(nn.Module):
    """concat(voxel feats, broadcast X-ray feats) → 1×1 Conv → GN → GELU
    (model_direct128_h200.py:396-404)."""

    features: int
    dtype: Dtype = jnp.float32
    bare_conv: bool = False  # B200 variant: plain 1×1 conv, no norm/act

    @nn.compact
    def __call__(self, voxel: jnp.ndarray, xray_3d: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([voxel, xray_3d.astype(voxel.dtype)], axis=-1)
        h = nn.Conv(self.features, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        if not self.bare_conv:
            h = group_norm(_fusion_groups(self.features), dtype=self.dtype)(h)
            h = gelu_exact(h)
        return h


class SkipProj(nn.Module):
    """trilinear ×scale upsample → Conv3d (+ optional GN/GELU)."""

    scale: int
    features: int
    kernel: int = 3
    groups: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h, w = x.shape[1:4]
        x = jnp.moveaxis(x, -1, 1)
        x = resize_trilinear(x, (self.scale * d, self.scale * h, self.scale * w), align_corners=False)
        x = jnp.moveaxis(x, 1, -1).astype(self.dtype)
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 3, padding=p, kernel_init=torch_default_init, dtype=self.dtype)(x)
        if self.groups is not None:
            x = group_norm(self.groups, dtype=self.dtype)(x)
            x = gelu_exact(x)
        return x


def depth_modulated_broadcast(xray_feats: jnp.ndarray, size: int, modulate: bool) -> jnp.ndarray:
    """Bilinear-resize a (B, H', W', C) 2D map to (size, size), broadcast along
    depth to (B, size, size, size, C); optionally modulate by
    1 + 0.3·sin(linspace(0,1,size)·π) (model_direct128_h200.py:419-430)."""
    f = jnp.moveaxis(xray_feats, -1, 1)  # (B, C, H', W')
    f = resize_bilinear(f, (size, size), align_corners=False)
    f = jnp.moveaxis(f, 1, -1)  # (B, size, size, C)
    f3d = jnp.broadcast_to(f[:, None], (f.shape[0], size, *f.shape[1:]))
    if modulate:
        z = jnp.linspace(0.0, 1.0, size)
        mod = 1.0 + 0.3 * jnp.sin(z * 3.14159)
        f3d = f3d * mod[None, :, None, None, None].astype(f3d.dtype)
    return f3d


class Direct128ModelH200(nn.Module):
    """Direct 16³→128³ decoder, 320ch top, 5 RDBs
    (model_direct128_h200.py:301-467)."""

    xray_feature_dim: int = 512
    num_rdb: int = 5
    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = xrays.shape[0]
        feats2d = SimpleXrayEncoder(feature_dim=self.xray_feature_dim, dtype=self.dtype, name="xray_encoder")(
            xrays, train=train
        )

        seed = self.param("initial_volume", nn.initializers.normal(stddev=0.02), (1, 16, 16, 16, 1), jnp.float32)
        x = jnp.broadcast_to(seed, (B, 16, 16, 16, 1)).astype(self.dtype)

        maybe_remat = (lambda cls: nn.remat(cls)) if (self.remat and train) else (lambda cls: cls)

        x32 = maybe_remat(UpConvStage)(64, 16, rdbs=((24, 4),), dtype=self.dtype, name="enc_16_32")(x)
        x32f = XrayFusion(64, dtype=self.dtype, name="xray_fusion_32")(
            x32, depth_modulated_broadcast(feats2d, 32, True)
        )
        x64 = maybe_remat(UpConvStage)(128, 32, rdbs=((32, 4),), dtype=self.dtype, name="enc_32_64")(x32f)
        x64f = XrayFusion(128, dtype=self.dtype, name="xray_fusion_64")(
            x64, depth_modulated_broadcast(feats2d, 64, True)
        )
        x128 = maybe_remat(UpConvStage)(
            320, 64, rdbs=tuple((32, 4) for _ in range(self.num_rdb)), dtype=self.dtype, name="enc_64_128"
        )(x64f)
        x128f = XrayFusion(320, dtype=self.dtype, name="xray_fusion_128")(
            x128, depth_modulated_broadcast(feats2d, 128, True)
        )

        skip32 = SkipProj(4, 64, 3, 16, dtype=self.dtype, name="skip_proj_32_to_128")(x32f)
        skip64 = SkipProj(2, 128, 3, 32, dtype=self.dtype, name="skip_proj_64_to_128")(x64f)

        h = jnp.concatenate([x128f, skip64, skip32], axis=-1)
        h = nn.Conv(320, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        h = group_norm(64, dtype=self.dtype)(h)
        h = gelu_exact(h)

        h = ResidualDenseBlock(32, 4, dtype=self.dtype)(h)
        h = ResidualDenseBlock(32, 4, dtype=self.dtype)(h)
        for ch, g in [(192, 48), (96, 24), (48, 12)]:
            h = nn.Conv(ch, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
            h = group_norm(g, dtype=self.dtype)(h)
            h = gelu_exact(h)
        out = nn.Conv(1, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        return jnp.moveaxis(out, -1, 1)  # (B, 1, 128, 128, 128)


class Direct256ModelH200(nn.Module):
    """Direct 32³→256³ decoder, 192ch top, 3 RDBs
    (model_direct256_h200.py:310-486). Unused by any reference trainer but
    part of the model-family surface."""

    xray_feature_dim: int = 512
    num_rdb: int = 3
    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = xrays.shape[0]
        feats2d = SimpleXrayEncoder(feature_dim=self.xray_feature_dim, dtype=self.dtype, name="xray_encoder")(
            xrays, train=train
        )
        seed = self.param("initial_volume", nn.initializers.normal(stddev=0.02), (1, 32, 32, 32, 1), jnp.float32)
        x = jnp.broadcast_to(seed, (B, 32, 32, 32, 1)).astype(self.dtype)

        maybe_remat = (lambda cls: nn.remat(cls)) if (self.remat and train) else (lambda cls: cls)

        x64 = maybe_remat(UpConvStage)(64, 16, rdbs=((32, 4),), dtype=self.dtype, name="enc_32_64")(x)
        x64f = XrayFusion(64, dtype=self.dtype, name="xray_fusion_64")(
            x64, depth_modulated_broadcast(feats2d, 64, True)
        )
        x128 = maybe_remat(UpConvStage)(128, 32, rdbs=((32, 4),), dtype=self.dtype, name="enc_64_128")(x64f)
        x128f = XrayFusion(128, dtype=self.dtype, name="xray_fusion_128")(
            x128, depth_modulated_broadcast(feats2d, 128, True)
        )
        x256 = maybe_remat(UpConvStage)(
            192, 48, rdbs=tuple((24, 4) for _ in range(self.num_rdb)), dtype=self.dtype, name="enc_128_256"
        )(x128f)
        x256f = XrayFusion(192, dtype=self.dtype, name="xray_fusion_256")(
            x256, depth_modulated_broadcast(feats2d, 256, True)
        )

        skip64 = SkipProj(4, 64, 3, 16, dtype=self.dtype, name="skip_proj_64_to_256")(x64f)
        skip128 = SkipProj(2, 128, 3, 32, dtype=self.dtype, name="skip_proj_128_to_256")(x128f)

        h = jnp.concatenate([x256f, skip128, skip64], axis=-1)
        h = nn.Conv(192, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        h = group_norm(48, dtype=self.dtype)(h)
        h = gelu_exact(h)

        h = ResidualDenseBlock(24, 4, dtype=self.dtype)(h)
        for ch, g in [(128, 32), (64, 16)]:
            h = nn.Conv(ch, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
            h = group_norm(g, dtype=self.dtype)(h)
            h = gelu_exact(h)
        out = nn.Conv(1, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        return jnp.moveaxis(out, -1, 1)


class Direct256ModelB200(nn.Module):
    """Memory-squeezed 16³(16ch)→256³ decoder with CBAM at 128³
    (model_direct256_b200.py:93-253). ReLU activations, bare 1×1 fusions, no
    depth-sin modulation, no RDB at 256³."""

    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = xrays.shape[0]
        feats2d = XRayEncoderB200(dtype=self.dtype, name="xray_encoder")(xrays, train=train)

        seed = self.param("initial_volume", nn.initializers.normal(stddev=0.01), (1, 16, 16, 16, 16), jnp.float32)
        x = jnp.broadcast_to(seed, (B, 16, 16, 16, 16)).astype(self.dtype)

        maybe_remat = (lambda cls: nn.remat(cls)) if (self.remat and train) else (lambda cls: cls)

        x = maybe_remat(UpConvStage)(32, 8, rdbs=((16, 4),), act="relu", dtype=self.dtype, name="enc_16_32")(x)
        x = XrayFusion(32, dtype=self.dtype, bare_conv=True, name="xray_fusion_32")(
            x, depth_modulated_broadcast(feats2d, 32, False)
        )
        skip32 = x

        x = maybe_remat(UpConvStage)(64, 8, rdbs=((24, 4),), act="relu", dtype=self.dtype, name="enc_32_64")(x)
        x = XrayFusion(64, dtype=self.dtype, bare_conv=True, name="xray_fusion_64")(
            x, depth_modulated_broadcast(feats2d, 64, False)
        )
        skip64 = x

        x = maybe_remat(UpConvStage)(
            128, 16, rdbs=((16, 3), (16, 3)), act="relu", dtype=self.dtype, name="enc_64_128"
        )(x)
        x = XrayFusion(128, dtype=self.dtype, bare_conv=True, name="xray_fusion_128")(
            x, depth_modulated_broadcast(feats2d, 128, False)
        )
        x = CBAM(reduction=16, dtype=self.dtype, name="cbam_128")(x)
        skip128 = x

        x = maybe_remat(UpConvStage)(128, 16, act="relu", dtype=self.dtype, name="enc_128_256_a")(x)
        x = nn.Conv(128, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = group_norm(16, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = XrayFusion(128, dtype=self.dtype, bare_conv=True, name="xray_fusion_256")(
            x, depth_modulated_broadcast(feats2d, 256, False)
        )

        s32 = SkipProj(8, 64, 1, None, dtype=self.dtype, name="skip_proj_32_to_256")(skip32)
        s64 = SkipProj(4, 64, 1, None, dtype=self.dtype, name="skip_proj_64_to_256")(skip64)
        s128 = SkipProj(2, 64, 1, None, dtype=self.dtype, name="skip_proj_128_to_256")(skip128)

        h = jnp.concatenate([x, s32, s64, s128], axis=-1)
        h = nn.Conv(128, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        h = group_norm(16, dtype=self.dtype)(h)
        h = nn.relu(h)

        for ch, g in [(64, 8), (32, 8), (16, 4)]:
            h = nn.Conv(ch, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
            h = group_norm(g, dtype=self.dtype)(h)
            h = nn.relu(h)
        out = nn.Conv(1, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)
        return jnp.moveaxis(out, -1, 1)

"""Feature-map extraction and accuracy metrics
(reference: models/feature_metrics.py).

LPIPS note: the reference optionally uses the `lpips` pip package (pretrained
AlexNet) with a graceful fallback when missing (feature_metrics.py:12-18).
That package and its pretrained weights are unavailable offline, so LPIPS3D
here computes the LPIPS *form* — unit-normalized deep features, squared
differences averaged over space and layers, on 16 uniformly-sampled slices per
anatomical axis — over fixed-seed random frozen conv features. Scores are
comparable within this framework, not calibrated to the published LPIPS scale.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pool import box_filter_same, max_pool_nd


class MultiLevelFeatureExtractor(nn.Module):
    """4-level 3D conv encoder, stride-2 after level 0
    (feature_metrics.py:21-74). Input (B, D, H, W, C); returns dict level_i."""

    feature_dims: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = {}
        for i, dim in enumerate(self.feature_dims):
            stride = 2 if i > 0 else 1
            x = nn.Conv(dim, (3, 3, 3), strides=stride, padding=1)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5)(x))
            x = nn.Conv(dim, (3, 3, 3), padding=1)(x)
            x = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5)(x))
            feats[f"level_{i}"] = x
        return feats


def _feature_cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    return (an * bn).sum(axis=-1).mean()


def _feature_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    B, C = a.shape[0], a.shape[-1]
    af = a.reshape(B, -1, C).swapaxes(1, 2)  # (B, C, N)
    bf = b.reshape(B, -1, C).swapaxes(1, 2)
    ac = af - af.mean(axis=2, keepdims=True)
    bc = bf - bf.mean(axis=2, keepdims=True)
    num = (ac * bc).sum(axis=2)
    den = jnp.sqrt((ac ** 2).sum(axis=2) * (bc ** 2).sum(axis=2) + 1e-8)
    return (num / den).mean()


def _feature_ssim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """k=3 pooled feature SSIM (feature_metrics.py:137-160)."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    sp = (1, 2, 3)  # channels-last spatial axes of (B, D, H, W, C)
    mu_a = box_filter_same(a, 3, sp)
    mu_b = box_filter_same(b, 3, sp)
    sa = box_filter_same(a * a, 3, sp) - mu_a ** 2
    sb = box_filter_same(b * b, 3, sp) - mu_b ** 2
    sab = box_filter_same(a * b, 3, sp) - mu_a * mu_b
    ssim = ((2 * mu_a * mu_b + C1) * (2 * sab + C2)) / ((mu_a ** 2 + mu_b ** 2 + C1) * (sa + sb + C2))
    return ssim.mean()


def _gram(feat: jnp.ndarray) -> jnp.ndarray:
    B, C = feat.shape[0], feat.shape[-1]
    flat = feat.reshape(B, -1, C)
    g = jnp.einsum("bnc,bnd->bcd", flat, flat)
    return g / float(flat.shape[1] * C)


class _Slice2DFeatureNet(nn.Module):
    """AlexNet-ish 2D feature stack for the LPIPS-form metric."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        taps = []
        for ch, k, s in [(64, 7, 2), (128, 5, 2), (256, 3, 1), (256, 3, 1)]:
            x = nn.Conv(ch, (k, k), strides=s, padding=k // 2)(x)
            x = nn.relu(x)
            taps.append(x)
            if s == 1 and ch == 256 and len(taps) == 3:
                x = max_pool_nd(x, 2, spatial_axes=(-3, -2), stride=2)
        return taps


class LPIPS3D:
    """Slice-sampled perceptual distance over three anatomical axes
    (feature_metrics.py:240-352); see module docstring for the offline
    substitution."""

    def __init__(self, num_slices: int = 16, seed: int = 77):
        self.num_slices = num_slices
        self._net = _Slice2DFeatureNet()
        self._vars = self._net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3), jnp.float32))

    def _lpips_2d(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._net.apply(self._vars, a)
        fb = self._net.apply(self._vars, b)
        total = 0.0
        for x, y in zip(fa, fb):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            total = total + ((xn - yn) ** 2).sum(axis=-1).mean()
        return total / len(fa)

    def __call__(self, base_ct: jnp.ndarray, generated_ct: jnp.ndarray, dimension: str = "axial") -> jnp.ndarray:
        """base/generated: (B, 1, D, H, W)."""
        axis = {"axial": 2, "coronal": 3, "sagittal": 4}[dimension]
        n_total = base_ct.shape[axis]
        n = min(self.num_slices, n_total)
        idx = jnp.linspace(0, n_total - 1, n).astype(jnp.int32)
        scores = []
        for i in idx:
            sl_a = jnp.take(base_ct, i, axis=axis)[:, 0]  # (B, X, Y)
            sl_b = jnp.take(generated_ct, i, axis=axis)[:, 0]
            a = jnp.repeat((2.0 * sl_a - 1.0)[..., None], 3, axis=-1)
            b = jnp.repeat((2.0 * sl_b - 1.0)[..., None], 3, axis=-1)
            scores.append(self._lpips_2d(a, b))
        return jnp.stack(scores).mean()

    def forward_multi_view(self, base_ct: jnp.ndarray, generated_ct: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        ax = self(base_ct, generated_ct, "axial")
        co = self(base_ct, generated_ct, "coronal")
        sa = self(base_ct, generated_ct, "sagittal")
        return {
            "lpips_axial": ax,
            "lpips_coronal": co,
            "lpips_sagittal": sa,
            "lpips_average": (ax + co + sa) / 3.0,
        }


class ComprehensiveFeatureMetrics:
    """Per-level MSE/cosine/Pearson/feature-SSIM/Gram-style + LPIPS
    (feature_metrics.py:77-237, 355-412). Volumes are (B, 1, D, H, W)."""

    def __init__(self, feature_dims: Sequence[int] = (32, 64, 128, 256), compute_lpips: bool = True,
                 num_lpips_slices: int = 16, seed: int = 99):
        self._extractor = MultiLevelFeatureExtractor(feature_dims=tuple(feature_dims))
        self._vars = self._extractor.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 8, 1), jnp.float32))
        self.compute_lpips = compute_lpips
        self._lpips = LPIPS3D(num_slices=num_lpips_slices) if compute_lpips else None

    def __call__(self, base_ct: jnp.ndarray, generated_ct: jnp.ndarray, compute_lpips=None) -> Dict[str, jnp.ndarray]:
        fb = self._extractor.apply(self._vars, jnp.moveaxis(base_ct, 1, -1).astype(jnp.float32))
        fg = self._extractor.apply(self._vars, jnp.moveaxis(generated_ct, 1, -1).astype(jnp.float32))
        metrics: Dict[str, jnp.ndarray] = {}
        for lvl in fb:
            a, b = fb[lvl], fg[lvl]
            metrics[f"{lvl}_mse"] = jnp.mean((a - b) ** 2)
            metrics[f"{lvl}_cosine"] = _feature_cosine(a, b)
            metrics[f"{lvl}_correlation"] = _feature_correlation(a, b)
            metrics[f"{lvl}_ssim"] = _feature_ssim(a, b)
            metrics[f"{lvl}_style"] = jnp.mean((_gram(a) - _gram(b)) ** 2)
        for name in ["mse", "cosine", "correlation", "ssim", "style"]:
            vals = [v for k, v in metrics.items() if k.endswith(name)]
            metrics[f"overall_feature_{name}"] = sum(vals) / len(vals)
        do_lpips = self.compute_lpips if compute_lpips is None else compute_lpips
        if do_lpips and self._lpips is not None:
            metrics.update(self._lpips.forward_multi_view(base_ct, generated_ct))
        return metrics

"""Frequency-aware multi-scale loss system
(reference: progressive_cascade/loss_multiscale.py).

Stage 1: L1 + 0.5·SSIM.
Stage 2: + 0.1·perceptual + 0.02·TV + 0.05·FFT-frequency.
Stage 3: + 0.1·perceptual + 0.03·TV + 0.07·FFT + 0.3·DRR reprojection.

Perceptual note: the reference uses ImageNet-pretrained VGG16 on tri-planar
slices (loss_multiscale.py:54-137). This environment has no network access to
fetch those weights, so TriPlanarPerceptualLoss uses the same VGG16
architecture with *fixed-seed random frozen* filters (random VGG features are
a standard perceptual proxy), and accepts a converted weight pytree via
`variables=` for exact parity when available. Deviation is documented here
and in the README.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.drr import drr_mean_projection
from ..ops.fft import (
    fft_magnitude_3d,
    half_spectrum_multiplicity,
    high_freq_mask,
    high_freq_mask_half,
    rfft_magnitude_3d,
)
from ..ops.ssim import ssim3d


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    return 1.0 - ssim3d(pred, target, window_size)


def total_variation_loss(
    pred: jnp.ndarray, target: Optional[jnp.ndarray] = None, eps: float = 1e-8
) -> jnp.ndarray:
    """Anisotropic sqrt(ε)-smoothed TV, clamped to [0, 100]; if target is
    given, L1 between the scalar TVs (loss_multiscale.py:140-188)."""

    def tv(v):
        v = v.astype(jnp.float32)
        dd = jnp.abs(v[..., 1:, :, :] - v[..., :-1, :, :])
        dh = jnp.abs(v[..., :, 1:, :] - v[..., :, :-1, :])
        dw = jnp.abs(v[..., :, :, 1:] - v[..., :, :, :-1])
        t = (
            jnp.sqrt(dd ** 2 + eps).mean()
            + jnp.sqrt(dh ** 2 + eps).mean()
            + jnp.sqrt(dw ** 2 + eps).mean()
        ) / 3.0
        return jnp.clip(t, 0.0, 100.0)

    tv_pred = tv(pred)
    if target is None:
        return tv_pred
    return jnp.abs(tv_pred - tv(target))


def frequency_loss(pred: jnp.ndarray, target: jnp.ndarray, high_freq_weight: float = 2.0) -> jnp.ndarray:
    """FFT-magnitude L1 with 2× weight on radii > min/4
    (loss_multiscale.py:191-236). Means are over all elements, with the
    complementary region zeroed — exactly the reference's masked-l1 form.

    For even spatial dims this runs on the rfft half spectrum with per-bin
    multiplicity weights (ops/fft.py) — half the FFT/elementwise work with
    identical full-cube sums (the masks/magnitudes are conjugate-symmetric).
    Odd dims (where the reference's index-centered mask is not symmetric)
    fall back to the full spectrum."""
    shape = pred.shape[-3:]
    n_full = pred.size
    if all(s % 2 == 0 for s in shape):
        pm = rfft_magnitude_3d(pred)
        tm = rfft_magnitude_3d(target)
        mask = high_freq_mask_half(shape)
        mult = half_spectrum_multiplicity(shape)
        diff = jnp.abs(pm - tm) * mult
        low = jnp.sum(diff * (1.0 - mask)) / n_full
        high = jnp.sum(diff * mask) / n_full
    else:
        pm = fft_magnitude_3d(pred)
        tm = fft_magnitude_3d(target)
        mask = high_freq_mask(shape)
        low = jnp.mean(jnp.abs(pm * (1.0 - mask) - tm * (1.0 - mask)))
        high = jnp.mean(jnp.abs(pm * mask - tm * mask))
    return low + high_freq_weight * high


def drr_reprojection_loss(pred: jnp.ndarray, input_xrays: jnp.ndarray, img_size: int = 512) -> jnp.ndarray:
    """Mean-projection DRR L1 vs both input X-rays (loss_multiscale.py:239-293).

    pred: (B, 1, D, H, W); input_xrays: (B, 2, 1, S, S)."""
    vol = pred[:, 0]
    drr_ap = drr_mean_projection(vol, "ap", img_size)
    drr_lat = drr_mean_projection(vol, "lateral", img_size)
    xray_ap = input_xrays[:, 0, 0].astype(jnp.float32)
    xray_lat = input_xrays[:, 1, 0].astype(jnp.float32)
    return (jnp.mean(jnp.abs(drr_ap - xray_ap)) + jnp.mean(jnp.abs(drr_lat - xray_lat))) / 2.0


class _VGG16Features(nn.Module):
    """VGG16 conv prefix through relu3_3, emitting relu1_2/relu2_2/relu3_3.

    The reference applies `vgg.features[:4]`, `[:9]`, `[:16]` to the input —
    prefixes of one chain, so a single sequential pass with taps is
    numerically identical (and 3× cheaper than the reference's recompute,
    SURVEY.md §2.8.7)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        taps = []
        plan = [  # (channels, tap_after?)
            (64, False), (64, True),           # conv1_1, conv1_2 → relu1_2
            ("pool", None),
            (128, False), (128, True),         # conv2_1, conv2_2 → relu2_2
            ("pool", None),
            (256, False), (256, False), (256, True),  # conv3_1..3_3 → relu3_3
        ]
        for ch, tap in plan:
            if ch == "pool":
                from ..ops.pool import max_pool_nd

                x = max_pool_nd(x, 2, spatial_axes=(-3, -2), stride=2)
                continue
            x = nn.Conv(ch, (3, 3), padding=1)(x)
            x = nn.relu(x)
            if tap:
                taps.append(x)
        return taps


class TriPlanarPerceptualLoss:
    """2D perceptual loss on the three mid orthogonal slices
    (loss_multiscale.py:54-137). Frozen fixed-seed VGG16-architecture filters
    (see module docstring); pass `variables=` to use converted VGG16 weights.
    """

    def __init__(self, variables=None, seed: int = 1234):
        self._net = _VGG16Features()
        if variables is None:
            variables = self._net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3), jnp.float32))
        self._vars = jax.tree.map(jax.lax.stop_gradient, variables)
        self.layer_weights = (1.0, 1.0, 1.0)

    def __call__(self, pred_volume: jnp.ndarray, target_volume: jnp.ndarray) -> jnp.ndarray:
        B, C, D, H, W = pred_volume.shape
        md, mh, mw = D // 2, H // 2, W // 2
        pairs = [
            (pred_volume[:, :, md], target_volume[:, :, md]),        # axial (B, 1, H, W)
            (pred_volume[:, :, :, mh], target_volume[:, :, :, mh]),  # sagittal (B, 1, D, W)
            (pred_volume[:, :, :, :, mw], target_volume[:, :, :, :, mw]),  # coronal (B, 1, D, H)
        ]
        total = 0.0
        for p, t in pairs:
            p = (jnp.moveaxis(p, 1, -1).astype(jnp.float32) + 1.0) / 2.0
            t = (jnp.moveaxis(t, 1, -1).astype(jnp.float32) + 1.0) / 2.0
            p = jnp.repeat(p, 3, axis=-1)
            t = jnp.repeat(t, 3, axis=-1)
            pf = self._net.apply(self._vars, p)
            tf = self._net.apply(self._vars, t)
            for a, b, w in zip(pf, tf, self.layer_weights):
                total = total + w * jnp.mean(jnp.abs(a - b))
        return total / 3.0


_DEFAULT_WEIGHTS = {
    "stage1": {"l1": 1.0, "ssim": 0.5},
    "stage2": {"l1": 1.0, "ssim": 0.5, "vgg": 0.1, "tv": 0.02, "freq": 0.05},
    "stage3": {"l1": 1.0, "ssim": 0.5, "vgg": 0.1, "tv": 0.03, "freq": 0.07, "drr": 0.3},
}


class MultiScaleLoss:
    """Per-stage loss dispatcher (loss_multiscale.py:296-491). Returns the
    reference's loss-dict keys per stage."""

    def __init__(self, config: Optional[Dict] = None,
                 perceptual: Optional[TriPlanarPerceptualLoss] = None,
                 vgg_weights: Optional[str] = None):
        cfg = dict(_DEFAULT_WEIGHTS)
        if config:
            for k, v in config.items():
                cfg[k] = {**cfg.get(k, {}), **v}
        self.weights = cfg
        if perceptual is None and vgg_weights:
            # converted ImageNet VGG16 weights (scripts/convert_vgg16.py) —
            # exact parity with the reference's pretrained perceptual loss
            from .vgg_weights import load_vgg16_variables

            perceptual = TriPlanarPerceptualLoss(variables=load_vgg16_variables(vgg_weights))
        self.perceptual = perceptual or TriPlanarPerceptualLoss()

    def __call__(
        self,
        pred: jnp.ndarray,
        target: jnp.ndarray,
        stage: int = 1,
        input_xrays: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        w = self.weights[f"stage{stage}"]
        out: Dict[str, jnp.ndarray] = {}
        out["l1_loss"] = l1_loss(pred, target)
        out["ssim_loss"] = ssim_loss(pred, target)
        total = w["l1"] * out["l1_loss"] + w["ssim"] * out["ssim_loss"]
        if stage >= 2:
            out["vgg_loss"] = self.perceptual(pred, target)
            out["tv_loss"] = total_variation_loss(pred, target)
            out["freq_loss"] = frequency_loss(pred, target)
            total = total + w["vgg"] * out["vgg_loss"] + w["tv"] * out["tv_loss"] + w["freq"] * out["freq_loss"]
        if stage >= 3 and input_xrays is not None:
            out["drr_loss"] = drr_reprojection_loss(pred, input_xrays, img_size=input_xrays.shape[-1])
            total = total + w["drr"] * out["drr_loss"]
        out["total_loss"] = total
        return out

"""Diagnostic loss suite + component-health analyzer
(reference: models/diagnostic_losses.py:172-660).

Nine instrumented loss categories isolating architectural components:
diffusion MSE, single/multi-view/multi-scale DRR projection, depth
consistency, cross-attention entropy/sparsity, stage-transition frequency
split, 3D perceptual, anatomical-prior improvement, and the feature-metric
suite. Used for debugging/ablation, not as the training objective.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.drr import drr_beer_lambert
from ..ops.pool import avg_pool_nd, max_pool_nd
from ..ops.resize import resize_bilinear, resize_trilinear
from .feature_metrics import ComprehensiveFeatureMetrics

DEFAULT_LOSS_WEIGHTS = {
    "diffusion": 1.0,
    "projection_single": 0.3,
    "projection_multi_view": 0.2,
    "projection_multi_scale": 0.1,
    "depth_consistency": 0.15,
    "cross_attention_align": 0.1,
    "stage_transition": 0.2,
    "perceptual": 0.1,
    "frequency_low": 0.05,
    "frequency_high": 0.05,
    "anatomical_prior": 0.1,
    "feature_mse": 0.15,
    "feature_cosine": 0.1,
    "feature_correlation": 0.05,
    "lpips": 0.2,
}


class Simple3DPerceptualNet(nn.Module):
    """conv/relu/maxpool ×2 → conv → GAP (diagnostic_losses.py:639-660)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, D, H, W, 1)
        x = nn.relu(nn.Conv(32, (3, 3, 3), padding=1)(x))
        x = max_pool_nd(x, 2, spatial_axes=(1, 2, 3))
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding=1)(x))
        x = max_pool_nd(x, 2, spatial_axes=(1, 2, 3))
        x = nn.relu(nn.Conv(128, (3, 3, 3), padding=1)(x))
        return x.mean(axis=(1, 2, 3))  # (B, 128)


def _mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


class DiagnosticLosses:
    """Frozen-feature diagnostic suite; __call__ mirrors
    compute_all_losses (diagnostic_losses.py:241-532)."""

    def __init__(self, use_perceptual=True, use_frequency=True, use_feature_metrics=True,
                 use_lpips=True, loss_weights: Optional[Dict[str, float]] = None, seed: int = 7):
        self.use_frequency = use_frequency
        self.use_feature_metrics = use_feature_metrics
        self.use_lpips = use_lpips
        self.loss_weights = dict(loss_weights or DEFAULT_LOSS_WEIGHTS)
        self._perceptual = None
        if use_perceptual:
            self._perceptual = Simple3DPerceptualNet()
            self._perc_vars = self._perceptual.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
            )
        self._feature_metrics = (
            ComprehensiveFeatureMetrics(compute_lpips=use_lpips) if (use_feature_metrics or use_lpips) else None
        )

    def __call__(
        self,
        predicted: jnp.ndarray,  # (B, 1, D, H, W) predicted noise/velocity
        target: jnp.ndarray,
        pred_x0: jnp.ndarray,
        gt_x0: jnp.ndarray,
        xrays: jnp.ndarray,  # (B, V, 1, S, S)
        depth_prior: Optional[jnp.ndarray] = None,
        prev_stage_volume: Optional[jnp.ndarray] = None,
        attention_maps: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        losses: Dict[str, jnp.ndarray] = {}
        zero = jnp.asarray(0.0, jnp.float32)

        # 1. diffusion
        losses["diffusion"] = _mse(predicted, target)

        # 2. projections (Beer–Lambert; bilinear align_corners=True size-match)
        xray_ap = xrays[:, 0, 0].astype(jnp.float32)
        drr_pred = drr_beer_lambert(pred_x0[:, 0], "ap")
        drr_gt = drr_beer_lambert(gt_x0[:, 0], "ap")
        if drr_pred.shape[-2:] != xray_ap.shape[-2:]:
            drr_pred = resize_bilinear(drr_pred, xray_ap.shape[-2:], align_corners=True)
            drr_gt = resize_bilinear(drr_gt, xray_ap.shape[-2:], align_corners=True)
        losses["projection_single"] = _mse(drr_pred, xray_ap)
        losses["projection_gt_sanity"] = _mse(drr_gt, xray_ap)

        if xrays.shape[1] > 1:
            xray_lat = xrays[:, 1, 0].astype(jnp.float32)
            drr_lat = drr_beer_lambert(pred_x0[:, 0], "lateral")
            if drr_lat.shape[-2:] != xray_lat.shape[-2:]:
                drr_lat = resize_bilinear(drr_lat, xray_lat.shape[-2:], align_corners=True)
            losses["projection_multi_view"] = _mse(drr_lat, xray_lat)
        else:
            losses["projection_multi_view"] = zero

        ms = []
        for size in (64, 128):
            dp = resize_bilinear(drr_pred, (size, size), align_corners=True)
            xt = resize_bilinear(xray_ap, (size, size), align_corners=True)
            ms.append(_mse(dp, xt))
        losses["projection_multi_scale"] = sum(ms) / 2.0

        # 3. depth consistency
        if depth_prior is not None:
            pf = pred_x0.reshape(pred_x0.shape[0], -1).astype(jnp.float32)
            df = depth_prior.reshape(depth_prior.shape[0], -1).astype(jnp.float32)
            cos = (
                (pf * df).sum(-1)
                / (jnp.linalg.norm(pf, axis=-1) * jnp.linalg.norm(df, axis=-1) + 1e-8)
            ).mean()
            losses["depth_consistency"] = (cos - 0.45) ** 2
            losses["depth_prior_quality"] = _mse(depth_prior, gt_x0)
        else:
            losses["depth_consistency"] = zero
            losses["depth_prior_quality"] = zero

        # 4. cross-attention alignment (diagnostic_losses.py:357-385)
        if attention_maps is not None and "cross_attention" in attention_maps:
            attn = attention_maps["cross_attention"].mean(axis=1)  # (B, N, M)
            probs = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            entropy = -(probs * jnp.log(probs + 1e-8)).sum(-1).mean()
            target_entropy = jnp.log(jnp.asarray(probs.shape[-1], jnp.float32)) * 0.6
            losses["cross_attention_align"] = (entropy - target_entropy) ** 2
            losses["cross_attention_sparsity"] = -probs.max(axis=-1).mean()
        else:
            losses["cross_attention_align"] = zero
            losses["cross_attention_sparsity"] = zero

        # 5. stage transition: k4/s1/p2 low-pass split (diagnostic_losses.py:390-413)
        if prev_stage_volume is not None:
            prev_up = resize_trilinear(prev_stage_volume, pred_x0.shape[-3:], align_corners=True)
            lp = avg_pool_nd(pred_x0, 4, spatial_axes=(-3, -2, -1), stride=1, padding=2)
            lprev = avg_pool_nd(prev_up, 4, spatial_axes=(-3, -2, -1), stride=1, padding=2)
            losses["stage_transition"] = _mse(lp, lprev)
            # NOTE torch's k4/s1/p2 pooling emits size+1 maps; the residual uses
            # the first `size` entries so high-freq shapes match the volume.
            hp = pred_x0.astype(jnp.float32) - lp[..., : pred_x0.shape[-3], : pred_x0.shape[-2], : pred_x0.shape[-1]]
            hprev = prev_up.astype(jnp.float32) - lprev[..., : pred_x0.shape[-3], : pred_x0.shape[-2], : pred_x0.shape[-1]]
            losses["stage_detail_addition"] = -_mse(hp, hprev)
        else:
            losses["stage_transition"] = zero
            losses["stage_detail_addition"] = zero

        # 6. frequency split (k8/s8 pool → trilinear ↑, align_corners=True)
        if self.use_frequency:
            def lowpass(v):
                p = avg_pool_nd(v, 8, spatial_axes=(-3, -2, -1))
                return resize_trilinear(p, v.shape[-3:], align_corners=True)

            pl_, gl = lowpass(pred_x0), lowpass(gt_x0)
            losses["frequency_low"] = _mse(pl_, gl)
            losses["frequency_high"] = _mse(pred_x0.astype(jnp.float32) - pl_, gt_x0.astype(jnp.float32) - gl)
        else:
            losses["frequency_low"] = zero
            losses["frequency_high"] = zero

        # 7. perceptual
        if self._perceptual is not None:
            fp = self._perceptual.apply(self._perc_vars, jnp.moveaxis(pred_x0, 1, -1).astype(jnp.float32))
            fg = self._perceptual.apply(self._perc_vars, jnp.moveaxis(gt_x0, 1, -1).astype(jnp.float32))
            losses["perceptual"] = _mse(fp, fg)
        else:
            losses["perceptual"] = zero

        # 8. anatomical prior improvement
        if depth_prior is not None:
            prior_err = _mse(depth_prior, gt_x0)
            pred_err = _mse(pred_x0, gt_x0)
            improvement = (prior_err - pred_err) / (prior_err + 1e-8)
            losses["anatomical_prior"] = nn.relu(-improvement)
            losses["prior_improvement_ratio"] = jax.lax.stop_gradient(improvement)
        else:
            losses["anatomical_prior"] = zero
            losses["prior_improvement_ratio"] = zero

        # 9. feature metrics / LPIPS
        if self._feature_metrics is not None:
            fm = self._feature_metrics(gt_x0, pred_x0)
            if self.use_feature_metrics:
                losses["feature_mse"] = fm["overall_feature_mse"]
                losses["feature_cosine"] = 1.0 - fm["overall_feature_cosine"]
                losses["feature_correlation"] = 1.0 - fm["overall_feature_correlation"]
                losses["feature_ssim"] = 1.0 - fm["overall_feature_ssim"]
                losses["feature_style"] = fm["overall_feature_style"]
                for k, v in fm.items():
                    if k.startswith("level_"):
                        losses[f"diagnostic_{k}"] = v
            if self.use_lpips and "lpips_average" in fm:
                losses["lpips"] = fm["lpips_average"]
                losses["lpips_axial"] = fm["lpips_axial"]
                losses["lpips_coronal"] = fm["lpips_coronal"]
                losses["lpips_sagittal"] = fm["lpips_sagittal"]
        for k in ["feature_mse", "feature_cosine", "feature_correlation", "feature_ssim", "feature_style", "lpips"]:
            losses.setdefault(k, zero)

        total = zero
        for name, value in losses.items():
            if name in self.loss_weights and not name.endswith("_sanity"):
                total = total + self.loss_weights[name] * value
        losses["total"] = total
        return losses


def analyze_component_health(losses: Dict[str, jnp.ndarray]) -> Dict[str, str]:
    """EXCELLENT/GOOD/WARNING/CRITICAL classifier
    (diagnostic_losses.py:534-636)."""
    f = {k: float(v) for k, v in losses.items() if jnp.ndim(v) == 0}
    health: Dict[str, str] = {}

    def grade(val, bands, labels=("EXCELLENT", "GOOD", "WARNING", "CRITICAL")):
        for b, lab in zip(bands, labels):
            if val < b:
                return lab
        return labels[-1]

    health["denoising"] = grade(f.get("diffusion", 0.0), (0.01, 0.05, 0.1))
    health["physics"] = grade(f.get("projection_single", 0.0), (0.005, 0.02, 0.05))
    if f.get("depth_consistency", 0.0) > 0:
        corr = 0.45 - f["depth_consistency"] ** 0.5
        if corr > 0.5:
            health["depth_lifting"] = "EXCELLENT"
        elif corr > 0.3:
            health["depth_lifting"] = "GOOD"
        elif corr > 0.1:
            health["depth_lifting"] = "WARNING"
        else:
            health["depth_lifting"] = "CRITICAL - Prior being ignored"
    if f.get("cross_attention_align", 0.0) > 0:
        v = f["cross_attention_align"]
        health["cross_attention"] = (
            "EXCELLENT" if v < 0.1 else "GOOD" if v < 0.3 else "WARNING" if v < 0.5
            else "CRITICAL - Attention collapsed"
        )
    if "frequency_low" in f and "frequency_high" in f:
        lo, hi = f["frequency_low"], f["frequency_high"]
        if lo > 2 * hi:
            health["structure_vs_details"] = "WARNING - Struggling with anatomy"
        elif hi > 2 * lo:
            health["structure_vs_details"] = "WARNING - Missing fine details"
        else:
            health["structure_vs_details"] = "GOOD - Balanced"
    if f.get("stage_transition", 0.0) > 0:
        v = f["stage_transition"]
        health["cascade"] = (
            "EXCELLENT - Smooth transition" if v < 0.01 else "GOOD" if v < 0.05
            else "WARNING - Stages disconnected" if v < 0.1 else "CRITICAL - Cascade not coherent"
        )
    if f.get("feature_mse", 0.0) > 0:
        v = f["feature_mse"]
        health["feature_accuracy"] = (
            "EXCELLENT - Features match well" if v < 0.01 else "GOOD" if v < 0.05
            else "WARNING - Feature mismatch" if v < 0.1 else "CRITICAL - Features very different"
        )
    if f.get("lpips", 0.0) > 0:
        v = f["lpips"]
        health["perceptual_similarity"] = (
            "EXCELLENT - Perceptually identical" if v < 0.1 else "GOOD" if v < 0.3
            else "WARNING - Perceptual differences" if v < 0.5 else "CRITICAL - Very different perceptually"
        )
    return health

"""Canonical quality metrics.

The reference has three PSNR variants (loss_multiscale.py:493-501 fixed
range 2.0; train_direct.py:22 and inference_direct.py:69 dynamic range);
`psnr` is the canonical fixed-range form used for parity, and
`psnr_dynamic_range` reproduces the inference-script variant. All metrics
compute in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import ssim3d


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """20·log10(range/√MSE); range 2.0 for [-1, 1] volumes."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 20.0 * jnp.log10(data_range / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def psnr_dynamic_range(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR with the target's observed dynamic range (inference_direct.py:69)."""
    t = target.astype(jnp.float32)
    return psnr(pred, target, data_range=1.0) + 20.0 * jnp.log10(jnp.maximum(t.max() - t.min(), 1e-12))


def ssim_metric(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean 3D SSIM (higher is better)."""
    return ssim3d(pred, target, window_size)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))

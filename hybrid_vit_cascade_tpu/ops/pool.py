"""Pooling primitives with PyTorch-exact semantics.

Reproduces the torch ops the reference's losses/encoders rely on:
  * F.avg_pool3d(..., count_include_pad=True) — zero-padded box filter that
    always divides by the full window volume (SSIM at loss_multiscale.py:37-46,
    frequency split at diagnostic_losses.py:399,420).
  * F.max_pool2d / MaxPool3d for the CNN encoders.

The SSIM-style stride-1 box filter is computed separably (three 1-D window
sums), turning an O(k^3) window reduction into O(3k) — identical numerics
because zero padding commutes with separable box filtering.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax


def _window_sum_1d(x: jnp.ndarray, axis: int, window: int, stride: int, pad: int) -> jnp.ndarray:
    """Zero-padded windowed sum along one axis."""
    ndim = x.ndim
    window_dims = [1] * ndim
    strides = [1] * ndim
    padding = [(0, 0)] * ndim
    window_dims[axis] = window
    strides[axis] = stride
    padding[axis] = (pad, pad)
    return lax.reduce_window(x, 0.0, lax.add, tuple(window_dims), tuple(strides), tuple(padding))


def box_filter_same(x: jnp.ndarray, window: int, spatial_axes: Sequence[int]) -> jnp.ndarray:
    """Stride-1 mean filter with zero padding window//2, dividing by the full
    window volume (torch avg_pool3d stride=1 padding=w//2 count_include_pad).

    NOTE: for even windows torch pads w//2 on both sides and emits size+1
    outputs; the reference only ever uses odd windows (11, 3) so we require odd.
    """
    assert window % 2 == 1, "box_filter_same requires an odd window"
    pad = window // 2
    out = x.astype(jnp.float32)
    for axis in spatial_axes:
        out = _window_sum_1d(out, axis % x.ndim, window, 1, pad)
    return (out / float(window ** len(spatial_axes))).astype(x.dtype)


def avg_pool_nd(
    x: jnp.ndarray,
    window: int | Sequence[int],
    spatial_axes: Sequence[int],
    stride: int | Sequence[int] | None = None,
    padding: int | Sequence[int] = 0,
) -> jnp.ndarray:
    """torch F.avg_poolNd with count_include_pad=True over `spatial_axes`."""
    n = len(spatial_axes)
    windows = [window] * n if isinstance(window, int) else list(window)
    if stride is None:
        strides = list(windows)
    else:
        strides = [stride] * n if isinstance(stride, int) else list(stride)
    pads = [padding] * n if isinstance(padding, int) else list(padding)

    ndim = x.ndim
    window_dims = [1] * ndim
    stride_dims = [1] * ndim
    pad_dims = [(0, 0)] * ndim
    denom = 1.0
    for ax, w, s, p in zip(spatial_axes, windows, strides, pads):
        window_dims[ax % ndim] = w
        stride_dims[ax % ndim] = s
        pad_dims[ax % ndim] = (p, p)
        denom *= w
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, tuple(window_dims), tuple(stride_dims), tuple(pad_dims)
    )
    return (summed / denom).astype(x.dtype)


def max_pool_nd(
    x: jnp.ndarray,
    window: int | Sequence[int],
    spatial_axes: Sequence[int],
    stride: int | Sequence[int] | None = None,
    padding: int | Sequence[int] = 0,
) -> jnp.ndarray:
    """torch F.max_poolNd (padding with -inf)."""
    n = len(spatial_axes)
    windows = [window] * n if isinstance(window, int) else list(window)
    if stride is None:
        strides = list(windows)
    else:
        strides = [stride] * n if isinstance(stride, int) else list(stride)
    pads = [padding] * n if isinstance(padding, int) else list(padding)

    ndim = x.ndim
    window_dims = [1] * ndim
    stride_dims = [1] * ndim
    pad_dims = [(0, 0)] * ndim
    for ax, w, s, p in zip(spatial_axes, windows, strides, pads):
        window_dims[ax % ndim] = w
        stride_dims[ax % ndim] = s
        pad_dims[ax % ndim] = (p, p)
    # init value must be a concrete scalar (not a traced constant) for JAX to
    # recognize the differentiable reduce-window-max pattern
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg_inf = np.array(-np.inf, x.dtype)
    else:
        neg_inf = np.array(np.iinfo(x.dtype).min, x.dtype)
    return lax.reduce_window(
        x, neg_inf, lax.max, tuple(window_dims), tuple(stride_dims), tuple(pad_dims)
    )

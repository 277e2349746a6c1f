"""Separable linear resize as per-axis matmuls (MXU-friendly).

The reference leans on `F.interpolate` everywhere: trilinear with
`align_corners=True` inside the ViT backbone (hybrid_vit_backbone.py:272) and
for diagnostic-DRR size matching, and `align_corners=False` at cascade stage
boundaries (model_progressive.py:212,296), in the loss resizes and in the data
pipeline. On TPU the speed-of-light formulation of an N-D linear resize is N
small dense matmuls (each interpolation matrix row has <=2 non-zeros, but a
(out,in) dense matmul rides the MXU and XLA fuses the chain), so that is what
we do — no gather/scatter, fully static shapes.

Both PyTorch coordinate conventions are reproduced exactly:
  * align_corners=True : src = i * (in-1) / (out-1)
  * align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to [0, in-1]
(no antialiasing on downscale, matching torch's default — note jax.image.resize
antialiases, which is why we do not use it).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    rows = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(rows)
        else:
            src = rows * (in_size - 1) / (out_size - 1)
    else:
        src = (rows + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(mat, (np.arange(out_size), hi), frac)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Nearest-neighbour (torch 'nearest': src = floor(i * in/out))."""
    rows = np.arange(out_size, dtype=np.float64)
    src = np.minimum((rows * in_size / out_size).astype(np.int64), in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def _apply_axis_matrix(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """Contract `axis` of x with mat^T: out[..., i, ...] = sum_j mat[i, j] x[..., j, ...]."""
    w = jnp.asarray(mat)  # float32
    # precision=highest: keep true-fp32 interpolation on TPU (MXU defaults to
    # bf16 inputs otherwise); these matmuls are bandwidth-bound, so the extra
    # passes are free.
    out = jnp.tensordot(x.astype(jnp.float32), w, axes=[[axis], [1]], precision="highest")
    # tensordot moved the contracted axis to the end; restore position.
    out = jnp.moveaxis(out, -1, axis)
    return out


def resize_linear(
    x: jnp.ndarray,
    out_sizes: Sequence[int],
    axes: Sequence[int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Separable linear resize along `axes` to `out_sizes`. Computes in fp32,
    returns in the input dtype."""
    assert len(out_sizes) == len(axes)
    orig_dtype = x.dtype
    out = x
    for axis, size in zip(axes, out_sizes):
        ax = axis % x.ndim
        if out.shape[ax] != size:
            mat = _linear_resize_matrix(out.shape[ax], int(size), align_corners)
            out = _apply_axis_matrix(out, mat, ax)
    return out.astype(orig_dtype)


def resize_bilinear(x: jnp.ndarray, out_hw: Sequence[int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of the two trailing axes (..., H, W)."""
    return resize_linear(x, out_hw, axes=(-2, -1), align_corners=align_corners)


def resize_trilinear(x: jnp.ndarray, out_dhw: Sequence[int], align_corners: bool = False) -> jnp.ndarray:
    """Trilinear resize of the three trailing axes (..., D, H, W)."""
    return resize_linear(x, out_dhw, axes=(-3, -2, -1), align_corners=align_corners)


def resize_trilinear_np(vol: np.ndarray, out_dhw: Sequence[int],
                        align_corners: bool = False) -> np.ndarray:
    """Host-side (numpy) trilinear resize of the three trailing axes, using
    the SAME interpolation matrices as the device path — the training input
    pipeline pre-resizes CT targets to each cascade stage's resolution on the
    host so a 64³ stage never ships the full 256³ volume over the (slow)
    host↔device link (the on-device `resize_target` then short-circuits)."""
    out = vol
    for axis, size in zip((-3, -2, -1), out_dhw):
        ax = axis % out.ndim
        if out.shape[ax] != int(size):
            mat = _linear_resize_matrix(out.shape[ax], int(size), align_corners)
            out = np.moveaxis(np.tensordot(out, mat, axes=[[ax], [1]]), -1, ax)
    return np.ascontiguousarray(out, dtype=np.float32)


def upsample_nearest(x: jnp.ndarray, out_sizes: Sequence[int], axes: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbour resize along `axes` (torch 'nearest' convention)."""
    out = x
    for axis, size in zip(axes, out_sizes):
        ax = axis % x.ndim
        if out.shape[ax] != size:
            mat = _nearest_resize_matrix(out.shape[ax], int(size))
            out = _apply_axis_matrix(out, mat, ax).astype(x.dtype)
    return out

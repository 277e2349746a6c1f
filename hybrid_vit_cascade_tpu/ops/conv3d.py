"""Feature-first (NCDHW) 3D conv + GroupNorm for small-channel volumes.

TPU tiles the last two axes onto (8 sublanes × 128 lanes). Channels-last
NDHWC puts C in the lane dim, so a 64-channel 256³ bf16 activation pads
2× (4 GB physical for 2 GB logical) and a 32-channel one pads 4×. For the
cascade's 256³ conv branches that padding alone overflows a 16 GB chip
during training. In NCDHW the lane dim is W (=256, fully occupied) and the
sublane dim is H — zero padding waste for any channel count.

`conv3d_ncdhw` wraps lax.conv_general_dilated with NCDHW/OIDHW dimension
numbers; `group_norm_ncdhw` implements torch-GroupNorm semantics (stats over
(C/G, D, H, W), eps 1e-5) with fp32 statistics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Dtype = Any
# torch convNd default init (duplicated from models.layers to avoid an
# ops -> models import cycle)
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class ConvNCDHW(nn.Module):
    """3D conv on (B, C, D, H, W) tensors (weights OIDHW)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_default_init, (self.features, in_ch, k, k, k), jnp.float32
        )
        out = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(self.padding, self.padding)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)[None, :, None, None, None]
        return out


import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_norm_core(x, scale, bias, num_groups):
    """GroupNorm on (B, C, *spatial) with a hand-written VJP.

    Autodiff of the naive formulation materializes full-tensor fp32 temps
    (the top stage-3 OOM buffers: 2×4 GB per norm at 256³). Here every
    full-tensor op stays in the input dtype; only per-group scalars are fp32.
    """
    y, _ = _gn_fwd_impl(x, scale, bias, num_groups)
    return y


def _gn_fwd_impl(x, scale, bias, num_groups):
    B, C = x.shape[0], x.shape[1]
    G = num_groups
    red_axes = tuple(range(2, x.ndim + 1))  # over (C/G, *spatial) of the reshaped view
    xr = x.reshape(B, G, C // G, *x.shape[2:])
    mean = jnp.mean(xr, axis=red_axes, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(lax.square(xr), axis=red_axes, keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - lax.square(mean), 0.0)
    inv = lax.rsqrt(var + 1e-5)
    xhat = ((xr - mean.astype(x.dtype)) * inv.astype(x.dtype)).reshape(x.shape)
    bshape = (1, C) + (1,) * (x.ndim - 2)
    y = xhat * scale.astype(x.dtype).reshape(bshape) + bias.astype(x.dtype).reshape(bshape)
    return y, (xhat, inv, scale)


def _gn_fwd(x, scale, bias, num_groups):
    y, (xhat, inv, scale) = _gn_fwd_impl(x, scale, bias, num_groups)
    return y, (xhat, inv, scale)


def _gn_bwd(num_groups, res, g):
    xhat, inv, scale = res
    B, C = xhat.shape[0], xhat.shape[1]
    G = num_groups
    red_axes = tuple(range(2, xhat.ndim + 1))
    bshape = (1, C) + (1,) * (xhat.ndim - 2)

    param_axes = (0,) + tuple(range(2, xhat.ndim))
    dscale = jnp.sum((g * xhat).astype(jnp.float32), axis=param_axes)
    dbias = jnp.sum(g.astype(jnp.float32), axis=param_axes)

    gs = g * scale.astype(g.dtype).reshape(bshape)
    gsr = gs.reshape(B, G, C // G, *xhat.shape[2:])
    xhr = xhat.reshape(B, G, C // G, *xhat.shape[2:])
    m1 = jnp.mean(gsr, axis=red_axes, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(gsr * xhr, axis=red_axes, keepdims=True, dtype=jnp.float32)
    dxr = (gsr - m1.astype(g.dtype) - xhr * m2.astype(g.dtype)) * inv.astype(g.dtype)
    return dxr.reshape(xhat.shape), dscale, dbias


group_norm_core.defvjp(_gn_fwd, _gn_bwd)


class GroupNormNCDHW(nn.Module):
    """torch nn.GroupNorm on (B, C, D, H, W) via group_norm_core (memory-lean
    custom VJP; fp32 statistics, eps 1e-5)."""

    num_groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_core(x, scale, bias, self.num_groups).astype(self.dtype)

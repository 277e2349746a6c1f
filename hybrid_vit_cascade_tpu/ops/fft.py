"""3D FFT helpers for the frequency-domain losses.

Matches loss_multiscale.py:191-236 (radial high-frequency mask, r > min/4) and
model_direct128_h200.py:76-107 (focal frequency reweighting). FFTs run in
fp32 via XLA; the mask is a compile-time constant folded per shape.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def fft_magnitude_3d(x: jnp.ndarray) -> jnp.ndarray:
    """|FFT3(x)| over the three trailing axes, computed in fp32."""
    return jnp.abs(jnp.fft.fftn(x.astype(jnp.float32), axes=(-3, -2, -1)))


@functools.lru_cache(maxsize=None)
def _high_freq_mask_np(d: int, h: int, w: int) -> np.ndarray:
    """1.0 where the unshifted-spectrum distance from (D/2,H/2,W/2) > min/4.

    The reference builds this mask on the *unshifted* FFT layout
    (loss_multiscale.py:216-230) — reproduced verbatim.
    """
    radius = min(d, h, w) // 4
    dd = np.arange(d, dtype=np.float32) - d // 2
    hh = np.arange(h, dtype=np.float32) - h // 2
    ww = np.arange(w, dtype=np.float32) - w // 2
    dist = np.sqrt(
        dd[:, None, None] ** 2 + hh[None, :, None] ** 2 + ww[None, None, :] ** 2
    )
    return (dist > radius).astype(np.float32)


def high_freq_mask(shape_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """(D, H, W) high-frequency mask as a jnp constant."""
    return jnp.asarray(_high_freq_mask_np(*[int(s) for s in shape_dhw]))

"""3D FFT helpers for the frequency-domain losses.

Matches loss_multiscale.py:191-236 (radial high-frequency mask, r > min/4) and
model_direct128_h200.py:76-107 (focal frequency reweighting). FFTs run in
fp32 via XLA; the mask is a compile-time constant folded per shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fft_magnitude_3d(x: jnp.ndarray) -> jnp.ndarray:
    """|FFT3(x)| over the three trailing axes, computed in fp32."""
    from ..parallel import gather_model_axis

    x = gather_model_axis(x.astype(jnp.float32))  # see rfft_magnitude_3d
    return jnp.abs(jnp.fft.fftn(x, axes=(-3, -2, -1)))


def rfft_magnitude_3d(x: jnp.ndarray) -> jnp.ndarray:
    """|FFT3(x)| on the half spectrum (..., D, H, W//2+1) of a REAL input.

    Real-input FFTs are conjugate-symmetric (|F(k)| = |F(-k)|), so the
    magnitudes the losses consume are fully determined by the rfft half
    spectrum — half the FFT work and elementwise traffic of fft_magnitude_3d
    at 256³. Use together with half_spectrum_multiplicity to reproduce
    full-spectrum sums/means exactly.
    """
    # Replicate any 'model'-axis spatial sharding first: XLA CPU's FFT thunk
    # requires a dim0-major operand layout (fft_thunk.cc RET_CHECK), which a
    # spatially sharded FFT operand violates. No-op on a pure-DP mesh.
    from ..parallel import gather_model_axis

    x = gather_model_axis(x.astype(jnp.float32))
    return jnp.abs(jnp.fft.rfftn(x, axes=(-3, -2, -1)))


@functools.lru_cache(maxsize=None)
def _half_mult_np(w: int) -> np.ndarray:
    """Multiplicity of each kept W-frequency bin when summing a conjugate-
    symmetric quantity over the FULL cube from the rfft half spectrum:
    bins 0 (and W/2 for even W) are self-conjugate (count once), every other
    kept bin stands for itself and its dropped mirror (count twice)."""
    wh = w // 2 + 1
    mult = np.full((wh,), 2.0, np.float32)
    mult[0] = 1.0
    if w % 2 == 0:
        mult[w // 2] = 1.0
    return mult


def half_spectrum_multiplicity(shape_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """(1, 1, W//2+1) full-cube multiplicity weights for the rfft layout."""
    return jnp.asarray(_half_mult_np(int(shape_dhw[-1])))[None, None, :]


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


def high_freq_mask_half(shape_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """The high-frequency mask restricted to the rfft half spectrum
    (D, H, W//2+1). The reference's mask (distance from the center *index*
    D//2 on the unshifted layout) is invariant under the conjugate map
    k → (-k) mod N — |((N-k) mod N) - N//2| = |k - N//2| for every k, with
    k=0 mapping to itself — so masking half bins with their multiplicity
    reproduces the full-cube masked sums exactly."""
    d, h, w = (int(s) for s in shape_dhw)
    return jnp.asarray(_high_freq_mask_np(d, h, w)[:, :, : w // 2 + 1])

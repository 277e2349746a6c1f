"""Multi-head attention core: jnp reference path + Pallas flash path.

The reference materializes full (Nq, Nk) score matrices
(models/vit_components.py:46-51,103-113). At stage 3 the voxel-token count is
32,768 — a 32768² fp32 score map is 4.3 GB per (batch, head), which is why the
TPU build streams K/V blockwise instead (Pallas flash attention,
ops/pallas/flash_attention.py). The jnp path here is the numerical reference
(exact softmax, fp32 accumulation) used for small token counts and for golden
tests of the kernel.

Shapes: q (B, H, Nq, Dh), k/v (B, H, Nk, Dh) → (B, H, Nq, Dh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Token-count threshold above which the Pallas kernel is preferred on TPU.
_FLASH_MIN_TOKENS = 2048


def _reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                         return_probs: bool = False):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    return (out, probs) if return_probs else out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
    return_probs: bool = False,
):
    """Softmax attention. impl: 'auto' | 'flash' | 'xla'.

    'auto' uses the Pallas flash kernel on TPU backends once the score matrix
    is big enough to be memory-bound, otherwise plain XLA.

    return_probs=True additionally returns the fp32 attention probabilities
    (B, H, Nq, Nk) — the reference's `store_attention` diagnostic capture
    (vit_components.py:63-108). Forces the XLA path (a streamed kernel never
    materializes the score map), so restrict to small token counts.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    use_flash = False
    if impl == "flash":
        use_flash = True
    elif impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        use_flash = on_tpu and (q.shape[-2] * k.shape[-2] >= _FLASH_MIN_TOKENS ** 2)
        if use_flash:
            # pallas_call is opaque to the XLA partitioner: with an ambient
            # model axis (sequence-sharded tokens) route through XLA so GSPMD
            # can partition the matmuls and insert the K/V all-gather.
            from ..parallel import model_axis_size

            use_flash = model_axis_size() <= 1

    if use_flash and not return_probs:
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _reference_attention(q, k, v, scale, return_probs=return_probs)

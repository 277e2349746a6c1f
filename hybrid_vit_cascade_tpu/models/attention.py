"""Multi-head self/cross attention modules (reference: models/vit_components.py).

Differences from the reference, by design:
  * The score matrix is never materialized for large token counts — the
    compute routes through ops.attention (Pallas flash kernel on TPU).
  * Attention-probability dropout (vit_components.py:48,110) is replaced by
    dropout on the attention *output* at the same rate: prob-dropout is
    incompatible with blockwise-streamed softmax, and output dropout is the
    standard flash-attention substitution.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import Dtype, FastDropout, torch_default_init


def collect_attention_maps(intermediates) -> dict:
    """Gather cross-attention probabilities sown by MultiHeadCrossAttention
    into the dict DiagnosticLosses consumes: run
    `out, st = model.apply(vars, x, mutable=["intermediates"])`, then
    `collect_attention_maps(st["intermediates"])` →
    {"cross_attention": (B, H, N, M) mean over blocks} (empty dict when no
    module captured)."""
    import jax as _jax

    maps = [
        leaf
        for path, leaf in _jax.tree_util.tree_flatten_with_path(intermediates)[0]
        if any(getattr(k, "key", None) == "attention_weights" for k in path)
    ]
    if not maps:
        return {}
    same = [m for m in maps if m.shape == maps[0].shape]
    return {"cross_attention": sum(same) / len(same)}


class MultiHeadSelfAttention(nn.Module):
    """Fused-qkv softmax MHSA over voxel tokens (vit_components.py:13-57)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, E = x.shape
        H = self.num_heads
        Dh = E // H
        qkv = nn.Dense(3 * E, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)  # (3, B, H, N, Dh)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = dot_product_attention(q, k, v, scale=Dh ** -0.5, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, E)
        out = FastDropout(self.dropout)(out, deterministic=not train)
        out = nn.Dense(E, kernel_init=torch_default_init, dtype=self.dtype)(out)
        out = FastDropout(self.dropout)(out, deterministic=not train)
        return out


class MultiHeadCrossAttention(nn.Module):
    """Q from voxel tokens, K/V from X-ray feature tokens
    (vit_components.py:60-119). N_q up to 32,768 and N_kv up to 262,144 in the
    stage-3 configuration — the flash path streams K/V blockwise.

    store_attention=True sows the fp32 attention probabilities (B, H, N, M)
    into the 'intermediates' collection (the reference's
    `store_attention`/`attention_weights` capture, vit_components.py:63-108),
    feeding DiagnosticLosses' cross-attention entropy/sparsity terms. Forces
    the score-materializing XLA path — use at stage-1 token counts."""

    embed_dim: int
    context_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    store_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, E = x.shape
        M = context.shape[1]
        H = self.num_heads
        Dh = E // H
        q = nn.Dense(E, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype, name="q")(x)
        kv = nn.Dense(2 * E, use_bias=False, kernel_init=torch_default_init, dtype=self.dtype, name="kv")(context)
        q = q.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        kv = kv.reshape(B, M, 2, H, Dh).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        if self.store_attention:
            out, probs = dot_product_attention(
                q, k, v, scale=Dh ** -0.5, impl="xla", return_probs=True
            )
            # detached, like the reference's .detach() capture (:107-108)
            self.sow("intermediates", "attention_weights", jax.lax.stop_gradient(probs))
        else:
            out = dot_product_attention(q, k, v, scale=Dh ** -0.5, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, E)
        out = FastDropout(self.dropout)(out, deterministic=not train)
        out = nn.Dense(E, kernel_init=torch_default_init, dtype=self.dtype)(out)
        out = FastDropout(self.dropout)(out, deterministic=not train)
        return out

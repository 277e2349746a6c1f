"""Head-sharded (tensor-parallel) flash attention under shard_map.

Runs on the CPU×8 virtual-device harness (conftest): the Pallas kernel
executes in interpret mode per shard — the same code path real multi-chip
TPU takes, modulo compilation. Asserts numerical equality with the exact
unsharded softmax reference, forward and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_vit_cascade_tpu.ops.attention import (
    _head_shardable,
    _reference_attention,
    dot_product_attention,
)
from hybrid_vit_cascade_tpu.parallel import data_sharding, make_mesh


def _qkv(rng, b=4, h=4, nq=96, nk=96, d=32):
    q = rng.standard_normal((b, h, nq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, nk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, nk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestHeadShardedFlash:
    def test_forward_matches_unsharded(self, rng):
        q, k, v = _qkv(rng)
        scale = 32 ** -0.5
        want = _reference_attention(q, k, v, scale)
        mesh = make_mesh(data=4, model=2)

        @jax.jit
        def f(q, k, v):
            return dot_product_attention(q, k, v, scale, impl="flash_sharded")

        with mesh:
            got = f(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_forward_data_sharded_batch(self, rng):
        """Batch arriving DP-sharded (the trainer's layout) stays correct."""
        q, k, v = _qkv(rng, b=8)
        scale = 32 ** -0.5
        want = _reference_attention(q, k, v, scale)
        mesh = make_mesh(data=2, model=4)
        dsh = data_sharding(mesh)
        qs, ks, vs = (jax.device_put(x, dsh) for x in (q, k, v))

        @jax.jit
        def f(q, k, v):
            return dot_product_attention(q, k, v, scale, impl="flash_sharded")

        with mesh:
            got = f(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_unsharded(self, rng):
        q, k, v = _qkv(rng, b=2, h=4, nq=64, nk=64)
        scale = 32 ** -0.5
        mesh = make_mesh(data=2, model=4)

        def loss_ref(q, k, v):
            return (_reference_attention(q, k, v, scale) ** 2).sum()

        def loss_sharded(q, k, v):
            out = dot_product_attention(q, k, v, scale, impl="flash_sharded")
            return (out ** 2).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        with mesh:
            g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
        for a, b, name in zip(g_sh, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=f"d{name}")

    def test_auto_falls_back_when_not_divisible(self, rng):
        """H=3 doesn't divide model=2: 'auto' must not crash (XLA path)."""
        q, k, v = _qkv(rng, b=4, h=3, nq=64, nk=64)
        mesh = make_mesh(data=4, model=2)
        assert not _head_shardable(q, mesh)
        with mesh:
            got = jax.jit(lambda q, k, v: dot_product_attention(
                q, k, v, impl="auto"))(q, k, v)
        want = _reference_attention(q, k, v, 32 ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_seq_sharded_forward_and_grads(self, rng):
        """H=3 doesn't divide model=2 → the query-sequence-sharded path
        (k/v replicated into the map; dk/dv psum on the backward transpose)."""
        from hybrid_vit_cascade_tpu.ops.attention import _seq_shardable

        q, k, v = _qkv(rng, b=4, h=3, nq=64, nk=80)
        scale = 32 ** -0.5
        mesh = make_mesh(data=4, model=2)
        assert _seq_shardable(q, mesh)

        def loss_ref(q, k, v):
            return (_reference_attention(q, k, v, scale) ** 2).sum()

        def loss_sh(q, k, v):
            out = dot_product_attention(q, k, v, scale, impl="flash_sharded")
            return (out ** 2).sum()

        want = _reference_attention(q, k, v, scale)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        with mesh:
            got = jax.jit(lambda a, b, c: dot_product_attention(
                a, b, c, scale, impl="flash_sharded"))(q, k, v)
            g_sh = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        for a, b, name in zip(g_sh, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=f"d{name}")

    def test_flash_sharded_requires_mesh(self, rng):
        q, k, v = _qkv(rng)
        with pytest.raises(ValueError, match="flash_sharded needs"):
            dot_product_attention(q, k, v, impl="flash_sharded")

    def test_flash_sharded_rejects_return_probs(self, rng):
        """A streamed sharded kernel can never materialize the probability
        map; combining the two must be a loud error, not a silently wrong
        return type (round-2 ADVICE)."""
        q, k, v = _qkv(rng)
        mesh = make_mesh(data=4, model=2)
        with mesh, pytest.raises(ValueError, match="return_probs"):
            dot_product_attention(q, k, v, impl="flash_sharded",
                                  return_probs=True)

    def test_sharded_dispatch_selection(self, rng):
        """The trace-time head→seq→None selection the on-TPU 'auto' route
        uses (unreachable on the CPU harness through 'auto' itself)."""
        from hybrid_vit_cascade_tpu.ops.attention import _sharded_dispatch

        mesh = make_mesh(data=4, model=2)
        q_head, _, _ = _qkv(rng, b=4, h=4, nq=64)      # H % mp == 0
        q_seq, _, _ = _qkv(rng, b=4, h=3, nq=64)       # only Nq % mp == 0
        q_none, _, _ = _qkv(rng, b=4, h=3, nq=63)      # neither divides
        assert _sharded_dispatch(q_head, mesh) == "head"
        assert _sharded_dispatch(q_seq, mesh) == "seq"
        assert _sharded_dispatch(q_none, mesh) is None
        assert _sharded_dispatch(q_head, None) is None

    def test_forced_flash_falls_back_to_xla_when_unshardable(self, rng):
        """impl='flash' under a model>1 mesh with neither H nor Nq divisible
        must route to XLA attention (an unsharded pallas_call is opaque to
        GSPMD), exercising the model>1 dispatch block off-TPU."""
        q, k, v = _qkv(rng, b=4, h=3, nq=63, nk=64)
        mesh = make_mesh(data=4, model=2)
        want = _reference_attention(q, k, v, 32 ** -0.5)
        with mesh:
            got = jax.jit(lambda a, b, c: dot_product_attention(
                a, b, c, impl="flash"))(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_mhsa_module_grads_match_xla(self, rng):
        """The flax MHSA module (QKV projection → attention → out projection)
        trained with head-sharded flash must produce the same loss and
        parameter grads as the XLA impl — the full tensor-parallel layer as
        the real models run it."""
        from hybrid_vit_cascade_tpu.models.attention import MultiHeadSelfAttention

        x = jnp.asarray(rng.standard_normal((4, 64, 32)), jnp.float32)
        mesh = make_mesh(data=2, model=4)

        def run(impl, in_mesh):
            import contextlib

            m = MultiHeadSelfAttention(embed_dim=32, num_heads=4, dropout=0.0,
                                       attn_impl=impl)

            def loss(params):
                return (m.apply({"params": params}, x) ** 2).mean()

            with (mesh if in_mesh else contextlib.nullcontext()):
                variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
                return jax.jit(jax.value_and_grad(loss))(variables["params"])

        loss_ref, g_ref = run("xla", in_mesh=False)
        loss_sh, g_sh = run("flash_sharded", in_mesh=True)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g_sh, g_ref)

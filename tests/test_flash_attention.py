"""Flash-attention kernel vs exact-softmax reference (fwd + grads).

On CPU the kernel runs in Pallas interpret mode — same code path as the TPU
kernel modulo compilation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_vit_cascade_tpu.ops.attention import _reference_attention
from hybrid_vit_cascade_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(rng, b=1, h=2, nq=192, nk=160, d=32):
    q = rng.standard_normal((b, h, nq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, nk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, nk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    @pytest.mark.parametrize("nq,nk,d", [(128, 128, 32), (192, 160, 64), (64, 256, 48)])
    def test_forward_matches_reference(self, rng, nq, nk, d):
        q, k, v = _qkv(rng, nq=nq, nk=nk, d=d)
        scale = d ** -0.5
        want = _reference_attention(q, k, v, scale)
        got = flash_attention(q, k, v, scale, block_q=64, block_kv=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_forward_unpadded_blocks(self, rng):
        # sizes that don't divide the block sizes exercise the masking path
        q, k, v = _qkv(rng, nq=100, nk=130, d=24)
        want = _reference_attention(q, k, v, 24 ** -0.5)
        got = flash_attention(q, k, v, block_q=64, block_kv=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference(self, rng):
        q, k, v = _qkv(rng, nq=96, nk=80, d=32)
        scale = 32 ** -0.5

        def loss_ref(q, k, v):
            return (_reference_attention(q, k, v, scale) ** 2).sum()

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, scale, block_q=32, block_kv=32) ** 2).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4, err_msg=f"d{name}"
            )

    def test_gradients_nondivisible_blocks(self, rng):
        """kv length that doesn't divide block_kv exercises the backward
        kernel's masking (dq) and sliced-garbage-row (dk/dv) paths."""
        q, k, v = _qkv(rng, nq=72, nk=90, d=32)
        scale = 32 ** -0.5

        g_ref = jax.grad(lambda *a: (_reference_attention(*a, scale) ** 2).sum(), (0, 1, 2))(q, k, v)
        g_flash = jax.grad(
            lambda *a: (flash_attention(*a, scale, block_q=32, block_kv=32) ** 2).sum(), (0, 1, 2)
        )(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4, err_msg=f"d{name}"
            )

    def test_pallas_bwd_matches_jnp_oracle(self, rng):
        """The Pallas backward vs the retired jnp blockwise backward on
        identical padded residuals."""
        from hybrid_vit_cascade_tpu.ops.pallas.flash_attention import (
            _bwd_blockwise,
            _bwd_pallas,
            _flash_fwd_core,
        )

        q, k, v = _qkv(rng, nq=64, nk=96, d=32)
        qf, kf, vf = (x.reshape(2, *x.shape[2:]) for x in (q, k, v))
        out, (qp, kp, vp, outp, lse, bq, bkv, kv_len) = _flash_fwd_core(
            qf * jnp.asarray(32 ** -0.5), kf, vf, 1.0, 32, 32
        )
        do = jnp.asarray(np.random.default_rng(1).standard_normal(outp.shape), jnp.float32)
        want = _bwd_blockwise(qp, kp, vp, outp, lse, do, 1.0, kv_len, bq, bkv)
        got = _bwd_pallas(qp, kp, vp, outp, lse, do, kv_len, bq, bkv, interpret=True)
        for a, b, name in zip(got, want, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
            )

    def test_fused_bwd_matches_split_kernels(self, rng):
        """The fused (single-pass) backward vs the split dq/dkv kernels on
        identical padded residuals, including padded q rows (nq=72 → 96 with
        lse=+inf sentinels) and masked kv columns (nk=90 → 96)."""
        from hybrid_vit_cascade_tpu.ops.pallas.flash_attention import (
            _bwd_pallas,
            _bwd_pallas_fused,
            _flash_fwd_core,
        )

        q, k, v = _qkv(rng, nq=72, nk=90, d=32)
        qf, kf, vf = (x.reshape(2, *x.shape[2:]) for x in (q, k, v))
        out, (qp, kp, vp, outp, lse, bq, bkv, kv_len) = _flash_fwd_core(
            qf * jnp.asarray(32 ** -0.5), kf, vf, 1.0, 32, 32
        )
        nq_pad, nk_pad = 96, 96
        qpad = jnp.pad(qp, ((0, 0), (0, nq_pad - qp.shape[1]), (0, 0)))
        kpad = jnp.pad(kp, ((0, 0), (0, nk_pad - kp.shape[1]), (0, 0)))
        vpad = jnp.pad(vp, ((0, 0), (0, nk_pad - vp.shape[1]), (0, 0)))
        opad = jnp.pad(outp, ((0, 0), (0, nq_pad - outp.shape[1]), (0, 0)))
        lsep = jnp.pad(lse, ((0, 0), (0, nq_pad - lse.shape[1])), constant_values=1e30)
        do = jnp.asarray(np.random.default_rng(1).standard_normal(opad.shape), jnp.float32)
        want = _bwd_pallas(qpad, kpad, vpad, opad, lsep, do, kv_len, bq, bkv,
                           interpret=True)
        got = _bwd_pallas_fused(qpad, kpad, vpad, opad, lsep, do, kv_len, bq, bkv,
                                interpret=True)
        # The caller slices grads back to (nq, d)/(nk, d), so only the valid
        # region is contractual (the split dkv kernel writes junk into the
        # padded kv rows; the fused one zeroes them).
        valid = (72, kv_len, kv_len)
        for a, b, n, name in zip(got, want, valid, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(a)[:, :n], np.asarray(b)[:, :n],
                rtol=1e-5, atol=1e-5, err_msg=name,
            )
        # Stronger property of the fused kernel: padded kv rows carry exactly
        # zero gradient.
        np.testing.assert_array_equal(np.asarray(got[1])[:, kv_len:], 0.0)
        np.testing.assert_array_equal(np.asarray(got[2])[:, kv_len:], 0.0)

    def test_bf16_inputs(self, rng):
        q, k, v = _qkv(rng, nq=64, nk=64, d=32)
        out = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
        want = _reference_attention(q, k, v, 32 ** -0.5)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
        )

    def test_long_kv_auto_block_upgrade(self, rng, monkeypatch):
        """Default-block calls auto-upgrade tiles when kv is long (the
        stage-3 self-attention shape class). Lower the threshold so the
        interpreted kernel exercises the exact production branch cheaply,
        and assert the upgraded tiling is numerically identical to the
        explicit-block call it replaces."""
        import importlib

        # ops.pallas re-exports a function named flash_attention that shadows
        # the submodule attribute; importlib resolves the module itself
        fa = importlib.import_module("hybrid_vit_cascade_tpu.ops.pallas.flash_attention")

        monkeypatch.setattr(fa, "LONG_KV_THRESHOLD", 256)
        monkeypatch.setattr(fa, "LONG_KV_BLOCK_Q", 128)
        monkeypatch.setattr(fa, "LONG_KV_BLOCK_KV", 256)
        q, k, v = _qkv(rng, nq=256, nk=256, d=32)
        got = fa.flash_attention(q, k, v)  # defaults → upgraded tiles
        want = fa.flash_attention(q, k, v, block_q=128, block_kv=256)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # non-divisible kv must NOT upgrade (mask elision stays static)
        q2, k2, v2 = _qkv(rng, nq=256, nk=250, d=32)
        got2 = fa.flash_attention(q2, k2, v2)
        want2 = _reference_attention(q2, k2, v2, 32 ** -0.5)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-5, atol=2e-5)

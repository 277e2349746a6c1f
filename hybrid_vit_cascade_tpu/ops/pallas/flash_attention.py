"""Blockwise (flash) attention Pallas kernel for TPU.

Replaces the reference's materialized (Nq, Nk) score matrices
(models/vit_components.py:46-51,103-113): at stage 3 the self-attention runs
over 32,768 voxel tokens — a fp32 score map would be 4.3 GB per (batch, head),
far beyond VMEM/HBM budgets, so scores never leave VMEM here.

Forward: online-softmax streaming over K/V blocks. The grid is
(batch·heads, q_blocks, kv_blocks); TPU grid steps run sequentially over the
innermost dimension, so running max/denominator/accumulator live in VMEM
scratch across kv steps (canonical TPU flash pattern). fp32 accumulation,
bf16-friendly inputs, head_dim padded to lane width (128) by the wrapper.

Backward: custom VJP with blockwise recomputation in jnp (double lax.scan over
q/kv blocks) using the saved logsumexp — O(N·d) memory, all-matmul compute
that XLA maps straight onto the MXU. (A hand-written backward kernel is a
later optimization; the forward is the memory-critical half.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at 32,768 tokens / head_dim 32→128: (1024, 1024) runs 1.7×
# faster than (512, 512) (61 ms vs 103 ms, ~18 logical TFLOP/s).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024
LANE = 128
NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, kv_len, block_kv):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_kv, d)
    v = v_ref[0]

    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_kv)

    col = kv_idx * block_kv + lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (block_q, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (block_q, block_kv)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    pv = lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, d)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(safe_l)).astype(lse_ref.dtype)


def _flash_fwd_padded(q, k, v, scale, kv_len, block_q, block_kv, interpret):
    """q (BH, Nq_pad, d), k/v (BH, Nk_pad, d) → (out, lse (BH, Nq_pad, LANE))."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    grid = (BH, nq // block_q, nk // block_kv)

    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, LANE), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, nq, d), q.dtype),
            jax.ShapeDtypeStruct((BH, nq, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _bwd_blockwise(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv):
    """Blockwise-recompute backward in jnp (shapes: (BH, N, d), lse (BH, Nq))."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    f32 = jnp.float32
    q32, k32, v32 = q.astype(f32), k.astype(f32), v.astype(f32)
    do32, out32 = do.astype(f32), out.astype(f32)
    delta = jnp.sum(do32 * out32, axis=-1)  # (BH, Nq)

    nqb = nq // block_q
    nkb = nk // block_kv
    q_blocks = q32.reshape(BH, nqb, block_q, d)
    do_blocks = do32.reshape(BH, nqb, block_q, d)
    lse_blocks = lse.reshape(BH, nqb, block_q)
    delta_blocks = delta.reshape(BH, nqb, block_q)
    k_blocks = k32.reshape(BH, nkb, block_kv, d).transpose(1, 0, 2, 3)
    v_blocks = v32.reshape(BH, nkb, block_kv, d).transpose(1, 0, 2, 3)
    col_base = jnp.arange(block_kv)

    def q_step(carry, qi):
        dk_acc, dv_acc = carry
        qb = q_blocks[:, qi]  # (BH, bq, d)
        dob = do_blocks[:, qi]
        lseb = lse_blocks[:, qi]
        deltab = delta_blocks[:, qi]

        def kv_step(dq_b, inputs):
            kb, vb, ki = inputs  # (BH, bkv, d), scalar
            s = jnp.einsum("bqd,bkd->bqk", qb, kb) * scale
            col = ki * block_kv + col_base
            s = jnp.where(col[None, None, :] < kv_len, s, NEG_INF)
            p = jnp.exp(s - lseb[..., None])  # (BH, bq, bkv)
            dvb = jnp.einsum("bqk,bqd->bkd", p, dob)
            dp = jnp.einsum("bqd,bkd->bqk", dob, vb)
            ds = p * (dp - deltab[..., None])
            dq_b = dq_b + jnp.einsum("bqk,bkd->bqd", ds, kb) * scale
            dkb = jnp.einsum("bqk,bqd->bkd", ds, qb) * scale
            return dq_b, (dkb, dvb)

        dq_b0 = jnp.zeros((BH, block_q, d), f32)
        dq_b, (dk_all, dv_all) = lax.scan(
            kv_step, dq_b0, (k_blocks, v_blocks, jnp.arange(nkb))
        )
        return (dk_acc + dk_all, dv_acc + dv_all), dq_b

    (dk, dv), dq_blocks = lax.scan(
        q_step,
        (jnp.zeros((nkb, BH, block_kv, d), f32), jnp.zeros((nkb, BH, block_kv, d), f32)),
        jnp.arange(nqb),
    )
    dq = dq_blocks.transpose(1, 0, 2, 3).reshape(BH, nq, d)
    dk = dk.transpose(1, 0, 2, 3).reshape(BH, nk, d)
    dv = dv.transpose(1, 0, 2, 3).reshape(BH, nk, d)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, scale, block_q, block_kv):
    out, _ = _flash_fwd_core(q, k, v, scale, block_q, block_kv)
    return out


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _flash_fwd_core(q, k, v, scale, block_q, block_kv):
    """Pads and runs the forward kernel. q (BH, Nq, d)."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    d_pad = _ceil_to(d, LANE)
    bq = min(block_q, _ceil_to(nq, 8))
    bkv = min(block_kv, _ceil_to(nk, 128))
    nq_pad = _ceil_to(nq, bq)
    nk_pad = _ceil_to(nk, bkv)

    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))

    out, lse = _flash_fwd_padded(qp, kp, vp, scale, nk, bq, bkv, interpret=_is_cpu())
    return out[:, :nq, :d], (qp, kp, vp, out, lse[..., 0], bq, bkv, nk)


def _flash_core_fwd(q, k, v, scale, block_q, block_kv):
    out, res = _flash_fwd_core(q, k, v, scale, block_q, block_kv)
    return out, res


def _flash_core_bwd(scale, block_q, block_kv, res, g):
    qp, kp, vp, outp, lse, bq, bkv, kv_len = res
    nq = g.shape[1]
    d = g.shape[2]
    gp = jnp.pad(g, ((0, 0), (0, qp.shape[1] - nq), (0, qp.shape[2] - d)))
    dq, dk, dv = _bwd_blockwise(qp, kp, vp, outp, lse, gp, scale, kv_len, bq, bkv)
    return (
        dq[:, :nq, :d].astype(qp.dtype),
        dk[:, :kv_len, :d].astype(kp.dtype),
        dv[:, :kv_len, :d].astype(vp.dtype),
    )


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
) -> jnp.ndarray:
    """Softmax attention without materializing scores.

    q: (B, H, Nq, Dh); k, v: (B, H, Nk, Dh) → (B, H, Nq, Dh).
    Runs interpreted on CPU (tests), compiled on TPU.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, H, nq, d = q.shape
    nk = k.shape[2]
    qf = q.reshape(B * H, nq, d)
    kf = k.reshape(B * H, nk, d)
    vf = v.reshape(B * H, nk, d)
    out = _flash_core(qf, kf, vf, float(scale), block_q, block_kv)
    return out.reshape(B, H, nq, d)

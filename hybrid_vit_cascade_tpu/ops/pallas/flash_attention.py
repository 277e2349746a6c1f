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

Backward: custom VJP running two Pallas kernels (dq streaming kv; dk/dv
streaming q in the same score orientation) with all (block_q, block_kv)
temporaries VMEM-resident — the earlier jnp blockwise path (kept as the test
oracle) materialized p/dp/ds through HBM between einsums and was HBM-bound.

Perf model (v5e, 8 heads × 32,768 tokens × d=32): the d=32→128 lane padding
costs an unavoidable 4× on the MXU (every output scalar needs only 32 MACs
while the 128×128 systolic array applies 128 contraction rows per column —
no head-packing layout beats this, block-diagonal packings included). The
padded-MXU floor is ~22 ms/layer; the kernel is therefore VPU-bound, and the
round-2 optimizations target VPU ops/score-element: scale pre-folded into q,
static mask elision on exactly-divisible shapes, and the softmax denominator
extracted from the PV matmul via a ones-lane in the padded V (the lane-tree
jnp.sum was one of the most expensive VPU steps).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at 8 heads × 32,768 tokens / d=32 (round 2): fwd
# (1024, 2048) 54.5 ms > (1024, 1024) 56.4 > (512, 2048) 56.0 > (512, 1024)
# 61.7; (2048, ·) exceeds the 16 MB scoped-VMEM limit. For reference, jax's
# production pallas kernel (jax.experimental.pallas.ops.tpu.flash_attention)
# measures 60.6 ms at the same shape/blocks — this kernel is ~10% faster.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 2048
# Long-kv upgrade (requires the raised scoped-VMEM limit below): the wave-9
# sweep at 8×32,768×d32 with vmem_limit=100 MB measured (2048,4096) 50.2 ms
# < (4096,2048) 50.6 < (2048,2048) 51.3 < (1024,4096) 51.6 < (1024,2048)
# 51.8 — fewer online-softmax correction passes per score row. The hot
# cross-attention (32,768 q × 4,096 kv) showed no gain (28.4 ms stays best
# at the defaults), so the upgrade keys on kv length.
LONG_KV_THRESHOLD = 32768
LONG_KV_BLOCK_Q = 2048
LONG_KV_BLOCK_KV = 4096
# The backward kernels keep three (block_q, block_kv) fp32 temporaries live;
# (1024, 1024) is the largest VMEM-feasible backward tile.
BWD_BLOCK_Q = 1024
BWD_BLOCK_KV = 1024
# Fused backward (round 4): ONE kernel produces dq/dk/dv per (kv, q) block
# pair, so the score recompute s=qkᵀ, the probability exp2, and the dp=do·vᵀ
# matmul run once instead of twice (the split dq / dkv kernels redo all
# three): 7 → 5 MXU passes and 2 → 1 exp/ds VPU passes over the score
# volume. dq is emitted as per-kv-block partials summed by XLA outside the
# kernel (the splash-attention fused-backward pattern — unique output block
# per grid step, no read-modify-write hazards); dk/dv accumulate in VMEM
# scratch across the inner q sweep. Opt out with HVC_FLASH_FUSED_BWD=0.
FUSED_BWD = os.environ.get("HVC_FLASH_FUSED_BWD", "1") != "0"
# Larger kv blocks shrink the dq-partials residency (nk/block_kv copies of
# dq): (1024, 2048) keeps the fp32 temporaries (s/p, dp, ds) at 24 MB —
# within the raised vmem_limit_bytes below — and the partials at 2 copies
# per 4096 kv (hot cross-attn) / 16 per 32768 (hot self-attn, ~2.1 GB).
BWD_FUSED_BLOCK_Q = 1024
BWD_FUSED_BLOCK_KV = 2048
BWD_FUSED_VMEM_LIMIT = 100 * 1024 * 1024
# Forward scoped-VMEM limit. 0 = compiler default (16 MB), which capped the
# round-2 block sweep at (1024, 2048); a raised limit admits (2048, ·) /
# (·, 4096) tiles whose fp32 score block alone is 8-16 MB. Sweepable via
# HVC_FLASH_FWD_VMEM (bytes) before import, or by setting the module attr.
FWD_VMEM_LIMIT = int(os.environ.get("HVC_FLASH_FWD_VMEM", "0"))
LANE = 128
NEG_INF = -1e30
# Base-2 softmax: log2(e) is folded into the q pre-scale, so the kernels run
# exp2 instead of exp (the VPU's exp is exp2 plus a multiply; the multiply
# rides the existing q-scale for free). Normalized probabilities are
# IDENTICAL: exp2((s - m)·log2e) = exp(s - m). lse is stored in base-2 and
# dk picks up one ln2 factor outside the kernel (q absorbed log2e, k didn't).
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr, *, kv_len, block_kv,
                mask_kv, sum_lane):
    """VPU-lean online-softmax step. Three round-2 optimizations (the kernel
    is VPU-bound: ~7 VPU ops/score element vs 2.7 µs of MXU work per step):

    - `scale` is folded into q by the wrapper (saves a full-block multiply);
    - `mask_kv` is a STATIC bool — the hot configs (32,768 voxel tokens,
      1024-blocks) are exactly divisible, so the per-step iota+where
      (2 ops/element) compiles away entirely;
    - the softmax denominator comes out of the PV matmul: lane `sum_lane` of
      the padded V is 1.0, so pv[:, sum_lane] = Σₖ p — the lane-tree
      reduction (jnp.sum) rides the MXU's already-padded lanes for free, and
      the separate l scratch disappears (acc's ones-lane IS l, since both
      follow the same alpha-correction recurrence).
    """
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d), pre-scaled
    k = k_ref[0]  # (block_kv, d)
    v = v_ref[0]  # (block_kv, d) with ones in lane sum_lane

    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_kv)

    if mask_kv:
        col = kv_idx * block_kv + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    # NOTE: a bf16 softmax chain (cast s → bf16 before max/sub/exp) was tried
    # and measured SLOWER (67.9 vs 56.4 ms at 8×32k×d32) — the VPU does not
    # pack bf16 2× here and the casts add work. Keep fp32.
    m_prev = m_scr[:, :1]  # (block_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)  # (block_q, block_kv); base-2 (q pre-scaled by log2e)

    pv = lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, d) — pv[:, sum_lane] = row-sum of p
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(kv_idx == n_kv - 1)
    def _finish():
        l = acc_scr[:, sum_lane : sum_lane + 1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log2(safe_l)).astype(lse_ref.dtype)  # base-2


def _flash_fwd_padded(q, k, v, kv_len, block_q, block_kv, sum_lane, interpret):
    """q (BH, Nq_pad, d) pre-scaled, k/v (BH, Nk_pad, d), v's `sum_lane` lane
    is 1.0 → (out, lse (BH, Nq_pad, LANE))."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    grid = (BH, nq // block_q, nk // block_kv)

    kernel = functools.partial(_fwd_kernel, kv_len=kv_len, block_kv=block_kv,
                               mask_kv=(nk != kv_len), sum_lane=sum_lane)
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
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # wide tiles ((2048,·)/(·,4096)) exceed the 16 MB compiler
            # default; raise to the same scoped budget the fused bwd uses
            **({"vmem_limit_bytes": FWD_VMEM_LIMIT} if FWD_VMEM_LIMIT
               else ({"vmem_limit_bytes": BWD_FUSED_VMEM_LIMIT}
                     if (block_q > 1024 or block_kv > 2048) else {})),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref, dq_scr, *,
                   kv_len, block_kv, mask_kv):
    """dq for one q block, streaming kv blocks (innermost grid dim).
    stats lanes: 0 = lse, 1 = delta (Σ_d do·out per row)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = stats_ref[0][:, 0:1]
    delta = stats_ref[0][:, 1:2]

    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask_kv:
        col = kv_idx * block_kv + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse)  # base-2 lse
    dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr):
    """dk/dv for one kv block, streaming q blocks (innermost grid dim). Same
    (bq, bkv) score orientation as the dq kernel, so lse/delta broadcast over
    lanes without transposes; the contractions over the q (sublane) dim map
    onto the MXU via dot_general. Padded kv rows need no masking: their
    garbage dk/dv land in rows the wrapper slices away."""
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = stats_ref[0][:, 0:1]
    delta = stats_ref[0][:, 1:2]

    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse)  # (bq, bkv); base-2 lse
    pb = p.astype(do.dtype)
    dv_scr[:] = dv_scr[:] + lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, d)
    dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_scr[:] = dk_scr[:] + lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, d)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_pallas(qp, kp, vp, outp, lse, gp, kv_len, block_q, block_kv, interpret):
    """Pallas backward: all (bq, bkv) temporaries stay in VMEM — the jnp
    blockwise path materializes p/dp/ds through HBM between einsums (~20 MB
    of traffic per block pair), which made the backward HBM-bound."""
    BH, nq, d = qp.shape
    nk = kp.shape[1]
    delta = jnp.sum(gp.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1)  # (BH, nq)
    stats = jnp.stack([lse, delta], axis=-1)  # (BH, nq, 2)

    grid_dq = (BH, nq // block_q, nk // block_kv)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, kv_len=kv_len, block_kv=block_kv,
                          mask_kv=(nk != kv_len)),
        grid=grid_dq,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 2), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, nq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, stats)

    grid_dkv = (BH, nk // block_kv, nq // block_q)
    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=grid_dkv,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 2), lambda b, ki, qi: (b, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, nk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, stats)
    return dq, dk, dv


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref, dk_ref,
                      dv_ref, dk_scr, dv_scr, dq_scr, *, kv_len, block_kv,
                      mask_kv):
    """dq/dk/dv from ONE pass over the (kv, q) block grid (qi innermost).

    s, p, and dp are computed once per block pair (the split kernels compute
    each twice). dk/dv accumulate in VMEM scratch across the q sweep and
    flush when the kv block retires. dq accumulates across the OUTER kv dim
    in a per-q-block slot of `dq_scr` — TPU grid steps run sequentially, so
    the scratch persists across the whole (kv, q) sweep; each step stores the
    running sum to the (revisited) dq output block and the LAST kv pass's
    flush wins. The earlier per-kv-block-partials scheme (XLA-summed outside)
    cost ~55 ms/step of reduce+relayout glue at the stage-3 hot shape: the
    8 layers' (nkb, BH, nq, 128) fp32 partials are 2.1 GB each.

    Padded q rows carry lse=+inf → p = 0, padded kv columns are masked to
    -inf when `mask_kv` → p = ds = 0, so no padding contributes to any grad.
    """
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = stats_ref[0][:, 0:1]
    delta = stats_ref[0][:, 1:2]

    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask_kv:
        col = pl.program_id(1) * block_kv + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse)  # (bq, bkv); base-2 lse
    pb = p.astype(do.dtype)
    dv_c = lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, d)
    dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dsb = ds.astype(q.dtype)
    dk_c = lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, d)
    dq_c = lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, d)
    acc = jnp.where(ki == 0, dq_c, dq_scr[qi] + dq_c)
    dq_scr[qi] = acc
    # Store every step: intermediate flushes of this revisited block carry
    # partial sums, the final (ki = nkb-1) flush lands last in grid order.
    dq_ref[0] = acc.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = dk_c
        dv_scr[:] = dv_c

    @pl.when(qi != 0)
    def _acc():
        dk_scr[:] = dk_scr[:] + dk_c
        dv_scr[:] = dv_scr[:] + dv_c

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_pallas_fused(qp, kp, vp, outp, lse, gp, kv_len, block_q, block_kv,
                      interpret):
    """Fused backward dispatch: grid (BH, kv_blocks, q_blocks), dq
    accumulated in a (q_blocks, block_q, d) VMEM scratch across the outer kv
    sweep (16.7 MB fp32 at the stage-3 hot shape — sequential TPU grid steps
    make the read-modify-write race-free)."""
    BH, nq, d = qp.shape
    nk = kp.shape[1]
    delta = jnp.sum(gp.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1)  # (BH, nq)
    stats = jnp.stack([lse, delta], axis=-1)  # (BH, nq, 2)

    nkb = nk // block_kv
    nqb = nq // block_q
    grid = (BH, nkb, nqb)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, kv_len=kv_len, block_kv=block_kv,
                          mask_kv=(nk != kv_len)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 2), lambda b, ki, qi: (b, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, nq, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, nk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((nqb, block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=BWD_FUSED_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, stats)
    return dq, dk, dv


def _bwd_blockwise(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv):
    """Blockwise-recompute backward in jnp (shapes: (BH, N, d), lse (BH, Nq)).

    Superseded by _bwd_pallas on the hot path; kept as the numerical oracle
    (tests/test_flash_attention.py) — pass scale=1.0 when q is pre-scaled.
    Base-2 semantics like the kernels: q pre-scaled by log2e, lse in base-2,
    and the caller applies the ln2 factor to dk."""
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
            p = jnp.exp2(s - lseb[..., None])  # (BH, bq, bkv); base-2 lse
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
    """Pads and runs the forward kernel. q (BH, Nq, d); `scale` is expected
    to be pre-folded into q by the caller (1.0 here) but is still honored."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    # d+1: the softmax row-sum needs one spare padding lane in V (free for
    # the model's d ∈ {32, 64}; lane-aligned d pays one extra 128-group)
    d_pad = _ceil_to(d + 1, LANE)
    bq = min(block_q, _ceil_to(nq, 8))
    bkv = min(block_kv, _ceil_to(nk, 128))
    nq_pad = _ceil_to(nq, bq)
    nk_pad = _ceil_to(nk, bkv)

    # base-2 softmax: log2(e) folds into the (single) q pre-multiply
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    qp = jnp.pad(qs, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    vp = vp.at[:, :, d].set(jnp.asarray(1.0, vp.dtype))  # row-sum lane

    out, lse = _flash_fwd_padded(qp, kp, vp, nk, bq, bkv, d, interpret=_is_cpu())
    out = out[:, :nq, :d]
    # Residuals are saved UNPADDED (d=32 pads 4× to the 128 lane width; at
    # 8×32,768×32 the padded set is ~270 MB vs ~68 MB). The backward re-pads —
    # a few cheap copies — so keeping attention outside a remat region (the
    # vit3d remat_mode='mlp' path) stays affordable at stage-3 sizes.
    return out, (qs, k, v, out, lse[:, :nq, 0], bq, bkv, nk)


def _flash_core_fwd(q, k, v, scale, block_q, block_kv):
    out, res = _flash_fwd_core(q, k, v, scale, block_q, block_kv)
    return out, res


def _flash_core_bwd(scale, block_q, block_kv, res, g):
    # NOTE: the saved q is PRE-SCALED (fwd folds `scale` into q), so the
    # in-kernel math is scale-free; dq w.r.t. the original q needs one
    # final ×scale (a no-op for the public wrapper, which passes 1.0).
    qs, k, v, out, lse, bq, bkv, kv_len = res
    BH, nq, d = qs.shape
    d_pad = _ceil_to(d + 1, LANE)
    nq_pad = _ceil_to(nq, bq)
    nk_pad = _ceil_to(kv_len, bkv)
    qp = jnp.pad(qs, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - kv_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - kv_len), (0, d_pad - d)))
    outp = jnp.pad(out, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    # padded q rows: s=0 and big lse → p=exp(-lse)=0, so their dk/dv
    # contributions vanish exactly
    lsep = jnp.pad(lse, ((0, 0), (0, nq_pad - nq)), constant_values=1e30)
    gp = jnp.pad(g, ((0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    # clamp to the backward's VMEM-feasible tile; padded lengths stay
    # divisible because fwd blocks are power-of-two multiples of these
    if FUSED_BWD:
        bqb = min(bq, BWD_FUSED_BLOCK_Q)
        bkvb = min(bkv, BWD_FUSED_BLOCK_KV)
        dq, dk, dv = _bwd_pallas_fused(qp, kp, vp, outp, lsep, gp, kv_len,
                                       bqb, bkvb, interpret=_is_cpu())
    else:
        bqb = min(bq, BWD_BLOCK_Q)
        bkvb = min(bkv, BWD_BLOCK_KV)
        dq, dk, dv = _bwd_pallas(qp, kp, vp, outp, lsep, gp, kv_len, bqb, bkvb,
                                 interpret=_is_cpu())
    # base-2 chain rule: dL/dq = scale·log2e·ln2·(ds@k) = scale·kernel_dq;
    # dL/dk = ln2·(dsᵀ@q_scaled) since only q absorbed log2e
    if scale != 1.0:
        dq = dq * scale
    dk = dk * LN2
    return (
        dq[:, :nq, :d].astype(qs.dtype),
        dk[:, :kv_len, :d].astype(k.dtype),
        dv[:, :kv_len, :d].astype(v.dtype),
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
    # Per-shape tuning: long-kv calls (stage-3 self-attention) run fastest
    # with wider tiles under the raised scoped-VMEM limit (see LONG_KV_*).
    # Only when the caller left the defaults — explicit blocks win.
    if (block_q, block_kv) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_KV) \
            and nk >= LONG_KV_THRESHOLD and nk % LONG_KV_BLOCK_KV == 0 \
            and nq % LONG_KV_BLOCK_Q == 0:
        block_q, block_kv = LONG_KV_BLOCK_Q, LONG_KV_BLOCK_KV
    # Fold the scale into q OUTSIDE the custom-VJP core (autodiff then scales
    # dq through the chain rule) so the kernel never multiplies the score
    # block — one fewer VPU op per score element in the VPU-bound kernel.
    qf = (q * jnp.asarray(scale, q.dtype)).reshape(B * H, nq, d)
    kf = k.reshape(B * H, nk, d)
    vf = v.reshape(B * H, nk, d)
    out = _flash_core(qf, kf, vf, 1.0, block_q, block_kv)
    return out.reshape(B, H, nq, d)

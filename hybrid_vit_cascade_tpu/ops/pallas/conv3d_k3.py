"""Pallas TPU implicit-GEMM 3×3×3 stride-1 conv for NCDHW slab chains.

Why: XLA's 3D conv at the cascade's small channel counts (the stage-3
detail-enhancer conv 64→32 at 256³, reference model_progressive.py:259-267)
sustains only ~12 TF/s on v5e (measured, scripts/bench_pallas_conv_probe2.py
VX), while a VMEM-resident formulation of the same contraction sustains
~24-28 TF/s. The winning shape from the probe sweep is the K-packed pair dot
(V5: (Cout, 2·Cin) @ (2·Cin, n) at 28.3 TF/s vs 23.7 for per-tap K=Cin dots,
22.9-24.3 for tap-stacked-M variants, and 23.8 for K=3·Cin) — so this kernel
issues, per (dx, dy) tap column, one dz-PAIR dot (K=2·Cin, the z0/z1 taps)
plus one dz=2 single dot (K=Cin).

SMALL-CIN VARIANT (cin ≤ 4, the chains' 1→64 / 1→32 stems): the per-tap-column
dots have K = 2·cin / cin there — too thin for the MXU, so Mosaic lowers them
to VPU-speed work (a 58-GFLOP 1→64 conv at 256³ measured 76-79 ms, ~0.8 TF/s,
regardless of lane-block size). `_conv_kernel_smallcin` instead stitches ALL
27 taps into explicit K rows (dz/dy via aligned scratch slices, dx via one
masked lane-roll per tap triple — cheap at 27·cin rows) and issues ONE
(Cout, 27·Cin)@(27·Cin, L) dot per block. Measured: detail-enhancer chain
fwd 163.6 → 114.2 ms, fwd+bwd 605 → 501 ms (the conv appears 4× per train
step across streamed passes and their backward recomputes).

Key layout decisions (all load/shift costs measured or bounded):
  * Operand layout (B, C, D, H·W): lanes = flattened H·W so a dy (=±1 row)
    shift is an ALIGNED lane-window slice (offset W) and dz shifts are row
    selects — both free. Blocks of L lanes per grid step.
  * z halos via three 1-deep block specs (d, d+1, d+2): input is VALID in D
    (callers pre-halo, which the ops/slab bodies already do).
  * y halos via two extra W-wide edge specs per z (1.25× load, not 3×).
  * x (±1 lane) shifts are applied on the ACCUMULATOR: the three dx tap
    columns accumulate into separate f32 partials and two of them get one
    masked lane-roll each (2×256 KB VPU per ~226 MFLOP block) instead of
    pre-rolling input copies (the naive alternative costs 27× that).
  * The stitched scratch is z-major (3·Cin rows) so the dz-pair dot's K rows
    (z0,z1 | z1,z2) are a contiguous row slice — K-packing costs nothing.

Numerics: dots accumulate in f32 (preferred_element_type) over bf16 (or
f32) operands, bias added in f32, output cast to the input dtype — matching
XLA's TPU conv accumulation behavior. Gradients are exact: dgrad reuses this
same kernel with channel-transposed, tap-flipped weights; wgrad is a
deep-K (K = L positions) accumulation kernel over the same stitched layout.

Runs interpreted on CPU (tests), compiled on TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def supports(cin: int, k: int, stride: int, h: int, w: int) -> bool:
    """Shape gate for the Pallas path (else callers fall back to XLA).

    Any cin ≥ 1 is supported: small-cin convs (e.g. the chains' 1→64 stems)
    waste MXU contraction rows but are bandwidth-bound anyway, and running
    them through the same kernel keeps the whole chain body in one layout —
    the XLA-conv↔Pallas relayout boundary costs ~3× the conv itself
    (measured: mixed XLA/Pallas chain body 472 ms vs 180 ms all-XLA)."""
    return (
        k == 3
        and stride == 1
        and cin >= 1
        and w % 128 == 0
        and h >= 2
    )


def _lane_block(h: int, w: int, cin: int, cout: int) -> int:
    """Lanes per grid step: a multiple of W (so dy shifts stay aligned) that
    divides H·W, sized by a VMEM budget.

    Per lane the kernel holds ≈ 18·cin + 8·cout bytes (stitched bf16 scratch
    + double-buffered main input blocks + f32 accumulator and tap partial).
    For fat shapes (cin=64) the budget lands on 8–16 rows — 8 was the probe's
    swept optimum. Small-cin convs (the chains' 1→64 / 1→32 stems) are
    DMA-ISSUE-bound at that size: 8 rows at cin=1 over a 256³ volume is a
    (256, 32) grid × 9 input DMAs ≈ 74k tiny DMA issues, measured 79 ms for
    a 58-GFLOP conv. Growing the block until the VMEM budget binds cuts the
    issue count by the same factor. HVC_CONV_ROWS forces a row count (perf
    sweeps)."""
    forced = os.environ.get("HVC_CONV_ROWS")
    if forced:
        rows = int(forced)
    else:
        budget = 6 * 1024 * 1024
        rows = max(1, min(64, budget // ((18 * cin + 8 * cout) * w)))
    r = 1
    while r * 2 <= rows and h % (r * 2) == 0:
        r *= 2
    return w * r


def _pack_weights(w: jnp.ndarray, dtype):
    """(Cout, Cin, 3, 3, 3) OIDHW → pair (3dx, 3dy, Cout, 2Cin) for the
    z0/z1 dot and single (3dx, 3dy, Cout, Cin) for z2; K rows are z-major
    (z·Cin + c) to match the stitched scratch layout."""
    # (dx, dy, Cout, z, Cin)
    wt = jnp.transpose(w, (4, 3, 0, 2, 1)).astype(dtype)
    cout, cin = w.shape[0], w.shape[1]
    pair = wt[:, :, :, 0:2, :].reshape(3, 3, cout, 2 * cin)
    sing = wt[:, :, :, 2, :]
    return pair, sing


SMALLCIN_MAX = 4  # tap-K-packed kernel path for cin ≤ this (27·cin ≤ 108)

_SQRT2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x: jnp.ndarray) -> jnp.ndarray:
    """erf for Pallas TPU kernels — Mosaic has no erf primitive (the
    lowering raises NotImplementedError), so this is Abramowitz & Stegun
    7.1.28 (|abs err| ≤ 3e-7: invisible at bf16 and far inside the fp32
    chain-equality test tolerances). This form is chosen for VPU cost, not
    just accuracy: 6-term Horner + 4 squarings + one reciprocal — NO exp
    and NO divide (the 7.1.26 exp·div form measured ~2× the in-kernel act
    cost; the z-stitch replays the activation 3.75× per element, so every
    VPU op here is multiplied). Interpret mode uses the same formula so
    CPU tests exercise identical numerics."""
    ax = jnp.where(x < 0.0, -x, x)
    p = (((((0.0000430638 * ax + 0.0002765672) * ax + 0.0001520143) * ax
           + 0.0092705272) * ax + 0.0422820123) * ax + 0.0705230784) * ax + 1.0
    p2 = p * p
    p4 = p2 * p2
    p8 = p4 * p4
    y = 1.0 - 1.0 / (p8 * p8)
    return jnp.where(x < 0.0, -y, y)


def _pact(act: Optional[str], x: jnp.ndarray) -> jnp.ndarray:
    """In-kernel activation PROLOGUE: the chains' act→conv pairs fuse the
    activation into the conv's input load, so the activated tensor never
    round-trips HBM (a standalone whole-slab act pass costs ~2 ms per 64-ch
    256³ slab, times fwd + backward recompute + wgrad — ~60+ ms/step at
    stage 3). f32 compute, cast back to the operand dtype — matching the
    dense path's XLA elementwise behavior on bf16."""
    if act is None:
        return x
    xf = x.astype(jnp.float32)
    if act == "gelu":  # erf form (torch nn.GELU default)
        y = 0.5 * xf * (1.0 + _erf_f32(xf / _SQRT2))
    elif act == "silu":
        y = xf * (1.0 / (1.0 + jnp.exp(-xf)))
    else:
        raise ValueError(act)
    return y.astype(x.dtype)


def _dact_f32(act: str, x: jnp.ndarray) -> jnp.ndarray:
    """d/dx of _pact in f32 — the dgrad kernels' epilogue multiply for
    prologue-fused activations (dx = act'(x) ⊙ convᵀ(g))."""
    xf = x.astype(jnp.float32)
    if act == "gelu":
        cdf = 0.5 * (1.0 + _erf_f32(xf / _SQRT2))
        pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * xf * xf)
        return cdf + xf * pdf
    if act == "silu":
        s = 1.0 / (1.0 + jnp.exp(-xf))
        return s * (1.0 + xf * (1.0 - s))
    raise ValueError(act)


def _pack_weights_taps(w: jnp.ndarray, dtype, k_rows: int):
    """(Cout, Cin, 3, 3, 3) OIDHW → (Cout, k_rows) with row order
    ((z·3 + dy)·3 + dx)·Cin + c, zero-padded to k_rows — matching the
    tap-stitched scratch of _conv_kernel_smallcin."""
    cout, cin = w.shape[0], w.shape[1]
    wt = jnp.transpose(w, (0, 2, 3, 4, 1)).reshape(cout, 27 * cin).astype(dtype)
    return jnp.pad(wt, ((0, 0), (0, k_rows - 27 * cin)))


def _stitch_z(s_ref, mains, lefts, rights, cin: int, W: int, L: int,
              v, vp: int, msk_ref, act: Optional[str] = None):
    """Shared z-plane stitch: per z-offset write [left-edge | main | right-
    edge] rows into scratch, zeroing (a) clamped y-edge loads at plane
    bounds and (b) whole z-planes whose REAL input-plane index q = v + z − vp
    falls outside the valid window [msk[0], msk[1]) — this implements both
    the virtual D-padding of the dgrad (planes past the array) and the
    chains' out-of-volume coordinate masking IN the kernel, replacing a
    whole-slab elementwise mask pass per conv (~25 ms/step at stage 3).

    `act` applies the fused activation prologue (see _pact) to the loaded
    values BEFORE the zero-mask select — mask(act(x)) and act(mask(x)) agree
    because gelu(0) = silu(0) = 0, and the mask reproduces the dense path's
    per-conv zero padding of the (activated) conv input."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    vlo = msk_ref[0, 0]
    vhi = msk_ref[0, 1]
    for z in range(3):
        q = v + z - vp
        zok = (q >= vlo) & (q < vhi)
        left = lefts[z][0, :, :]
        right = rights[z][0, :, :]
        zero = jnp.zeros((), left.dtype)
        s_ref[pl.ds(z * cin, cin), 0:W] = jnp.where(zok & (j > 0), left, zero)
        s_ref[pl.ds(z * cin, cin), W:W + L] = jnp.where(
            zok, mains[z][0, :, :], zero)
        s_ref[pl.ds(z * cin, cin), W + L:] = jnp.where(
            zok & (j < nj - 1), right, zero)
    if act is not None:
        # activation applied AFTER the (pure data movement) stitch —
        # act(0) = 0 for gelu/silu, so masked rows stay masked; chunked per
        # z-group to bound the f32 VPU temporaries (a whole-scratch pass
        # allocates ~5 live (3·Cin, L+2W) f32 vectors and blows the 16 MB
        # scoped-vmem limit at the 64-channel detail shapes)
        for z in range(3):
            s_ref[pl.ds(z * cin, cin), :] = _pact(
                act, s_ref[pl.ds(z * cin, cin), :])


def _emit_out(o_ref, sums_ref, acc, v, msk_ref, out_dtype,
              dact_act: Optional[str] = None, dact_ref=None):
    """Shared epilogue: zero output planes outside the [msk[2], msk[3])
    window (the dgrad's dx rows at out-of-volume coordinates must be exact
    zeros so upstream weight gradients see no contamination), then
    optionally emit per-channel f32 (sum, sum-of-squares) of the written
    block — the GroupNorm statistics accumulate as a kernel by-product
    instead of a separate whole-slab read-back pass.

    dact_act/dact_ref: dgrad epilogue for a prologue-fused activation —
    the emitted block is act'(x) ⊙ acc, with x (the forward conv's
    pre-activation input) streamed in at the output block's coordinates."""
    if dact_act is not None:
        acc = acc * _dact_f32(dact_act, dact_ref[0, :, :])
    ook = (v >= msk_ref[0, 2]) & (v < msk_ref[0, 3])
    outv = jnp.where(ook, acc, 0.0).astype(out_dtype)
    o_ref[0, :, :] = outv
    if sums_ref is not None:
        of = outv.astype(jnp.float32)
        sums_ref[0, 0, :, :] = jnp.stack(
            [jnp.sum(of, axis=1), jnp.sum(of * of, axis=1)])


def _unpack_refs(refs, n_w: int, want_sums: bool, has_dact: bool):
    """Kernel ref layout: 9 x-blocks, msk, n_w weight arrays, bias,
    [dact x-block], out, [sums], scratch... — returns
    (xs, msk, ws, b, dact_ref, o, sums, scratch)."""
    xs = refs[:9]
    msk = refs[9]
    ws = refs[10:10 + n_w]
    b = refs[10 + n_w]
    i = 11 + n_w
    dact_ref = refs[i] if has_dact else None
    i += 1 if has_dact else 0
    o = refs[i]
    i += 1
    sums = refs[i] if want_sums else None
    i += 1 if want_sums else 0
    return xs, msk, ws, b, dact_ref, o, sums, refs[i:]


def _conv_kernel_smallcin(cin: int, cout: int, L: int, W: int, k_rows: int,
                          D: int, vp: int, want_sums: bool, act, dact_act,
                          out_dtype, *refs):
    """Small-cin variant: ONE (Cout, 27·Cin)@(27·Cin, L) MXU dot per block.

    The generic kernel's per-(dx, dy) dots have K = 2·Cin / Cin; at Cin ≤ 4
    those contractions are too thin for the MXU and lower to VPU-speed work —
    a 58-GFLOP 1→64 conv at 256³ measured 76-79 ms (~0.8 TF/s) regardless of
    block size. Here all 27 taps are stitched into explicit K rows (dz/dy via
    aligned scratch slices, dx via one masked lane-roll per row triple), so
    the contraction depth is 27·Cin and the dot runs on the MXU."""
    (xs, msk_ref, (wk_ref,), b_ref, dact_ref, o_ref, sums_ref,
     (s_ref, k_ref)) = _unpack_refs(refs, 1, want_sums, dact_act is not None)
    (m0, m1, m2, l0, l1, l2, r0, r1, r2) = xs
    v = pl.program_id(0) % D

    _stitch_z(s_ref, (m0, m1, m2), (l0, l1, l2), (r0, r1, r2),
              cin, W, L, v, vp, msk_ref, act)

    lane = lax.broadcasted_iota(jnp.int32, (1, L), 1) % W
    zero = jnp.zeros((), s_ref.dtype)
    for z in range(3):
        for dy in range(3):
            win = s_ref[pl.ds(z * cin, cin), pl.ds(W * dy, L)]
            base = (z * 3 + dy) * 3 * cin
            # dx taps: input at lane p-1 / p / p+1, zero-masked at x edges
            k_ref[pl.ds(base, cin), :] = jnp.where(
                lane == 0, zero, jnp.roll(win, 1, axis=1))
            k_ref[pl.ds(base + cin, cin), :] = win
            k_ref[pl.ds(base + 2 * cin, cin), :] = jnp.where(
                lane == W - 1, zero, jnp.roll(win, -1, axis=1))
    if k_rows > 27 * cin:
        k_ref[pl.ds(27 * cin, k_rows - 27 * cin), :] = jnp.zeros(
            (k_rows - 27 * cin, L), s_ref.dtype)

    acc = lax.dot_general(
        wk_ref[...], k_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += b_ref[:, :].astype(jnp.float32)
    _emit_out(o_ref, sums_ref, acc, v, msk_ref, out_dtype, dact_act, dact_ref)


def _pack_weights_ztriple(w: jnp.ndarray, dtype):
    """(Cout, Cin, 3, 3, 3) OIDHW → (3dx, 3dy, Cout, 3Cin) for a single
    z-TRIPLE dot per (dx, dy) tap column; K rows z-major to match the
    stitched scratch. Used when 3·Cin ≤ 128: the pair+single split would
    run its K=Cin single dot at ≤ 33% contraction-row occupancy, while one
    K=3·Cin dot reaches 3·Cin/128 (e.g. 75% at Cin=32 vs the split's
    mean ~37%)."""
    cout, cin = w.shape[0], w.shape[1]
    wt = jnp.transpose(w, (4, 3, 0, 2, 1)).astype(dtype)  # (dx, dy, Cout, z, Cin)
    return wt.reshape(3, 3, cout, 3 * cin)


def _conv_kernel_ztriple(cin: int, cout: int, L: int, W: int, D: int,
                         vp: int, want_sums: bool, act, dact_act,
                         out_dtype, *refs):
    """z-triple variant of _conv_kernel: one (Cout, 3Cin)@(3Cin, L) dot per
    (dx, dy) tap column (applicable when 3·Cin ≤ 128)."""
    (xs, msk_ref, (wz_ref,), b_ref, dact_ref, o_ref, sums_ref,
     (s_ref,)) = _unpack_refs(refs, 1, want_sums, dact_act is not None)
    (m0, m1, m2, l0, l1, l2, r0, r1, r2) = xs
    v = pl.program_id(0) % D

    _stitch_z(s_ref, (m0, m1, m2), (l0, l1, l2), (r0, r1, r2),
              cin, W, L, v, vp, msk_ref, act)

    acc = jnp.broadcast_to(b_ref[:, :].astype(jnp.float32), (cout, L))
    lane = lax.broadcasted_iota(jnp.int32, (1, L), 1) % W
    for dx in range(3):
        p = jnp.zeros((cout, L), jnp.float32)
        for dy in range(3):
            win = s_ref[:, pl.ds(W * dy, L)]
            p += lax.dot_general(
                wz_ref[dx, dy], win,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if dx == 0:
            acc += jnp.where(lane == 0, 0.0, jnp.roll(p, 1, axis=1))
        elif dx == 1:
            acc += p
        else:
            acc += jnp.where(lane == W - 1, 0.0, jnp.roll(p, -1, axis=1))
    _emit_out(o_ref, sums_ref, acc, v, msk_ref, out_dtype, dact_act, dact_ref)


def _conv_kernel(cin: int, cout: int, L: int, W: int, D: int,
                 vp: int, want_sums: bool, act, dact_act, out_dtype, *refs):
    (xs, msk_ref, (wp_ref, ws_ref), b_ref, dact_ref, o_ref, sums_ref,
     (s_ref,)) = _unpack_refs(refs, 2, want_sums, dact_act is not None)
    (m0, m1, m2, l0, l1, l2, r0, r1, r2) = xs
    v = pl.program_id(0) % D

    _stitch_z(s_ref, (m0, m1, m2), (l0, l1, l2), (r0, r1, r2),
              cin, W, L, v, vp, msk_ref, act)

    acc = jnp.broadcast_to(b_ref[:, :].astype(jnp.float32), (cout, L))
    lane = lax.broadcasted_iota(jnp.int32, (1, L), 1) % W
    for dx in range(3):
        p = jnp.zeros((cout, L), jnp.float32)
        for dy in range(3):
            win = s_ref[:, pl.ds(W * dy, L)]
            p += lax.dot_general(
                wp_ref[dx, dy], win[0:2 * cin, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            p += lax.dot_general(
                ws_ref[dx, dy], win[2 * cin:3 * cin, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if dx == 0:
            acc += jnp.where(lane == 0, 0.0, jnp.roll(p, 1, axis=1))
        elif dx == 1:
            acc += p
        else:
            acc += jnp.where(lane == W - 1, 0.0, jnp.roll(p, -1, axis=1))
    _emit_out(o_ref, sums_ref, acc, v, msk_ref, out_dtype, dact_act, dact_ref)


def _x_specs(cin: int, D: int, L: int, W: int, E: int, dext: int,
             vp: int = 0):
    """Nine input specs over x flattened to (B, Cin, Dext·H·W) — folding D
    into the lane dim keeps the block's trailing dims (Cin, L), which is
    what the TPU lowering requires, with no host-side transpose. Per
    z-offset r ∈ {0,1,2}: a main L-lane block plus W-wide left/right y-halo
    edge blocks (clamped at plane boundaries; the kernel zero-masks the
    clamped loads). With virtual D-padding (vp > 0) the plane index
    v + r − vp is clamped into [0, dext) and the kernel zero-masks
    out-of-range planes — no materialized zero-padded copy of x (the
    dgrad's pad cost ~25 ms/step at stage 3)."""
    lw = L // W
    jl = (W * E) // L  # lane blocks per (b, z) plane

    def plane(bd, r):
        return jnp.clip(bd % D + r - vp, 0, dext - 1)

    specs = []
    for r in (0, 1, 2):
        specs.append(pl.BlockSpec(
            (1, cin, L),
            functools.partial(
                lambda r, bd, j: (bd // D, 0, plane(bd, r) * jl + j), r)))
    for r in (0, 1, 2):
        specs.append(pl.BlockSpec(
            (1, cin, W),
            functools.partial(
                lambda r, bd, j: (bd // D, 0,
                                  plane(bd, r) * E
                                  + jnp.maximum(j * lw - 1, 0)), r)))
    for r in (0, 1, 2):
        specs.append(pl.BlockSpec(
            (1, cin, W),
            functools.partial(
                lambda r, bd, j: (bd // D, 0,
                                  plane(bd, r) * E
                                  + jnp.minimum((j + 1) * lw, E - 1)), r)))
    return specs


_NOMASK = (-(2 ** 30), 2 ** 30)


def _window_arr(dext: int, window) -> jnp.ndarray:
    """(1, 4) i32 [vlo, vhi, olo, ohi] for the kernels' SMEM mask input.
    window=None → all input planes valid, no output masking."""
    if window is None:
        return jnp.array([[0, dext, _NOMASK[0], _NOMASK[1]]], jnp.int32)
    return jnp.stack(window).astype(jnp.int32).reshape(1, 4)


def _msk_spec():
    return pl.BlockSpec((1, 4), lambda bd, j: (0, 0),
                        memory_space=pltpu.SMEM)


def _conv_fwd(xf: jnp.ndarray, dims: tuple, w: jnp.ndarray, bias: jnp.ndarray,
              interpret: bool, vp: int = 0, window=None,
              want_sums: bool = False, act: Optional[str] = None,
              dact: Optional[tuple] = None):
    """xf: (B, Cin, (D+2)·H·W) VALID in D / SAME in H,W → (B, Cout, D·H·W).

    Flat rank-3 I/O end to end: the kernel's (Cin, lanes) operand layout is
    the SAME physical layout the surrounding slab-chain ops use, so chains
    of convs + elementwise ops run with zero relayouts (the rank-5↔rank-3
    reshape around every conv cost ~60 ms/step of `reshape` HLOs in the
    stage-3 device trace before this).

    act: fused activation prologue (conv of act(xf), see _pact/_stitch_z).
    dact: (act_name, x_flat) — dgrad epilogue: output blocks are multiplied
    by act'(x_flat) at their own coordinates (x_flat has exactly this call's
    output geometry: (B, Cout, D·H·W))."""
    dext, H, W = dims
    B, cin = xf.shape[0], xf.shape[1]
    cout = w.shape[0]
    D = dext - 2 + 2 * vp
    L = _lane_block(H, W, cin, cout)
    E = (H * W) // W
    nj = (H * W) // L
    b2 = bias.astype(jnp.float32).reshape(cout, 1)
    msk = _window_arr(dext, window)
    dact_act = dact[0] if dact is not None else None
    dact_specs = [] if dact is None else [pl.BlockSpec(
        (1, cout, L), lambda bd, j: (bd // D, 0, (bd % D) * nj + j))]
    dact_ops = [] if dact is None else [dact[1]]
    assert not (want_sums and dact is not None)

    def _outs():
        shapes = [jax.ShapeDtypeStruct((B, cout, D * H * W), xf.dtype)]
        specs = [pl.BlockSpec(
            (1, cout, L),
            lambda bd, j: (bd // D, 0, (bd % D) * nj + j))]
        if want_sums:
            shapes.append(jax.ShapeDtypeStruct((B * D, nj, 2, cout), jnp.float32))
            specs.append(pl.BlockSpec((1, 1, 2, cout),
                                      lambda bd, j: (bd, j, 0, 0)))
        return (tuple(shapes), tuple(specs)) if want_sums else (shapes[0], specs[0])

    def _post(res):
        if not want_sums:
            return res
        out, parts = res
        ps = parts.reshape(B, D, nj, 2, cout).sum(axis=(1, 2))  # (B, 2, Cout)
        return out, ps[:, 0], ps[:, 1]

    out_shape, out_specs = _outs()

    if cin <= SMALLCIN_MAX:
        k_rows = 27 * cin
        wk = _pack_weights_taps(w, xf.dtype, k_rows)
        out = pl.pallas_call(
            functools.partial(_conv_kernel_smallcin, cin, cout, L, W, k_rows,
                              D, vp, want_sums, act, dact_act, xf.dtype),
            grid=(B * D, nj),
            in_specs=_x_specs(cin, D, L, W, E, dext, vp) + [
                _msk_spec(),
                pl.BlockSpec((cout, k_rows), lambda bd, j: (0, 0)),
                pl.BlockSpec((cout, 1), lambda bd, j: (0, 0)),
            ] + dact_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((3 * cin, L + 2 * W), xf.dtype),
                            pltpu.VMEM((k_rows, L), xf.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel")),
            interpret=interpret,
        )(*([xf] * 9), msk, wk, b2, *dact_ops)
        return _post(out)

    if 3 * cin <= 128:
        wz = _pack_weights_ztriple(w, xf.dtype)
        out = pl.pallas_call(
            functools.partial(_conv_kernel_ztriple, cin, cout, L, W,
                              D, vp, want_sums, act, dact_act, xf.dtype),
            grid=(B * D, nj),
            in_specs=_x_specs(cin, D, L, W, E, dext, vp) + [
                _msk_spec(),
                pl.BlockSpec((3, 3, cout, 3 * cin), lambda bd, j: (0, 0, 0, 0)),
                pl.BlockSpec((cout, 1), lambda bd, j: (0, 0)),
            ] + dact_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((3 * cin, L + 2 * W), xf.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel")),
            interpret=interpret,
        )(*([xf] * 9), msk, wz, b2, *dact_ops)
        return _post(out)

    wp, ws = _pack_weights(w, xf.dtype)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, cin, cout, L, W,
                          D, vp, want_sums, act, dact_act, xf.dtype),
        grid=(B * D, nj),
        in_specs=_x_specs(cin, D, L, W, E, dext, vp) + [
            _msk_spec(),
            pl.BlockSpec((3, 3, cout, 2 * cin), lambda bd, j: (0, 0, 0, 0)),
            pl.BlockSpec((3, 3, cout, cin), lambda bd, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout, 1), lambda bd, j: (0, 0)),
        ] + dact_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3 * cin, L + 2 * W), xf.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
        interpret=interpret,
    )(*([xf] * 9), msk, wp, ws, b2, *dact_ops)
    return _post(out)


def _wgrad_kernel(cin: int, cout: int, L: int, W: int, D: int, act, *refs):
    (m0, m1, m2, l0, l1, l2, r0, r1, r2, msk_ref, g_ref, o_ref, s_ref) = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = pl.program_id(0) * nj + j
    v = pl.program_id(0) % D

    # x stitched with the same plane-validity window AND activation prologue
    # as the forward, so dW pairs g with the act(x) the forward actually saw.
    _stitch_z(s_ref, (m0, m1, m2), (l0, l1, l2), (r0, r1, r2),
              cin, W, L, v, 0, msk_ref, act)

    g = g_ref[0, :, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, L), 1) % W
    zero = jnp.zeros((), g.dtype)

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    for dx in range(3):
        # dW tap dx pairs g[x] with in[x+dx-1]; shift g instead of the
        # (much larger) stitched input: g_dx[x'] = g[x' - (dx-1)], zeroed
        # where the source falls outside the x row (SAME zero padding).
        if dx == 0:
            gs = jnp.where(lane == W - 1, zero, jnp.roll(g, -1, axis=1))
        elif dx == 1:
            gs = g
        else:
            gs = jnp.where(lane == 0, zero, jnp.roll(g, 1, axis=1))
        for dy in range(3):
            win = s_ref[:, pl.ds(W * dy, L)]
            # (3Cin, L) · (Cout, L) contracted over lanes → (3Cin, Cout)
            part = lax.dot_general(
                win[...], gs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[dx, dy] += part


def _wgrad(xf: jnp.ndarray, dims: tuple, gf: jnp.ndarray, cout: int,
           interpret: bool, window=None, act: Optional[str] = None) -> jnp.ndarray:
    """dW (Cout, Cin, 3, 3, 3) from flat xf (B, Cin, (D+2)·H·W) and
    gf (B, Cout, D·H·W); `act` replays the forward's activation prologue."""
    dext, H, W = dims
    B, cin = xf.shape[0], xf.shape[1]
    D = dext - 2
    L = _lane_block(H, W, cin, cout)
    E = (H * W) // W
    msk = _window_arr(dext, window)

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, cin, cout, L, W, D, act),
        grid=(B * D, (H * W) // L),
        in_specs=_x_specs(cin, D, L, W, E, dext) + [
            _msk_spec(),
            pl.BlockSpec(
                (1, cout, L),
                lambda bd, j: (bd // D, 0, (bd % D) * ((H * W) // L) + j)),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, 3 * cin, cout), lambda bd, j: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, 3 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * cin, L + 2 * W), xf.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([xf] * 9), msk, gf)
    # (dx, dy, z·Cin+c, Cout) → (Cout, Cin, dz, dy, dx)
    out = out.reshape(3, 3, 3, cin, cout)
    return jnp.transpose(out, (4, 3, 2, 1, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv3d_k3s1_flat(dims: tuple, xf: jnp.ndarray, w: jnp.ndarray,
                     bias: jnp.ndarray):
    """Flat-I/O 3×3×3 stride-1 conv, VALID in D, SAME in H/W.

    dims = (D+2, H, W) static; xf: (B, Cin, (D+2)·H·W); w: (Cout, Cin,
    3, 3, 3) OIDHW; bias: (Cout,). Returns (B, Cout, D·H·W) in xf.dtype.
    Rank-3 in and out so slab-chain bodies never leave the kernel's
    (C, lanes) physical layout (see _conv_fwd). Differentiable (custom VJP
    with Pallas dgrad/wgrad kernels, also flat)."""
    return _conv_fwd(xf, dims, w, bias, interpret=_is_cpu())


def _vjp_fwd(dims, xf, w, bias):
    return conv3d_k3s1_flat(dims, xf, w, bias), (xf, w, bias)


def _vjp_bwd(dims, res, g):
    xf, w, bias = res
    dext, H, W = dims
    cout, cin = w.shape[0], w.shape[1]
    g = g.astype(xf.dtype)
    # dgrad: conv of g with channel-transposed, tap-flipped weights;
    # vp=2 virtual D-padding covers xf's D+2 rows without materializing a
    # zero-padded copy of g (which cost ~25 ms/step at stage 3).
    wT = jnp.transpose(w, (1, 0, 2, 3, 4))[:, :, ::-1, ::-1, ::-1]
    dx = _conv_fwd(g, (dext - 2, H, W), wT, jnp.zeros((cin,), jnp.float32),
                   interpret=_is_cpu(), vp=2)
    dw = _wgrad(xf, dims, g, cout, interpret=_is_cpu()).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2)).astype(bias.dtype)
    return dx, dw, db


conv3d_k3s1_flat.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv3d_k3s1_chain(meta: tuple, xf: jnp.ndarray, win: jnp.ndarray,
                      w: jnp.ndarray, bias: jnp.ndarray):
    """Slab-chain form of conv3d_k3s1_flat: in-kernel coordinate masking,
    optional fused activation prologue, and optional in-kernel GroupNorm
    statistics.

    meta = (dext, H, W, want_sums[, act]) static; win: i32[2] = [vlo, vhi),
    the valid input-plane window in REAL plane indices (plane q of xf holds
    global D-coordinate lo + q; the caller passes [−lo, level_d − lo)).
    Planes outside the window read as zeros — the dense path's per-conv
    zero padding semantics — replacing the explicit whole-slab mask
    multiply (ops/slab.py `_mask_outside_flat`). act ('gelu' | 'silu' |
    None) computes conv(act(xf)) with the activation applied at the
    kernel's input load — the chains' act→conv pairs never materialize the
    activated slab (see _pact). With want_sums the kernel also returns
    per-channel f32 (sum, sum-of-squares) of the output, accumulated as a
    kernel by-product for the chains' GroupNorm stats passes (no whole-slab
    read-back). Returns out | (out, s1, s2) with s1, s2: (B, Cout) f32."""
    dext, H, W, want_sums = meta[:4]
    act = meta[4] if len(meta) > 4 else None
    window = (win[0], win[1], _NOMASK[0], _NOMASK[1])
    return _conv_fwd(xf, (dext, H, W), w, bias, interpret=_is_cpu(),
                     window=window, want_sums=want_sums, act=act)


def _vjp_fwd_chain(meta, xf, win, w, bias):
    res = conv3d_k3s1_chain(meta, xf, win, w, bias)
    out = res[0] if meta[3] else res
    return res, (xf, win, w, bias, out if meta[3] else None)


def _vjp_bwd_chain(meta, res, ct):
    dext, H, W, want_sums = meta[:4]
    act = meta[4] if len(meta) > 4 else None
    xf, win, w, bias, out = res
    if want_sums:
        g, gs1, gs2 = ct
        # d(s1)/d(out) = 1, d(s2)/d(out) = 2·out — fold the stats
        # cotangents into the output cotangent.
        g = (g.astype(jnp.float32) + gs1[:, :, None]
             + 2.0 * gs2[:, :, None] * out.astype(jnp.float32))
    else:
        g = ct
    g = g.astype(xf.dtype)
    cout, cin = w.shape[0], w.shape[1]
    wT = jnp.transpose(w, (1, 0, 2, 3, 4))[:, :, ::-1, ::-1, ::-1]
    # dgrad with vp=2 virtual padding; dx planes outside the forward's
    # input window are zeroed IN the kernel (the mask's transpose), so
    # upstream weight gradients see exact zeros at out-of-volume rows.
    # With a fused activation prologue, dx = act'(xf) ⊙ convᵀ(g) — the
    # act' multiply runs in the dgrad kernel's epilogue (xf streamed at
    # the output blocks' own coordinates).
    dx = _conv_fwd(g, (dext - 2, H, W), wT, jnp.zeros((cin,), jnp.float32),
                   interpret=_is_cpu(), vp=2,
                   window=(jnp.int32(0), jnp.int32(dext - 2), win[0], win[1]),
                   dact=None if act is None else (act, xf))
    dw = _wgrad(xf, (dext, H, W), g, cout, interpret=_is_cpu(),
                window=(win[0], win[1], _NOMASK[0], _NOMASK[1]),
                act=act).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2)).astype(bias.dtype)
    d_win = np.zeros((2,), dtype=jax.dtypes.float0)
    return dx, d_win, dw, db


conv3d_k3s1_chain.defvjp(_vjp_fwd_chain, _vjp_bwd_chain)


def conv3d_k3s1_valid_d(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray):
    """3×3×3 stride-1 conv, VALID in D (x carries D-halos), SAME in H/W.

    x: (B, Cin, D+2, H, W); w: (Cout, Cin, 3, 3, 3) OIDHW; bias: (Cout,).
    Returns (B, Cout, D, H, W) in x.dtype. Rank-5 convenience wrapper over
    conv3d_k3s1_flat (which hot slab chains call directly to stay in the
    flat layout)."""
    B, cin, dext, H, W = x.shape
    out = conv3d_k3s1_flat((dext, H, W), x.reshape(B, cin, dext * H * W),
                           w, bias)
    return out.reshape(B, w.shape[0], dext - 2, H, W)


def conv3d_k3s1_same(x: jnp.ndarray, w: jnp.ndarray,
                     bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """SAME-padded convenience wrapper (pads D by 1 zero on each side)."""
    cout = w.shape[0]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    return conv3d_k3s1_valid_d(xp, w, bias)

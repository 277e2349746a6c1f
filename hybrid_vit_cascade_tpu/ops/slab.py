"""D-slab streaming execution of NCDHW conv→GroupNorm→activation chains.

Why this exists: the cascade's 256³ conv branches (stage-3 upsample stem and
detail-enhancer CNN, reference model_progressive.py:219-316) produce 32–64
channel 256³ activations. XLA lays conv activations out channel-minor on TPU,
so a 32-channel tensor pads its 128-lane tile 4× — a single such bf16
activation is ~4 GB physical, and training stage 3 needs several of them live
at once, which is why the naive formulation needs 26+ GB on a 15.75 GB chip
(the reference needed 35–180 GB on GPUs for this stage).

Here the full-resolution intermediates NEVER materialize: the chain is
evaluated in depth-slabs under `lax.scan`, each slab body rematerialized in
the backward pass (`jax.checkpoint`), with exact conv halos sliced from the
(small, usually 1-channel) chain input. GroupNorm needs global statistics, so
a chain with K GroupNorms runs K+1 passes: pass k streams the slabs through
the chain prefix to accumulate the k-th norm's (sum, sum-of-squares), the
final pass emits the output slabs. The extra conv recompute is a few percent
of a train step; the padded whole-volume liveness it removes is the
difference between fitting the chip and not.

Numerics match `ops.conv3d.group_norm_core` (fp32 statistics,
var = E[x²]−E[x]² clamped ≥ 0, eps 1e-5, normalization arithmetic in the
input dtype) — `chain_apply_dense` and `chain_apply_slab` are tested for
equality.

Op spec (a list of tuples; arrays are traced leaves):
  ("conv", kernel (O,I,k,k,k), bias (O,) | None, stride)   k ∈ {1,3}, stride ∈ {1,2}
  ("gn",   num_groups, scale (C,), bias (C,))
  ("act",  "gelu" | "silu")
Convs use SAME padding (k//2) in H/W and virtual zero padding in D; stride
applies to all three spatial dims.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .conv3d import group_norm_core


import os

# The Pallas implicit-GEMM kernel (ops/pallas/conv3d_k3.py) measures 2.3×
# XLA's dense conv at the stage-3 detail shapes (27.1 vs 11.6 TF/s on v5e);
# opt out with HVC_PALLAS_CONV=0.
_PALLAS_CONV = os.environ.get("HVC_PALLAS_CONV", "1") != "0"


def _interpret_ok() -> bool:
    """HVC_PALLAS_INTERPRET=1 lets the Pallas chain path run on CPU in
    interpret mode — used by tests to cover the flat-layout streamed body
    (which otherwise only executes on TPU)."""
    return os.environ.get("HVC_PALLAS_INTERPRET", "0") == "1"


def _pallas_conv_applicable(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                            d_padding: int) -> bool:
    from .pallas.conv3d_k3 import _is_cpu, supports

    k = kernel.shape[-1]
    cin, dd, h, w = x.shape[1], x.shape[2], x.shape[3], x.shape[4]
    return (
        _PALLAS_CONV
        and (not _is_cpu() or _interpret_ok())
        and supports(cin, k, stride, h, w)
        and d_padding in (0, 1)
        and dd + 2 * d_padding >= 3
    )


def _pallas_s2_applicable(x: jnp.ndarray, kernel: jnp.ndarray,
                          d_padding: int) -> bool:
    from .pallas.conv3d_k3s2 import _is_cpu, supports_s2

    k = kernel.shape[-1]
    cin, dd, h, w = x.shape[1], x.shape[2], x.shape[3], x.shape[4]
    if not (_PALLAS_CONV and (not _is_cpu() or _interpret_ok())
            and supports_s2(cin, k, 2, h, w)):
        return False
    if d_padding == 0:  # VALID: kernel contract needs 2·D'+1 input planes
        return dd % 2 == 1 and dd >= 3
    if d_padding == 1:  # SAME: one front pad plane makes it 2·(dd/2)+1
        return dd % 2 == 0 and dd >= 2
    return False


def chain_pallas_ok(chain: Sequence[Tuple], h: int, w: int) -> bool:
    """True when EVERY conv in the chain (segment) runs off the XLA conv op
    on TPU (k3 s1 → Pallas implicit GEMM, k3 s2 → Pallas stride-2 kernel,
    k1 s1 → dot_general). Segments with any XLA-only conv must stay
    all-XLA: a single XLA-conv↔Pallas boundary inside a slab body forces a
    relayout of the full slab activation (~300 ms per streamed pass at
    256³, measured — 3× the cost of the conv it accelerates)."""
    from .pallas.conv3d_k3 import _is_cpu, supports
    from .pallas.conv3d_k3s2 import supports_s2

    if not _PALLAS_CONV or (_is_cpu() and not _interpret_ok()):
        return False
    hh, ww = h, w
    for op in chain:
        if op[0] != "conv":
            continue
        k, stride = op[1].shape[-1], op[3]
        if k == 1 and stride == 1:
            continue
        if stride == 2:
            if not supports_s2(op[1].shape[1], k, stride, hh, ww):
                return False
        elif not supports(op[1].shape[1], k, stride, hh, ww):
            return False
        hh, ww = hh // stride, ww // stride
    return True


def conv3d_ncdhw(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                 stride: int, d_padding: int, hw_padding: int, dtype=None,
                 allow_pallas: bool = True) -> jnp.ndarray:
    """Functional NCDHW conv (weights OIDHW); D and H/W padding separately
    controllable so slab bodies can run VALID in D on pre-haloed slabs.

    k1/s1 convs lower to a channel dot_general (layout-neutral on TPU); hot
    k3/s1 shapes route to the Pallas implicit-GEMM kernel when
    `allow_pallas` (chain-level decision, see `chain_pallas_ok`)."""
    dtype = dtype or x.dtype
    k = kernel.shape[-1]
    if k == 1 and stride == 1:
        B, C = x.shape[0], x.shape[1]
        wmat = kernel.reshape(kernel.shape[0], kernel.shape[1]).astype(dtype)
        out = lax.dot_general(
            wmat, x.astype(dtype).reshape(B, C, -1),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (O, B, L)
        out = jnp.moveaxis(out, 0, 1).reshape(
            (B, kernel.shape[0]) + x.shape[2:]).astype(dtype)
        if bias is not None:
            out = out + bias.astype(out.dtype)[None, :, None, None, None]
        return out
    if (allow_pallas and hw_padding == 1
            and _pallas_conv_applicable(x, kernel, stride, d_padding)):
        from .pallas.conv3d_k3 import conv3d_k3s1_valid_d

        xc = x.astype(dtype)
        if d_padding == 1:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
        b = bias if bias is not None else jnp.zeros((kernel.shape[0],), jnp.float32)
        return conv3d_k3s1_valid_d(xc, kernel.astype(dtype), b)
    if (allow_pallas and hw_padding == 1 and stride == 2
            and _pallas_s2_applicable(x, kernel, d_padding)):
        from .pallas.conv3d_k3s2 import conv3d_k3s2_valid_d

        xc = x.astype(dtype)
        if d_padding == 1:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        b = bias if bias is not None else jnp.zeros((kernel.shape[0],), jnp.float32)
        return conv3d_k3s2_valid_d(xc, kernel.astype(dtype), b)
    out = lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride,) * 3,
        padding=[(d_padding, d_padding), (hw_padding, hw_padding), (hw_padding, hw_padding)],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None, None, None]
    return out


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "gelu":  # torch nn.GELU default (erf form); poly fast path
        from .activations import gelu_erf

        return gelu_erf(x)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(name)


def _gn_normalize(x: jnp.ndarray, groups: int, scale: jnp.ndarray, bias: jnp.ndarray,
                  mean: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Apply GroupNorm given global per-(B, G) stats, bitwise-matching
    ops.conv3d._gn_fwd_impl's normalization arithmetic."""
    B, C = x.shape[0], x.shape[1]
    xr = x.reshape(B, groups, C // groups, *x.shape[2:])
    m = mean.reshape(B, groups, *([1] * (xr.ndim - 2))).astype(x.dtype)
    iv = inv.reshape(B, groups, *([1] * (xr.ndim - 2))).astype(x.dtype)
    xhat = ((xr - m) * iv).reshape(x.shape)
    bshape = (1, C) + (1,) * (x.ndim - 2)
    return xhat * scale.astype(x.dtype).reshape(bshape) + bias.astype(x.dtype).reshape(bshape)


def _stats_from_sums(s1: jnp.ndarray, s2: jnp.ndarray, count) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean = s1 / count
    var = jnp.maximum(s2 / count - lax.square(mean), 0.0)
    return mean, lax.rsqrt(var + 1e-5)


def _group_sums(h: jnp.ndarray, groups: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(B, group) (sum, sum-of-squares) of an NCDHW slab, fp32.

    Reduces over the spatial axes FIRST (layout-native on TPU, where conv
    activations are channel-minor) and only then folds channels into groups —
    `h.reshape(B, groups, -1)` would merge channel-subgroups with spatial
    dims, forcing a physical relayout of the whole slab per stats step."""
    B = h.shape[0]
    hf = h.astype(jnp.float32)
    cs1 = jnp.sum(hf, axis=(2, 3, 4))              # (B, C)
    cs2 = jnp.sum(lax.square(hf), axis=(2, 3, 4))  # (B, C)
    return (cs1.reshape(B, groups, -1).sum(-1),
            cs2.reshape(B, groups, -1).sum(-1))


def _fold_conv_gn(seg: Sequence[Tuple], stats: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                  batch: int) -> Tuple[List[Tuple], List[Tuple]]:
    """Fold conv→gn pairs into a single conv with stats-scaled weights.

    GroupNorm with KNOWN global stats is a per-(B, channel) affine
    y = a·h + b with a = inv·γ, b = β − mean·inv·γ. When the conv output
    feeds the gn directly and B == 1, the affine commutes into the conv:
    scale the kernel's output-channel axis by `a` and set the bias to
    a·bias + b. This deletes an entire whole-volume elementwise pass per
    GroupNorm (the multiply_multiply fusions that cost ~47 ms/step in the
    stage-3 device trace) — the fold itself touches only the (O,I,3,3,3)
    weight tensor. Returns (folded ops, stats for the gns that remain).
    """
    fold_ok = os.environ.get("HVC_GN_FOLD", "1") != "0"  # perf A/B toggle
    out: List[Tuple] = []
    rem_stats: List[Tuple] = []
    gn_i = 0
    i = 0
    while i < len(seg):
        op = seg[i]
        if (op[0] == "conv" and batch == 1 and fold_ok and i + 1 < len(seg)
                and seg[i + 1][0] == "gn"):
            _, kernel, bias, stride = op
            _, groups, scale, gbias = seg[i + 1]
            mean, inv = stats[gn_i]
            gn_i += 1
            C = kernel.shape[0]
            per_ch = C // groups
            m = jnp.repeat(mean.reshape(-1), per_ch).astype(jnp.float32)
            iv = jnp.repeat(inv.reshape(-1), per_ch).astype(jnp.float32)
            a = iv * scale.astype(jnp.float32)
            b = gbias.astype(jnp.float32) - m * a
            k2 = kernel.astype(jnp.float32) * a[:, None, None, None, None]
            b0 = bias.astype(jnp.float32) if bias is not None else 0.0
            out.append(("conv", k2, a * b0 + b, stride))
            i += 2
        elif op[0] == "gn":
            rem_stats.append(stats[gn_i])
            gn_i += 1
            out.append(op)
            i += 1
        else:
            out.append(op)
            i += 1
    return out, rem_stats


def chain_arrays(chain: Sequence[Tuple]) -> List[jnp.ndarray]:
    """The traced array leaves of a chain spec (kernels/biases/scales), in
    order — chain specs mix static fields (strides, group counts, act names)
    with arrays, so they can't cross jax transform boundaries whole."""
    return [p for op in chain for p in op[1:] if isinstance(p, jnp.ndarray)]


def chain_rebuild(chain: Sequence[Tuple], arrays: Sequence[jnp.ndarray]) -> List[Tuple]:
    it = iter(arrays)
    return [tuple(next(it) if isinstance(p, jnp.ndarray) else p for p in op) for op in chain]


def chain_apply_dense_remat(x: jnp.ndarray, chain: Sequence[Tuple], dtype=None) -> jnp.ndarray:
    """chain_apply_dense under jax.checkpoint (arrays split out so the static
    spec fields stay out of the transform)."""
    arrs = chain_arrays(chain)

    @jax.checkpoint
    def f(x, arrs):
        return chain_apply_dense(x, chain_rebuild(chain, arrs), dtype)

    return f(x, arrs)


def chain_apply_dense(x: jnp.ndarray, chain: Sequence[Tuple], dtype=None) -> jnp.ndarray:
    """Reference whole-volume evaluation of the chain (GroupNorm through the
    memory-lean custom-VJP core). Used for small volumes and as the numerical
    oracle for the slab path."""
    from ..parallel import shard_spatial_d

    dtype = dtype or x.dtype
    allow_pallas = chain_pallas_ok(chain, x.shape[3], x.shape[4])
    h = shard_spatial_d(x.astype(dtype))
    for op in chain:
        if op[0] == "conv":
            _, kernel, bias, stride = op
            k = kernel.shape[-1]
            h = conv3d_ncdhw(h, kernel, bias, stride, d_padding=k // 2, hw_padding=k // 2, dtype=dtype,
                             allow_pallas=allow_pallas)
            h = shard_spatial_d(h)  # D-sharded over 'model'; GSPMD adds halos
        elif op[0] == "gn":
            _, groups, scale, bias = op
            h = group_norm_core(h, scale, bias, groups).astype(dtype)
        elif op[0] == "act":
            h = _act(op[1], h)
        else:
            raise ValueError(op[0])
    return h


def _walk_back(chain: Sequence[Tuple], upto: int, start: int = 0) -> Tuple[int, int, int]:
    """Affine map from an output D-range [s, e) at op index `upto` (exclusive)
    back to the required input D-range [F·s + c_lo, F·e + c_hi) at op index
    `start` (i.e. through chain[start:upto]).

    conv k3 s1: [s-1, e+1) ; conv k3 s2: [2s-1, 2e) ; k1 / gn / act: identity.
    """
    F, c_lo, c_hi = 1, 0, 0
    for op in reversed(chain[start:upto]):
        if op[0] != "conv":
            continue
        k = op[1].shape[-1]
        stride = op[3]
        if stride == 2:
            assert k == 3, "slab walk supports k3 for strided convs"
            F, c_lo, c_hi = 2 * F, 2 * c_lo - 1, 2 * c_hi
        elif k == 3:
            c_lo, c_hi = c_lo - 1, c_hi + 1
        else:
            assert k == 1
    return F, c_lo, c_hi


def _level_shape(chain: Sequence[Tuple], upto: int, in_shape, start: int = 0) -> Tuple[int, int, int, int]:
    """(C, D, H, W) of the activation entering op index `upto`, given the
    activation entering op index `start` has shape `in_shape` (NCDHW)."""
    C, D, H, W = in_shape[1], in_shape[2], in_shape[3], in_shape[4]
    for op in chain[start:upto]:
        if op[0] == "conv":
            C = op[1].shape[0]
            s = op[3]
            D, H, W = D // s, H // s, W // s
    return C, D, H, W


def _slice_slab(src: jnp.ndarray, j, F: int, sd: int, c_lo: int, ext: int) -> jnp.ndarray:
    """The D-extended input slab for output slab j: rows r ∈ [0, ext) hold
    global input coord s_lo + r where s_lo = j·F·sd + c_lo.

    Implemented as a CLAMPED dynamic_slice plus a coordinate-aligning roll
    instead of slicing a zero-padded copy of `src`: a full-volume pad must
    materialize when the chain body contains a Pallas conv (whose operand
    layout constraint stops XLA fusing the pad away), and XLA has been seen
    to choose a (B,C)-minor T(2,128) layout for that copy — a 256× (8 GB)
    expansion for a 1-channel 256³ input. Rows rotated in from the wrap are
    garbage-but-masked: their global coords fall outside [0, D_src) and every
    conv input is zero-masked by coordinate (`_mask_outside`) first.
    """
    B, C = src.shape[0], src.shape[1]
    dsrc = src.shape[2]
    s_lo = j * (F * sd) + c_lo
    if isinstance(j, int):  # static slab index (the 1-slab eval schedule):
        # exact halo pad + static slice — no dynamic_slice, no roll
        pad_lo = max(0, -s_lo)
        pad_hi = max(0, s_lo + ext - dsrc)
        xp = src if pad_lo == 0 and pad_hi == 0 else jnp.pad(
            src, ((0, 0), (0, 0), (pad_lo, pad_hi), (0, 0), (0, 0)))
        start = s_lo + pad_lo
        return lax.slice_in_dim(xp, start, start + ext, axis=2)
    if ext > dsrc:  # degenerate (tiny test volumes): pad for real
        pad_lo = max(0, -c_lo)
        xp = jnp.pad(src, ((0, 0), (0, 0), (pad_lo, ext), (0, 0), (0, 0)))
        return lax.dynamic_slice(
            xp, (0, 0, s_lo + pad_lo, 0, 0),
            (B, C, ext, xp.shape[3], xp.shape[4]))
    p = jnp.clip(s_lo, 0, dsrc - ext)
    islab = lax.dynamic_slice(
        src, (0, 0, p, 0, 0), (B, C, ext, src.shape[3], src.shape[4]))
    return jnp.roll(islab, p - s_lo, axis=2)


def _mask_outside(h: jnp.ndarray, lo, level_d: int) -> jnp.ndarray:
    """Zero D-positions whose global coordinate falls outside [0, level_d) —
    replicating dense SAME-conv semantics, where each conv zero-pads ITS OWN
    input: at volume edges the chained intermediate is a zero pad, not the
    value a conv of the zero-padded original input would produce."""
    coords = lo + lax.iota(jnp.int32, h.shape[2])
    valid = (coords >= 0) & (coords < level_d)
    return h * valid.astype(h.dtype)[None, None, :, None, None]


def _run_prefix(islab: jnp.ndarray, chain: Sequence[Tuple], upto: int,
                stats: List[Optional[Tuple[jnp.ndarray, jnp.ndarray]]], dtype,
                lo, level_d: int, start: int = 0,
                allow_pallas: bool = True) -> jnp.ndarray:
    """Evaluate chain[start:upto] on a D-extended slab (convs VALID in D).

    `lo` (traced) is the global D-coordinate of the slab's first element and
    `level_d` the full volume depth at the current level; both walk forward
    through strided convs so out-of-volume positions can be zeroed exactly
    like the dense path's per-conv zero padding. `stats` is indexed by GN
    ordinal within chain[start:upto]."""
    h = islab
    gn_i = 0
    for op in chain[start:upto]:
        if op[0] == "conv":
            _, kernel, bias, stride = op
            k = kernel.shape[-1]
            h = _mask_outside(h, lo, level_d)
            h = conv3d_ncdhw(h, kernel, bias, stride, d_padding=0, hw_padding=k // 2, dtype=dtype,
                             allow_pallas=allow_pallas)
            if k == 3:
                lo = lo + 1  # first VALID output coord (= window center for s2)
            if stride == 2:
                lo = lo // 2  # center → output index (centers are even by slab alignment)
                level_d = level_d // 2
        elif op[0] == "gn":
            _, groups, scale, bias = op
            mean, inv = stats[gn_i]
            h = _gn_normalize(h, groups, scale, bias, mean, inv)
            gn_i += 1
        else:
            h = _act(op[1], h)
    return h


# --------------------------------------------------------------------------
# Flat-layout streamed body. The Pallas conv kernels operate on rank-3
# (B, C, D·H·W) operands whose TPU tiling is (C sublanes, flat lanes); the
# rank-5 NCDHW view tiles (H, W) instead — PHYSICALLY different, so every
# rank-5↔rank-3 boundary inside a slab body is a full-slab relayout (the
# stage-3 device trace showed ~124 ms/step of `reshape`+`copy` HLOs from
# exactly this). These helpers keep the ENTIRE slab body — halo slicing,
# coordinate masking, convs, GroupNorm affine, activations, stats — in the
# flat layout; rank-5 appears only at the chain input and final output.
# --------------------------------------------------------------------------


def _slice_slab_flat(srcf: jnp.ndarray, j, F: int, sd: int, c_lo: int,
                     ext: int, hw: int, dsrc: int) -> jnp.ndarray:
    """_slice_slab on a flat (B, C, D·H·W) source: D-plane r ↔ lane window
    [r·hw, (r+1)·hw). Same clamped-slice + coordinate-aligning-roll scheme
    (rows rotated in are garbage-but-masked, see _slice_slab)."""
    B, C = srcf.shape[0], srcf.shape[1]
    s_lo = j * (F * sd) + c_lo
    if isinstance(j, int):  # static slab index: exact pad + static slice
        pad_lo = max(0, -s_lo)
        pad_hi = max(0, s_lo + ext - dsrc)
        xp = srcf if pad_lo == 0 and pad_hi == 0 else jnp.pad(
            srcf, ((0, 0), (0, 0), (pad_lo * hw, pad_hi * hw)))
        start = (s_lo + pad_lo) * hw
        return lax.slice_in_dim(xp, start, start + ext * hw, axis=2)
    if ext > dsrc:  # degenerate (tiny test volumes): pad for real
        pad_lo = max(0, -c_lo)
        xp = jnp.pad(srcf, ((0, 0), (0, 0), (pad_lo * hw, ext * hw)))
        return lax.dynamic_slice(
            xp, (0, 0, (s_lo + pad_lo) * hw), (B, C, ext * hw))
    p = jnp.clip(s_lo, 0, dsrc - ext)
    islab = lax.dynamic_slice(srcf, (0, 0, p * hw), (B, C, ext * hw))
    return jnp.roll(islab, (p - s_lo) * hw, axis=2)


def _gn_affine_flat(x: jnp.ndarray, groups: int, scale: jnp.ndarray,
                    bias: jnp.ndarray, mean: jnp.ndarray,
                    inv: jnp.ndarray) -> jnp.ndarray:
    """GroupNorm with known global stats as a per-(B, channel) affine on the
    flat layout: y = a·x + b with a = inv·γ, b = β − mean·a. Channels are
    the sublane dim, so the broadcast is layout-native (no group reshape,
    which would relayout the slab). Matches _gn_normalize to within one
    fused-multiply reassociation."""
    C = x.shape[1]
    per = C // groups
    m = jnp.repeat(mean, per, axis=1).astype(jnp.float32)    # (B, C)
    iv = jnp.repeat(inv, per, axis=1).astype(jnp.float32)
    a = iv * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - m * a
    return x * a.astype(x.dtype)[:, :, None] + b.astype(x.dtype)[:, :, None]


def _group_sums_flat(h: jnp.ndarray, groups: int):
    """_group_sums on a flat (B, C, L) slab: reduce the lane dim first
    (layout-native), then fold channels into groups."""
    B = h.shape[0]
    hf = h.astype(jnp.float32)
    cs1 = jnp.sum(hf, axis=2)              # (B, C)
    cs2 = jnp.sum(lax.square(hf), axis=2)  # (B, C)
    return (cs1.reshape(B, groups, -1).sum(-1),
            cs2.reshape(B, groups, -1).sum(-1))


def _conv_flat(h: jnp.ndarray, dims: Tuple[int, int, int], kernel: jnp.ndarray,
               bias, stride: int, dtype, win=None, want_sums: bool = False,
               pro_act: Optional[str] = None):
    """Dispatch one conv on a flat slab: k1 → channel dot_general (already
    layout-native), k3 s1/s2 → the flat Pallas kernels.

    `win` = traced [vlo, vhi) valid-input-plane window: k3 convs zero
    out-of-volume planes IN the kernel (dense SAME-conv zero-pad semantics,
    no whole-slab mask pass). `want_sums` → (out, s1, s2) with in-kernel
    per-channel f32 (sum, sum-of-squares) of the output — the GroupNorm
    statistics by-product (k3 only). `pro_act` fuses the chain's preceding
    activation into the kernel's input load (conv(act(h)); k3 only)."""
    d, H, W = dims
    k = kernel.shape[-1]
    if k == 1 and stride == 1:
        assert pro_act is None
        B = h.shape[0]
        wmat = kernel.reshape(kernel.shape[0], kernel.shape[1]).astype(dtype)
        out = lax.dot_general(
            wmat, h.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (O, B, L)
        out = jnp.moveaxis(out, 0, 1).astype(dtype)
        if bias is not None:
            out = out + bias.astype(out.dtype)[None, :, None]
        return out
    from .pallas.conv3d_k3 import conv3d_k3s1_chain, conv3d_k3s1_flat
    from .pallas.conv3d_k3s2 import conv3d_k3s2_chain, conv3d_k3s2_flat

    b = bias if bias is not None else jnp.zeros((kernel.shape[0],), jnp.float32)
    if win is not None:
        fn = conv3d_k3s1_chain if stride == 1 else conv3d_k3s2_chain
        return fn((d, H, W, want_sums, pro_act), h.astype(dtype), win,
                  kernel.astype(dtype), b)
    assert pro_act is None
    fn = conv3d_k3s1_flat if stride == 1 else conv3d_k3s2_flat
    return fn((d, H, W), h.astype(dtype), kernel.astype(dtype), b)


def _run_prefix_flat(h: jnp.ndarray, seg: Sequence[Tuple],
                     stats: List[Optional[Tuple[jnp.ndarray, jnp.ndarray]]],
                     dtype, lo, level_d: int, dims: Tuple[int, int, int],
                     endpoint_sums: bool = False):
    """_run_prefix on a flat D-extended slab; `dims` = (D rows, H, W) of
    `h`, walked forward through the (already conv-gn-folded) segment.

    Out-of-volume coordinate masking happens INSIDE the k3 conv kernels
    (the [−lo, level_d−lo) plane window), and an activation immediately
    preceding a k3 conv fuses into that conv's input load (the kernels'
    activation prologue) — after the batch-1 conv→gn weight fold, the
    whole segment body is typically pure kernel calls with ZERO standalone
    elementwise passes. With `endpoint_sums` the final op (which must be a
    k3 conv — callers check) also returns per-channel (sum, sum-of-squares)
    accumulated in-kernel, and the return value is (h, s1, s2)."""
    d_cur, H, W = dims
    # Optionally fuse ("act", name) into an immediately following k3 conv
    # (the kernels' activation prologue). DEFAULT OFF — measured a net LOSS
    # on v5e: the fusion removes ~80 ms/step of XLA whole-slab act passes
    # but adds ~130 ms of in-kernel VPU time at stage 3 (the z-stitch loads
    # every plane 3× so the act replays 3.75× per element, and neither a
    # 3×-cheaper erf nor chunked post-stitch application moved the cost —
    # 1459/1471 ms/step fused vs 1404 unfused, trace-measured). Kept behind
    # HVC_ACT_FUSE=1 for future hardware where VPU/DMA ratios differ.
    fuse_ok = os.environ.get("HVC_ACT_FUSE", "0") == "1"
    fused: List[Tuple[Tuple, Optional[str]]] = []
    i = 0
    while i < len(seg):
        op = seg[i]
        if (fuse_ok and op[0] == "act" and i + 1 < len(seg)
                and seg[i + 1][0] == "conv" and seg[i + 1][1].shape[-1] == 3):
            fused.append((seg[i + 1], op[1]))
            i += 2
        else:
            fused.append((op, None))
            i += 1
    gn_i = 0
    for i, (op, pro_act) in enumerate(fused):
        if op[0] == "conv":
            _, kernel, bias, stride = op
            k = kernel.shape[-1]
            win = jnp.stack([-lo, level_d - lo]).astype(jnp.int32) \
                if k == 3 else None
            sums = endpoint_sums and i == len(fused) - 1
            h = _conv_flat(h, (d_cur, H, W), kernel, bias, stride, dtype,
                           win=win, want_sums=sums, pro_act=pro_act)
            if k == 3:
                d_cur = d_cur - 2 if stride == 1 else (d_cur - 1) // 2
                lo = lo + 1  # first VALID output coord (= window center for s2)
            if stride == 2:
                lo = lo // 2  # center → output index (centers even by alignment)
                level_d = level_d // 2
                H, W = H // 2, W // 2
        elif op[0] == "gn":
            _, groups, scale, bias = op
            mean, inv = stats[gn_i]
            gn_i += 1
            h = _gn_affine_flat(h, groups, scale, bias, mean, inv)
        else:
            h = _act(op[1], h)
    return h


def chain_apply_slab(x: jnp.ndarray, chain: Sequence[Tuple], num_slabs: int = 8,
                     dtype=None) -> jnp.ndarray:
    """Streaming evaluation: identical math to chain_apply_dense, but no
    intermediate ever exceeds one D-slab (+conv halo) of the volume."""
    dtype = dtype or x.dtype
    x = x.astype(dtype)
    B = x.shape[0]
    gn_positions = [i for i, op in enumerate(chain) if op[0] == "gn"]

    def run_pass(upto: Optional[int], stats: List) -> Any:
        """upto=index of a gn op → accumulate its (sum, sumsq); upto=None →
        emit the chain output."""
        end = len(chain) if upto is None else upto
        allow_pallas = chain_pallas_ok(chain[:end], x.shape[3], x.shape[4])
        C_out, D_out, H_out, W_out = _level_shape(chain, end, x.shape)
        n = num_slabs
        while D_out % n:
            n //= 2
        n = max(n, 1)
        sd = D_out // n
        F, c_lo, c_hi = _walk_back(chain, end)
        ext = F * sd + (c_hi - c_lo)

        if upto is not None:
            groups = chain[upto][1]

        seg, seg_stats = _fold_conv_gn(chain[:end], stats, B)

        @jax.checkpoint
        def body(carry, j):
            islab = _slice_slab(x, j, F, sd, c_lo, ext)
            h = _run_prefix(islab, seg, len(seg), seg_stats, dtype,
                            j * (F * sd) + c_lo, x.shape[2],
                            allow_pallas=allow_pallas)
            if upto is None:
                return carry, h
            g1, g2 = _group_sums(h, groups)
            return (carry[0] + g1, carry[1] + g2), None

        if upto is None:
            _, ys = lax.scan(body, 0, jnp.arange(n))
            # (n, B, C, sd, H, W) → (B, C, D, H, W)
            return jnp.moveaxis(ys, 0, 2).reshape(B, C_out, D_out, H_out, W_out)
        groups = chain[upto][1]
        zeros = jnp.zeros((B, groups), jnp.float32)
        (s1, s2), _ = lax.scan(body, (zeros, zeros), jnp.arange(n))
        count = (C_out // groups) * D_out * H_out * W_out
        return _stats_from_sums(s1, s2, float(count))

    stats: List = []
    for gi in gn_positions:
        stats.append(run_pass(gi, stats))
    return run_pass(None, stats)


def _conv_flops(chain: Sequence[Tuple], start: int, end: int, in_shape) -> float:
    """MAC-pair FLOPs of the convs in chain[start:end] on a full volume."""
    total = 0.0
    D, H, W = in_shape[2], in_shape[3], in_shape[4]
    for i in range(start, end):
        op = chain[i]
        if op[0] == "conv":
            kernel = op[1]
            o, cin, k = kernel.shape[0], kernel.shape[1], kernel.shape[-1]
            s = op[3]
            D, H, W = D // s, H // s, W // s
            total += 2.0 * in_shape[0] * o * cin * (k ** 3) * D * H * W
    return total


def chain_apply_streamed(x: jnp.ndarray, chain: Sequence[Tuple], num_slabs: int = 8,
                         dtype=None, store_min_flops: float = 1e11,
                         dense_max_voxels: int = 129 ** 3) -> jnp.ndarray:
    """Streaming chain evaluation v2 — same math as chain_apply_slab, much
    less recompute (the v1 scheme cost 3.8 s of the 5.49 s stage-3 step,
    measured round 3):

      * stats+emit fusion: one pass per GroupNorm — each pass streams from
        the nearest materialized source, emits its endpoint (pre-GN
        activation) when worth storing, and accumulates that GN's global
        (sum, sum-of-squares) in the same lax.scan;
      * endpoint storing: a pass whose segment holds ≥ `store_min_flops` of
        conv work stores its (bf16, densely-tiled) endpoint so later passes
        READ it instead of re-running the conv prefix (detail-enhancer
        conv1: 1.86 TFLOP recomputed twice in v1, once here). Cheap segments
        (e.g. a 1→64 k3 conv, 58 GFLOP) stay recompute-only so the HBM cost
        is bounded to ~1–1.6 GB per chain at 256³;
      * dense tail: once every remaining intermediate fits
        `dense_max_voxels` (after a stride-2 stem conv drops 256³→128³), the
        remainder runs dense (group_norm_core) — streaming only ever pays at
        full resolution.

    Numerics match chain_apply_dense / chain_apply_slab (fp32 GN statistics,
    identical conv padding semantics); tested for equality in test_slab.py.
    """
    dtype = dtype or x.dtype
    x = x.astype(dtype)
    B = x.shape[0]
    n_ops = len(chain)
    gn_positions = [i for i, op in enumerate(chain) if op[0] == "gn"]
    boundaries = gn_positions + [n_ops]
    stats_by_pos = {}

    def remaining_fits_dense(src_idx: int, src_shape) -> bool:
        levels = [_level_shape(chain, i, src_shape, start=src_idx)
                  for i in range(src_idx, n_ops + 1)]
        return all(D * H * W <= dense_max_voxels for (_, D, H, W) in levels)

    def stream_pass(src, src_shape, src_flat: bool, src_idx: int, end: int,
                    emit: bool, want_stats: bool):
        """Run chain[src_idx:end] slab-streamed over `src`. Returns
        (endpoint | None, endpoint_is_flat, (mean, inv) | None).

        Pallas-eligible segments run entirely in the flat (B, C, D·H·W)
        layout (_run_prefix_flat) — slicing, masking, convs, GN and stats
        all share the kernels' (C, lanes) tiling, so the body executes with
        ZERO relayouts; XLA-conv segments keep the rank-5 body."""
        seg_stats = [stats_by_pos[p] for p in gn_positions if src_idx <= p < end]
        seg, seg_stats = _fold_conv_gn(chain[src_idx:end], seg_stats, B)
        use_flat = chain_pallas_ok(chain[src_idx:end],
                                   src_shape[3], src_shape[4])
        dsrc, Hs, Ws = src_shape[2], src_shape[3], src_shape[4]
        if use_flat and not src_flat:
            src = src.reshape(B, src_shape[1], dsrc * Hs * Ws)
        elif not use_flat and src_flat:
            src = src.reshape(src_shape)
        C_out, D_out, H_out, W_out = _level_shape(chain, end, src_shape, start=src_idx)
        n = num_slabs
        while D_out % n:
            n //= 2
        n = max(n, 1)
        sd = D_out // n
        F, c_lo, c_hi = _walk_back(chain, end, start=src_idx)
        ext = F * sd + (c_hi - c_lo)

        groups = chain[end][1] if want_stats else 1
        # endpoint stats as a kernel by-product: available when the segment
        # ends in a k3 conv (it always does at the gn boundaries of the
        # cascade's chains) — no whole-slab stats read-back pass
        ksums = (use_flat and want_stats and len(seg) > 0
                 and seg[-1][0] == "conv" and seg[-1][1].shape[-1] == 3)

        def body(carry, j):
            if use_flat:
                islab = _slice_slab_flat(src, j, F, sd, c_lo, ext, Hs * Ws, dsrc)
                res = _run_prefix_flat(islab, seg, seg_stats, dtype,
                                       j * (F * sd) + c_lo, dsrc,
                                       (ext, Hs, Ws), endpoint_sums=ksums)
                if ksums:
                    h, c1, c2 = res
                    carry = (carry[0] + c1.reshape(B, groups, -1).sum(-1),
                             carry[1] + c2.reshape(B, groups, -1).sum(-1))
                    return carry, (h if emit else None)
                h = res
            else:
                islab = _slice_slab(src, j, F, sd, c_lo, ext)
                h = _run_prefix(islab, seg, len(seg), seg_stats, dtype,
                                j * (F * sd) + c_lo, dsrc, start=0,
                                allow_pallas=False)
            if want_stats:
                g1, g2 = (_group_sums_flat if use_flat else _group_sums)(h, groups)
                carry = (carry[0] + g1, carry[1] + g2)
            return carry, (h if emit else None)

        init = (jnp.zeros((B, groups), jnp.float32),) * 2 if want_stats else 0
        if n == 1:
            # single whole-volume slab (the eval schedule): straight-line
            # call with a STATIC slab index — no lax.scan while-loop, no
            # dynamic-update-slice into a stacked ys buffer, and the halo
            # slice becomes an exact pad + static slice (see _slice_slab*).
            carry, y = jax.checkpoint(lambda c: body(c, 0))(init)
            out = y if emit else None
            if emit and use_flat:
                out = out.reshape(B, C_out, D_out * H_out * W_out)
        else:
            carry, ys = lax.scan(jax.checkpoint(body), init, jnp.arange(n))
            out = None
            if emit:
                if use_flat:  # ys (n, B, C, sd·H·W) → flat (B, C, D·H·W)
                    out = jnp.moveaxis(ys, 0, 2).reshape(
                        B, C_out, D_out * H_out * W_out)
                else:
                    out = jnp.moveaxis(ys, 0, 2).reshape(B, C_out, D_out, H_out, W_out)
        st = None
        if want_stats:
            count = (C_out // groups) * D_out * H_out * W_out
            st = _stats_from_sums(carry[0], carry[1], float(count))
        return out, use_flat, st

    src, src_shape, src_flat, src_idx = x, x.shape, False, 0
    for b in boundaries:
        if remaining_fits_dense(src_idx, src_shape):
            if src_flat:
                src = src.reshape(src_shape)
            return chain_apply_dense(src, list(chain[src_idx:]), dtype)
        is_final = b == n_ops
        seg_flops = _conv_flops(chain, src_idx, b, src_shape)
        store = is_final or seg_flops >= store_min_flops
        out, out_flat, st = stream_pass(src, src_shape, src_flat, src_idx, b,
                                        emit=store, want_stats=not is_final)
        out_shape = (B,) + tuple(_level_shape(chain, b, src_shape, start=src_idx))
        if is_final:
            return out.reshape(out_shape) if out_flat else out
        stats_by_pos[b] = st
        if store:
            src, src_shape, src_flat, src_idx = out, out_shape, out_flat, b
    raise AssertionError("unreachable")

"""Pallas TPU implicit-GEMM 3×3×3 stride-2 conv for NCDHW slab chains.

Why: the cascade's stride-2 stem convs (reference hybrid_vit_backbone.py
token stem / model_progressive.py:238-243 consumed at 256³) are the only
ops keeping the stage-3 trunk chain on XLA's conv path — and a single
XLA-conv↔Pallas boundary inside a slab body forces a ~300 ms/pass relayout
(see conv3d_k3.py). XLA's own numbers at the trunk shape (32→64 s2 @256³):
67 ms fwd / 140 ms bwd, plus 179 ms for the bwd of the 1→32 s1 conv it
pins to XLA. This kernel makes the full-resolution trunk segment
all-Pallas.

The stride-2 lane problem and its MXU solution: output lane x' reads input
lanes 2x'+δ — a stride-2 gather that TPU vector units cannot do cheaply.
Instead the kernel PACKS each input row into even/odd parity halves with
one MXU dot against a constant selection matrix S (W, 2·W/2) where
S[w, c] = 1 iff w == 2c (left half) or w == 2(c−W/2)+1 (right half).
After packing, every tap is an ALIGNED window + the same
accumulator-roll/mask trick as the stride-1 kernel:

  tap δx = −1 → odd lanes, value at packed col x'−1 → roll(+1) on the
               f32 partial, first-lane-of-row masked (SAME zero padding)
  tap δx =  0 → even lanes, direct
  tap δx = +1 → odd lanes, direct

y parity is free (packed rows route to per-parity scratch rows, statically)
and z parity is free (three 1-deep plane block specs at indices 2z'+r).
The dz-pair K-packed dot layout matches the s1 kernel: scratch rows are
z-major (r·C + c), so taps (r=0, r=1) contract as one K=2C dot and r=2 as
a K=C single.

Gradients are exact (custom VJP):
  * dgrad is the mirrored scatter: per input row, tap dots against g
    produce even/odd partial columns which one dot against Sᵀ interleaves
    back to W lanes; z/y parity routing mirrors the forward.
  * wgrad reuses the forward's packed scratch and contracts each tap
    window against g over lanes (deep-K accumulation as in the s1 wgrad).

Contract: x (B, Cin, 2·D'+1, H, W) VALID in D — output plane z' consumes
input planes 2z', 2z'+1, 2z'+2 (callers pre-halo; `conv3d_k3s2_same` pads
one front plane for SAME semantics). H, W even; W/2 a multiple of 128.
Runs interpreted on CPU (tests), compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .conv3d_k3 import _NOMASK, _dact_f32, _msk_spec, _pact, _window_arr


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def supports_s2(cin: int, k: int, stride: int, h: int, w: int) -> bool:
    """Shape gate for the stride-2 Pallas path."""
    return (
        k == 3
        and stride == 2
        and cin >= 1
        and w % 256 == 0
        and h % 2 == 0
        and h >= 4
    )


def _row_block(hp: int) -> int:
    """Output y-rows per grid step: 8 when it divides H' (it does at the
    cascade shapes), else the largest power-of-two divisor."""
    rows = 8
    while hp % rows:
        rows //= 2
    return max(rows, 1)


def _sel_matrix(w: int, dtype) -> np.ndarray:
    """Constant pack matrix S (W, 2·W/2): [even-lane gather | odd-lane
    gather]. in_row @ S = [in[0::2] | in[1::2]]."""
    xp = w // 2
    s = np.zeros((w, 2 * xp), np.float32)
    s[2 * np.arange(xp), np.arange(xp)] = 1.0
    s[2 * np.arange(xp) + 1, xp + np.arange(xp)] = 1.0
    return s.astype(dtype)


def _pack_weights_s2(w: jnp.ndarray, dtype):
    """(Cout, Cin, 3, 3, 3) OIDHW → pair (3dx, 3dy, Cout, 2Cin) over taps
    dz∈{0,1} and single (3dx, 3dy, Cout, Cin) for dz=2; K rows z-major."""
    wt = jnp.transpose(w, (4, 3, 0, 2, 1)).astype(dtype)  # (dx, dy, Cout, dz, Cin)
    cout, cin = w.shape[0], w.shape[1]
    pair = wt[:, :, :, 0:2, :].reshape(3, 3, cout, 2 * cin)
    sing = wt[:, :, :, 2, :]
    return pair, sing


def _fwd_kernel(cin: int, cout: int, rp: int, xp: int, w_in: int,
                dp: int, want_sums: bool, act, out_dtype, *refs):
    # Inputs: 3 z-plane main blocks (1, C, 2rp·W), 3 z-plane front-edge rows
    # (1, C, W), mask scalars, S (W, 2Xp), pair/single weights, bias; out
    # (1, Cout, rp·Xp) (+ optional (1, 1, 2, Cout) stats partials); scratch
    # s_ref (2·2·3C, (rp+1)·Xp) laid out [py][px][3C] in sublanes.
    if want_sums:
        (m0, m1, m2, e0, e1, e2, msk_ref, s_mat, wp_ref, ws_ref, b_ref,
         o_ref, sums_ref, s_ref) = refs
    else:
        (m0, m1, m2, e0, e1, e2, msk_ref, s_mat, wp_ref, ws_ref, b_ref,
         o_ref, s_ref) = refs[:13]
        sums_ref = None
    j = pl.program_id(1)
    v = pl.program_id(0) % dp
    vlo = msk_ref[0, 0]
    vhi = msk_ref[0, 1]
    Lp = rp * xp

    def srow(py: int, px: int) -> int:
        return (py * 2 + px) * 3 * cin

    # ---- pack stage: parity-split every input row with one MXU dot;
    # z-planes whose REAL index q = 2v + r is outside [vlo, vhi) pack as
    # zeros (in-kernel coordinate masking, see conv3d_k3.py _stitch_z).
    # The fused activation prologue applies to the packed scratch AFTER this
    # loop (S is a selection matrix, so pack∘act = act∘pack; values reaching
    # the scratch are exact bf16 inputs, so act numerics match the s1
    # kernel's). ----
    for r, (main, edge) in enumerate(((m0, e0), (m1, e1), (m2, e2))):
        zok = (2 * v + r >= vlo) & (2 * v + r < vhi)
        # front edge row: input y = 2·y'lo − 1 (odd) → py1 scratch row 0
        pk = lax.dot_general(edge[0, :, :], s_mat[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        pk = jnp.where(zok & (j > 0), pk, 0.0).astype(s_ref.dtype)
        s_ref[pl.ds(srow(1, 0) + r * cin, cin), 0:xp] = pk[:, 0:xp]
        s_ref[pl.ds(srow(1, 1) + r * cin, cin), 0:xp] = pk[:, xp:]
        # main rows, (even, odd) pairs stacked into one 2C-row dot
        rows = main[0, :, :]
        for t in range(rp):
            two = jnp.concatenate(
                [rows[:, 2 * t * w_in:(2 * t + 1) * w_in],
                 rows[:, (2 * t + 1) * w_in:(2 * t + 2) * w_in]],
                axis=0)  # (2C, W): top=even y row, bottom=odd
            pk = lax.dot_general(two, s_mat[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            pk = jnp.where(zok, pk, 0.0).astype(s_ref.dtype)
            s_ref[pl.ds(srow(0, 0) + r * cin, cin),
                  pl.ds(t * xp, xp)] = pk[0:cin, 0:xp]
            s_ref[pl.ds(srow(0, 1) + r * cin, cin),
                  pl.ds(t * xp, xp)] = pk[0:cin, xp:]
            s_ref[pl.ds(srow(1, 0) + r * cin, cin),
                  pl.ds((t + 1) * xp, xp)] = pk[cin:, 0:xp]
            s_ref[pl.ds(srow(1, 1) + r * cin, cin),
                  pl.ds((t + 1) * xp, xp)] = pk[cin:, xp:]

    if act is not None:
        # one whole-scratch activation pass after the (pure movement) pack
        # stage; act(0) = 0 keeps masked rows masked, and the unwritten py0
        # tail column is never read by the tap windows (see conv3d_k3.py
        # _stitch_z for why act is not applied inline in the pack)
        # chunked per parity group to bound f32 VPU temporaries
        # (see conv3d_k3.py _stitch_z)
        for pg in range(4):
            s_ref[pl.ds(pg * 3 * cin, 3 * cin), :] = _pact(
                act, s_ref[pl.ds(pg * 3 * cin, 3 * cin), :])

    # ---- conv stage: 9 tap columns, dz-pair + dz-single dots ----
    acc = jnp.broadcast_to(b_ref[:, :].astype(jnp.float32), (cout, Lp))
    lane = lax.broadcasted_iota(jnp.int32, (1, Lp), 1) % xp
    # (δy, δx) → (py, y-window offset in rows), (px, needs-roll)
    ytap = ((1, 0), (0, 0), (1, 1))   # δy = −1, 0, +1
    xtap = ((1, True), (0, False), (1, False))  # δx = −1, 0, +1
    for dxi, (px, needs_roll) in enumerate(xtap):
        p = jnp.zeros((cout, Lp), jnp.float32)
        for dyi, (py, oy) in enumerate(ytap):
            base = srow(py, px)
            win = s_ref[pl.ds(base, 3 * cin), pl.ds(oy * xp, Lp)]
            p += lax.dot_general(
                wp_ref[dxi, dyi], win[0:2 * cin, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            p += lax.dot_general(
                ws_ref[dxi, dyi], win[2 * cin:3 * cin, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if needs_roll:
            acc += jnp.where(lane == 0, 0.0, jnp.roll(p, 1, axis=1))
        else:
            acc += p
    outv = acc.astype(out_dtype)
    o_ref[0, :, :] = outv
    if sums_ref is not None:
        of = outv.astype(jnp.float32)
        sums_ref[0, 0, :, :] = jnp.stack(
            [jnp.sum(of, axis=1), jnp.sum(of * of, axis=1)])


def _fwd_specs(cin: int, dp: int, rp: int, w_in: int, h_in: int):
    """Input specs over x flattened to (B, Cin, Dext·H·W): per z-offset
    r ∈ {0,1,2} (input plane 2z'+r) a main (2rp rows) block and a W-wide
    front-edge row (input y = 2·y'lo−1, clamped at plane start)."""
    e_in = h_in * w_in  # lanes per input plane
    specs = []
    for r in (0, 1, 2):
        specs.append(pl.BlockSpec(
            (1, cin, 2 * rp * w_in),
            functools.partial(
                lambda r, bd, j: (bd // dp, 0,
                                  ((bd % dp) * 2 + r) * (e_in // (2 * rp * w_in)) + j),
                r)))
    for r in (0, 1, 2):
        specs.append(pl.BlockSpec(
            (1, cin, w_in),
            functools.partial(
                lambda r, bd, j: (bd // dp, 0,
                                  ((bd % dp) * 2 + r) * (e_in // w_in)
                                  + jnp.maximum(2 * j * rp - 1, 0)), r)))
    return specs


def _conv_fwd_s2(xf: jnp.ndarray, dims: tuple, w: jnp.ndarray,
                 bias: jnp.ndarray, interpret: bool, window=None,
                 want_sums: bool = False, act: Optional[str] = None):
    """xf: (B, Cin, (2D'+1)·H·W) VALID in D → (B, Cout, D'·(H/2)·(W/2)).

    Flat rank-3 I/O like conv3d_k3.py's _conv_fwd — slab-chain bodies stay
    in the kernel's (C, lanes) physical layout across conv boundaries."""
    dext, H, W = dims
    B, cin = xf.shape[0], xf.shape[1]
    cout = w.shape[0]
    dp, hp, xp = (dext - 1) // 2, H // 2, W // 2
    rp = _row_block(hp)
    Lp = rp * xp
    wp, ws = _pack_weights_s2(w, xf.dtype)
    b2 = bias.astype(jnp.float32).reshape(cout, 1)
    s_mat = jnp.asarray(_sel_matrix(W, np.float32)).astype(xf.dtype)
    nj = hp // rp
    msk = _window_arr(dext, window)

    out_shapes = [jax.ShapeDtypeStruct((B, cout, dp * hp * xp), xf.dtype)]
    out_specs = [pl.BlockSpec(
        (1, cout, Lp),
        lambda bd, j: (bd // dp, 0, (bd % dp) * nj + j))]
    if want_sums:
        out_shapes.append(jax.ShapeDtypeStruct((B * dp, nj, 2, cout), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 2, cout),
                                      lambda bd, j: (bd, j, 0, 0)))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cin, cout, rp, xp, W, dp, want_sums,
                          act, xf.dtype),
        grid=(B * dp, nj),
        in_specs=_fwd_specs(cin, dp, rp, W, H) + [
            _msk_spec(),
            pl.BlockSpec((W, 2 * xp), lambda bd, j: (0, 0)),
            pl.BlockSpec((3, 3, cout, 2 * cin), lambda bd, j: (0, 0, 0, 0)),
            pl.BlockSpec((3, 3, cout, cin), lambda bd, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout, 1), lambda bd, j: (0, 0)),
        ],
        out_specs=tuple(out_specs) if want_sums else out_specs[0],
        out_shape=tuple(out_shapes) if want_sums else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((4 * 3 * cin, (rp + 1) * xp), xf.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
        interpret=interpret,
    )(*([xf] * 6), msk, s_mat, wp, ws, b2)
    if not want_sums:
        return out
    o, parts = out
    ps = parts.reshape(B, dp, nj, 2, cout).sum(axis=(1, 2))
    return o, ps[:, 0], ps[:, 1]


# --------------------------------------------------------------------------
# dgrad: dx from g, split into even/odd output-z-plane calls so each kernel
# is branch-free (even input planes take taps dz ∈ {0, 2} as one K=2·Cout
# pair dot; odd planes take dz=1 as a K=Cout single).
# --------------------------------------------------------------------------


def _dgrad_kernel(cout: int, cin: int, rp: int, xp: int, w_in: int,
                  nplanes: int, even: bool, dact_act, out_dtype, *refs):
    x_ref = None
    if even:
        if dact_act is not None:
            (ga, gb, ea, eb, msk_ref, s_mat, wt_ref, x_ref, o_ref, s_ref) = refs
        else:
            (ga, gb, ea, eb, msk_ref, s_mat, wt_ref, o_ref, s_ref) = refs
        kk = 2 * cout
    else:
        if dact_act is not None:
            (gb, eb, msk_ref, s_mat, wt_ref, x_ref, o_ref, s_ref) = refs
        else:
            (gb, eb, msk_ref, s_mat, wt_ref, o_ref, s_ref) = refs
        kk = cout
    bd = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    v = bd % nplanes
    Lp = rp * xp

    # ---- stitch g scratch (kk, (rp+1)·Xp): K rows z-major, rows clamped
    # at plane bounds are zero-masked (SAME zero padding / plane validity).
    def put(row0: int, main, edge, valid):
        zero = jnp.zeros((), main.dtype)
        mrows = jnp.where(valid, main[0, :, :], zero)
        erows = jnp.where(valid & (j < nj - 1), edge[0, :, :], zero)
        s_ref[pl.ds(row0, cout), 0:Lp] = mrows
        s_ref[pl.ds(row0, cout), Lp:Lp + xp] = erows

    if even:
        put(0, ga, ea, v > 0)               # dz=2 tap → g plane v−1
        put(cout, gb, eb, v < nplanes - 1)  # dz=0 tap → g plane v
    else:
        put(0, gb, eb, v >= 0)              # dz=1 tap → g plane v (always)

    # ---- 9 tap dots into 4 (x-parity × y-parity) partial planes ----
    lane = lax.broadcasted_iota(jnp.int32, (1, Lp), 1) % xp

    def dot(dxi: int, dyi: int, off: int):
        win = s_ref[pl.ds(0, kk), pl.ds(off * xp, Lp)]
        return lax.dot_general(wt_ref[dxi, dyi], win,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def rollm1(p):
        return jnp.where(lane == xp - 1, 0.0, jnp.roll(p, -1, axis=1))

    pe_ev = dot(1, 1, 0)
    po_ev = dot(2, 1, 0) + rollm1(dot(0, 1, 0))
    pe_od = dot(1, 2, 0) + dot(1, 0, 1)
    po_od = (dot(2, 2, 0) + rollm1(dot(0, 2, 0))
             + dot(2, 0, 1) + rollm1(dot(0, 0, 1)))

    # ---- unpack: interleave x parities back to W lanes, row by row.
    # The REAL x-plane this block writes is 2v (even call) / 2v+1 (odd);
    # planes outside the [olo, ohi) window emit exact zeros — the
    # transpose of the forward's in-kernel coordinate masking, so upstream
    # weight gradients see no contamination from out-of-volume rows. ----
    xplane = 2 * v if even else 2 * v + 1
    ok = (xplane >= msk_ref[0, 2]) & (xplane < msk_ref[0, 3])
    for t in range(rp):
        for prow, (pe, po) in ((0, (pe_ev, po_ev)), (1, (pe_od, po_od))):
            both = jnp.concatenate(
                [pe[:, t * xp:(t + 1) * xp], po[:, t * xp:(t + 1) * xp]],
                axis=1)  # (C, 2Xp)
            row = lax.dot_general(both, s_mat[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            if dact_act is not None:
                # fused-prologue backward: dx = act'(x) ⊙ convᵀ(g), x read
                # at this output row's own coordinates
                xrow = x_ref[0, :, (2 * t + prow) * w_in:(2 * t + prow + 1) * w_in]
                row = row * _dact_f32(dact_act, xrow)
            o_ref[0, :, (2 * t + prow) * w_in:(2 * t + prow + 1) * w_in] = (
                jnp.where(ok, row, 0.0).astype(out_dtype))


def _g_specs(cout: int, nplanes: int, rp: int, xp: int, hp: int, even: bool):
    """g blocks over (B, Cout, D'·H'·Xp): per needed z'-plane (A = v−1,
    B = v for the even call; just v for odd) a main rp-row block and a
    clamped back-edge row."""
    jl = hp // rp
    maxb = nplanes - 2 if even else nplanes - 1  # even call: g has dp planes

    def clampA(bd, j):
        return (bd // nplanes, 0,
                jnp.maximum(bd % nplanes - 1, 0) * jl + j)

    def clampB(bd, j):
        return (bd // nplanes, 0,
                jnp.minimum(bd % nplanes, maxb) * jl + j)

    def edgeA(bd, j):
        return (bd // nplanes, 0,
                jnp.maximum(bd % nplanes - 1, 0) * hp
                + jnp.minimum((j + 1) * rp, hp - 1))

    def edgeB(bd, j):
        return (bd // nplanes, 0,
                jnp.minimum(bd % nplanes, maxb) * hp
                + jnp.minimum((j + 1) * rp, hp - 1))

    main = pl.BlockSpec((1, cout, rp * xp), clampB)
    edge = pl.BlockSpec((1, cout, xp), edgeB)
    if not even:
        return [main, edge]
    return [pl.BlockSpec((1, cout, rp * xp), clampA), main,
            pl.BlockSpec((1, cout, xp), edgeA), edge]


def _dgrad_s2(gf: jnp.ndarray, gdims: tuple, w: jnp.ndarray,
              interpret: bool, out_window=None, dact=None) -> jnp.ndarray:
    """Flat dx (B, Cin, (2D'+1)·H·W) from gf (B, Cout, D'·H'·Xp);
    gdims = (D', H', Xp). dact = (act_name, x_flat): multiply the emitted
    rows by act'(x) — the backward of the forward's fused activation
    prologue (x_flat is the forward's input, (B, Cin, (2D'+1)·H·W))."""
    dp, hp, xp = gdims
    B, cout = gf.shape[0], gf.shape[1]
    cin = w.shape[1]
    H, W = 2 * hp, 2 * xp
    rp = _row_block(hp)
    s_mat = jnp.asarray(_sel_matrix(W, np.float32)).astype(gf.dtype)
    # (dx, dy, Cin, Cout, dz)
    wt = jnp.transpose(w, (4, 3, 1, 0, 2)).astype(gf.dtype)
    pairT = jnp.concatenate([wt[..., 2], wt[..., 0]], axis=-1)
    singleT = wt[..., 1]
    if out_window is None:
        msk = jnp.array([[0, dp, _NOMASK[0], _NOMASK[1]]], jnp.int32)
    else:
        msk = jnp.stack((jnp.int32(0), jnp.int32(dp),
                         out_window[0], out_window[1])).astype(jnp.int32).reshape(1, 4)
    dact_act = dact[0] if dact is not None else None

    outs = []
    for even in (True, False):
        nplanes = dp + 1 if even else dp
        wt_arr = pairT if even else singleT
        kk = 2 * cout if even else cout
        dact_specs, dact_ops = [], []
        if dact is not None:
            # x block at this call's own output plane (2v / 2v+1 of the
            # forward input's 2D'+1 planes), same 2rp-row geometry as out
            par = 0 if even else 1
            dact_specs = [pl.BlockSpec(
                (1, cin, 2 * rp * W),
                lambda bd, j, n=nplanes, par=par: (
                    bd // n, 0, (2 * (bd % n) + par) * (hp // rp) + j))]
            dact_ops = [dact[1]]
        out = pl.pallas_call(
            functools.partial(_dgrad_kernel, cout, cin, rp, xp, W,
                              nplanes, even, dact_act, gf.dtype),
            grid=(B * nplanes, hp // rp),
            in_specs=_g_specs(cout, nplanes, rp, xp, hp, even) + [
                _msk_spec(),
                pl.BlockSpec((W, 2 * xp), lambda bd, j: (0, 0)),
                pl.BlockSpec((3, 3, cin, kk), lambda bd, j: (0, 0, 0, 0)),
            ] + dact_specs,
            out_specs=pl.BlockSpec(
                (1, cin, 2 * rp * W),
                lambda bd, j, n=nplanes: (bd // n, 0,
                                          (bd % n) * (hp // rp) + j)),
            out_shape=jax.ShapeDtypeStruct((B, cin, nplanes * H * W), gf.dtype),
            scratch_shapes=[pltpu.VMEM((kk, (rp + 1) * xp), gf.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel")),
            interpret=interpret,
        )(*([gf] * (4 if even else 2)), msk, s_mat, wt_arr, *dact_ops)
        outs.append(out)
    dxe, dxo = outs  # flat (B, cin, (dp+1)·E), (B, cin, dp·E); E = H·W
    E = H * W
    inter = jnp.stack([dxe[:, :, :dp * E].reshape(B, cin, dp, E),
                       dxo.reshape(B, cin, dp, E)],
                      axis=3).reshape(B, cin, 2 * dp * E)
    return jnp.concatenate([inter, dxe[:, :, dp * E:]], axis=2)


# --------------------------------------------------------------------------
# wgrad: reuses the forward's parity-packed scratch; each tap window is
# contracted against g over lanes (deep-K accumulation, as in the s1 wgrad).
# --------------------------------------------------------------------------


def _wgrad_kernel(cin: int, cout: int, rp: int, xp: int, w_in: int,
                  dp: int, act, *refs):
    (m0, m1, m2, e0, e1, e2, msk_ref, s_mat, g_ref, o_ref, s_ref) = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = pl.program_id(0) * nj + j
    v = pl.program_id(0) % dp
    vlo = msk_ref[0, 0]
    vhi = msk_ref[0, 1]
    Lp = rp * xp

    def srow(py: int, px: int) -> int:
        return (py * 2 + px) * 3 * cin

    for r, (main, edge) in enumerate(((m0, e0), (m1, e1), (m2, e2))):
        zok = (2 * v + r >= vlo) & (2 * v + r < vhi)
        pk = lax.dot_general(edge[0, :, :], s_mat[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        pk = jnp.where(zok & (j > 0), pk, 0.0).astype(s_ref.dtype)
        s_ref[pl.ds(srow(1, 0) + r * cin, cin), 0:xp] = pk[:, 0:xp]
        s_ref[pl.ds(srow(1, 1) + r * cin, cin), 0:xp] = pk[:, xp:]
        rows = main[0, :, :]
        for t in range(rp):
            two = jnp.concatenate(
                [rows[:, 2 * t * w_in:(2 * t + 1) * w_in],
                 rows[:, (2 * t + 1) * w_in:(2 * t + 2) * w_in]],
                axis=0)
            pk = lax.dot_general(two, s_mat[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            pk = jnp.where(zok, pk, 0.0).astype(s_ref.dtype)
            s_ref[pl.ds(srow(0, 0) + r * cin, cin),
                  pl.ds(t * xp, xp)] = pk[0:cin, 0:xp]
            s_ref[pl.ds(srow(0, 1) + r * cin, cin),
                  pl.ds(t * xp, xp)] = pk[0:cin, xp:]
            s_ref[pl.ds(srow(1, 0) + r * cin, cin),
                  pl.ds((t + 1) * xp, xp)] = pk[cin:, 0:xp]
            s_ref[pl.ds(srow(1, 1) + r * cin, cin),
                  pl.ds((t + 1) * xp, xp)] = pk[cin:, xp:]

    if act is not None:
        # chunked per parity group to bound f32 VPU temporaries
        # (see conv3d_k3.py _stitch_z)
        for pg in range(4):
            s_ref[pl.ds(pg * 3 * cin, 3 * cin), :] = _pact(
                act, s_ref[pl.ds(pg * 3 * cin, 3 * cin), :])

    g = g_ref[0, :, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, Lp), 1) % xp
    gm1 = jnp.where(lane == xp - 1, jnp.zeros((), g.dtype),
                    jnp.roll(g, -1, axis=1))

    @pl.when(step == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    ytap = ((1, 0), (0, 0), (1, 1))
    xtap = ((1, True), (0, False), (1, False))
    for dxi, (px, shifted) in enumerate(xtap):
        gs = gm1 if shifted else g
        for dyi, (py, oy) in enumerate(ytap):
            win = s_ref[pl.ds(srow(py, px), 3 * cin), pl.ds(oy * xp, Lp)]
            part = lax.dot_general(win[...], gs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            o_ref[dxi, dyi] += part


def _wgrad_s2(xf: jnp.ndarray, dims: tuple, gf: jnp.ndarray, cout: int,
              interpret: bool, window=None, act=None) -> jnp.ndarray:
    """dW (Cout, Cin, 3, 3, 3) from flat xf (B, Cin, (2D'+1)·H·W) and
    gf (B, Cout, D'·H'·Xp); dims = (2D'+1, H, W); `act` replays the
    forward's activation prologue."""
    dext, H, W = dims
    B, cin = xf.shape[0], xf.shape[1]
    dp, hp, xp = (dext - 1) // 2, H // 2, W // 2
    rp = _row_block(hp)
    Lp = rp * xp
    s_mat = jnp.asarray(_sel_matrix(W, np.float32)).astype(xf.dtype)
    msk = _window_arr(dext, window)

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, cin, cout, rp, xp, W, dp, act),
        grid=(B * dp, hp // rp),
        in_specs=_fwd_specs(cin, dp, rp, W, H) + [
            _msk_spec(),
            pl.BlockSpec((W, 2 * xp), lambda bd, j: (0, 0)),
            pl.BlockSpec(
                (1, cout, Lp),
                lambda bd, j: (bd // dp, 0, (bd % dp) * (hp // rp) + j)),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, 3 * cin, cout), lambda bd, j: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, 3 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * 3 * cin, (rp + 1) * xp), xf.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([xf] * 6), msk, s_mat, gf)
    # (dx, dy, z·Cin+c, Cout) → (Cout, Cin, dz, dy, dx)
    out = out.reshape(3, 3, 3, cin, cout)
    return jnp.transpose(out, (4, 3, 2, 1, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv3d_k3s2_flat(dims: tuple, xf: jnp.ndarray, w: jnp.ndarray,
                     bias: jnp.ndarray):
    """Flat-I/O 3×3×3 stride-2 conv, VALID in D, SAME in H/W.

    dims = (2D'+1, H, W) static; xf: (B, Cin, (2D'+1)·H·W); w: (Cout, Cin,
    3, 3, 3) OIDHW; bias: (Cout,). Returns (B, Cout, D'·(H/2)·(W/2)) in
    xf.dtype. Rank-3 I/O so slab-chain bodies stay in the kernel layout.
    Differentiable (custom VJP with Pallas dgrad/wgrad kernels)."""
    return _conv_fwd_s2(xf, dims, w, bias, interpret=_is_cpu())


def _vjp_fwd(dims, xf, w, bias):
    return conv3d_k3s2_flat(dims, xf, w, bias), (xf, w, bias)


def _vjp_bwd(dims, res, g):
    xf, w, bias = res
    dext, H, W = dims
    dp, hp, xp = (dext - 1) // 2, H // 2, W // 2
    g = g.astype(xf.dtype)
    dx = _dgrad_s2(g, (dp, hp, xp), w.astype(xf.dtype), interpret=_is_cpu())
    dw = _wgrad_s2(xf, dims, g, w.shape[0], interpret=_is_cpu()).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2)).astype(bias.dtype)
    return dx, dw, db


conv3d_k3s2_flat.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv3d_k3s2_chain(meta: tuple, xf: jnp.ndarray, win: jnp.ndarray,
                      w: jnp.ndarray, bias: jnp.ndarray):
    """Slab-chain form of conv3d_k3s2_flat: in-kernel coordinate masking,
    optional fused activation prologue, and optional in-kernel GroupNorm
    statistics (see conv3d_k3.conv3d_k3s1_chain for the contract — win is
    the valid input-plane window [vlo, vhi) in real plane indices;
    meta = (dext, H, W, want_sums[, act]))."""
    dext, H, W, want_sums = meta[:4]
    act = meta[4] if len(meta) > 4 else None
    window = (win[0], win[1], _NOMASK[0], _NOMASK[1])
    return _conv_fwd_s2(xf, (dext, H, W), w, bias, interpret=_is_cpu(),
                        window=window, want_sums=want_sums, act=act)


def _vjp_fwd_chain(meta, xf, win, w, bias):
    res = conv3d_k3s2_chain(meta, xf, win, w, bias)
    return res, (xf, win, w, bias, res[0] if meta[3] else None)


def _vjp_bwd_chain(meta, res, ct):
    dext, H, W, want_sums = meta[:4]
    act = meta[4] if len(meta) > 4 else None
    dp, hp, xp = (dext - 1) // 2, H // 2, W // 2
    xf, win, w, bias, out = res
    if want_sums:
        g, gs1, gs2 = ct
        g = (g.astype(jnp.float32) + gs1[:, :, None]
             + 2.0 * gs2[:, :, None] * out.astype(jnp.float32))
    else:
        g = ct
    g = g.astype(xf.dtype)
    dx = _dgrad_s2(g, (dp, hp, xp), w.astype(xf.dtype), interpret=_is_cpu(),
                   out_window=win,
                   dact=None if act is None else (act, xf))
    dw = _wgrad_s2(xf, (dext, H, W), g, w.shape[0], interpret=_is_cpu(),
                   window=(win[0], win[1], _NOMASK[0], _NOMASK[1]),
                   act=act).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2)).astype(bias.dtype)
    d_win = np.zeros((2,), dtype=jax.dtypes.float0)
    return dx, d_win, dw, db


conv3d_k3s2_chain.defvjp(_vjp_fwd_chain, _vjp_bwd_chain)


def conv3d_k3s2_valid_d(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray):
    """3×3×3 stride-2 conv, VALID in D (x carries the D-halo layout
    2·D'+1), SAME in H/W.

    x: (B, Cin, 2D'+1, H, W); w: (Cout, Cin, 3, 3, 3) OIDHW; bias: (Cout,).
    Returns (B, Cout, D', H/2, W/2) in x.dtype. Rank-5 convenience wrapper
    over conv3d_k3s2_flat (hot slab chains call the flat form directly).
    Replaces the reference's stride-2 stem convs (hybrid_vit_backbone.py
    token stem) on the TPU hot path."""
    B, cin, dext, H, W = x.shape
    dp = (dext - 1) // 2
    out = conv3d_k3s2_flat((dext, H, W), x.reshape(B, cin, dext * H * W),
                           w, bias)
    return out.reshape(B, w.shape[0], dp, H // 2, W // 2)


def conv3d_k3s2_same(x: jnp.ndarray, w: jnp.ndarray,
                     bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """SAME-padded convenience wrapper: pads one zero plane at the front so
    output plane z' consumes input planes 2z'−1, 2z', 2z'+1 (torch/XLA
    SAME-s2 semantics for even D)."""
    cout = w.shape[0]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    xp_ = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
    return conv3d_k3s2_valid_d(xp_, w, bias)

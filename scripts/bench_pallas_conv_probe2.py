"""Pallas implicit-GEMM conv probe, round 2 — VMEM-resident variants.

Probe 1 (bench_pallas_conv_probe.py) measured ~13 TF/s for every orientation,
but it streamed 27x-inflated im2col patches from HBM (~450 MB/repeat at
~400 GB/s) — it was bandwidth-bound, not orientation-bound. A real
implicit-GEMM conv builds patches from a COMPACT input block in VMEM
(intensity ~500 FLOP/B). This probe measures the actual open question: what
does the MXU sustain on the per-tap dot shapes when data is VMEM-resident?

  V3' per-tap dots    : acc[32,n]  += W_t[32,64]   @ X[64,n]   x27 (M=32,K=64)
  V5  pair-packed K   : acc[32,n]  += W2_t[32,128] @ X2[128,n] x14 (M=32,K=128)
  V6  4-tap-stacked M : OUT4[128,n] = W4_g[128,64] @ X[64,n]   x7 + reduce (M=128)
  V4  all-tap-stacked : OUT[864,n]  = W[864,64]    @ X[64,n]   x1 + reduce (M=864)
  VX  XLA dense conv  : 64->32 k3 NDHWC at 256^3 b1 (ground truth to beat)

All probes reuse one X block for every tap (no shifts) — each tap has its own
weight rows so the dots don't CSE; shift/halo handling is probed only after an
orientation clears the bar. Target: detail-enhancer conv 64->32 k3 at 256^3 is
1.85 TFLOP; XLA today ~120-140 ms in the slab chains. Bar: >= 35 TF/s.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
N_TOTAL = 131072
N_BLK = 2048
CIN = 64
COUT = 32
TAPS = 27


def _sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def _time(fn, *args):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def v3p_kernel(w_ref, x_ref, o_ref):
    acc = jnp.zeros((COUT, N_BLK), jnp.float32)
    for t in range(TAPS):
        acc += lax.dot_general(
            w_ref[pl.ds(COUT * t, COUT), :], x_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v3p(w27, x):
    return pl.pallas_call(
        v3p_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((TAPS * COUT, CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((CIN, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((COUT, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((COUT, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
    )(w27, x)


def v5_kernel(w_ref, x_ref, o_ref):
    acc = jnp.zeros((COUT, N_BLK), jnp.float32)
    for t in range(14):
        acc += lax.dot_general(
            w_ref[pl.ds(COUT * t, COUT), :], x_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v5(w14, x2):
    return pl.pallas_call(
        v5_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((14 * COUT, 2 * CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((2 * CIN, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((COUT, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((COUT, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
    )(w14, x2)


def v6_kernel(w_ref, x_ref, o_ref):
    acc = jnp.zeros((COUT, N_BLK), jnp.float32)
    for g in range(7):
        rows = 4 * COUT if g < 6 else 3 * COUT
        out4 = lax.dot_general(
            w_ref[pl.ds(4 * COUT * g, 4 * COUT), :], x_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for t in range(4 if g < 6 else 3):
            acc += out4[COUT * t:COUT * (t + 1), :]
    o_ref[:] = acc


@jax.jit
def v6(w27p, x):
    return pl.pallas_call(
        v6_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((28 * COUT, CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((CIN, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((COUT, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((COUT, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
    )(w27p, x)


def v4_kernel(w_ref, x_ref, o_ref):
    out = lax.dot_general(
        w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = jnp.zeros((COUT, N_BLK), jnp.float32)
    for t in range(TAPS):
        acc += out[COUT * t:COUT * (t + 1), :]
    o_ref[:] = acc


@jax.jit
def v4(w27, x):
    return pl.pallas_call(
        v4_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((TAPS * COUT, CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((CIN, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((COUT, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((COUT, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
    )(w27, x)


def v8_kernel(w_ref, x_ref, o_ref):
    acc = jnp.zeros((COUT, N_BLK), jnp.float32)
    for t in range(9):
        acc += lax.dot_general(
            w_ref[pl.ds(COUT * t, COUT), :], x_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v8(w9, x3):
    return pl.pallas_call(
        v8_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((9 * COUT, 3 * CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((3 * CIN, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((COUT, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((COUT, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel")),
    )(w9, x3)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (CIN, N_TOTAL), jnp.bfloat16)
    x2 = jax.random.normal(key, (2 * CIN, N_TOTAL), jnp.bfloat16)
    w27 = jax.random.normal(key, (TAPS * COUT, CIN), jnp.bfloat16)
    w27p = jax.random.normal(key, (28 * COUT, CIN), jnp.bfloat16)
    w14 = jax.random.normal(key, (14 * COUT, 2 * CIN), jnp.bfloat16)

    flops = 2.0 * R * COUT * (TAPS * CIN) * N_TOTAL
    flops14 = 2.0 * R * COUT * (14 * 2 * CIN) * N_TOTAL
    cases = [
        ("V3' 27 per-tap dots (32,64)@(64,n)", v3p, (w27, x), flops),
        ("V5  14 pair-packed  (32,128)@(128,n)", v5, (w14, x2), flops14),
        ("V6  7x 4-tap-stack  (128,64)@(64,n)+red", v6, (w27p, x), flops),
        ("V4  all-tap-stack   (864,64)@(64,n)+red", v4, (w27, x), flops),
        ("V8  9x x-packed     (32,192)@(192,n)", v8,
         (jax.random.normal(key, (9 * COUT, 3 * CIN), jnp.bfloat16),
          jax.random.normal(key, (3 * CIN, N_TOTAL), jnp.bfloat16)),
         2.0 * R * COUT * (9 * 3 * CIN) * N_TOTAL),
    ]
    only = sys.argv[1:]
    for name, fn, args, fl in cases:
        if only and not any(name.startswith(p) for p in only):
            continue
        try:
            dt = _time(fn, *args)
            print(f"{name:44s} {dt*1e3:8.1f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)

    if only:
        return
    # VX: XLA dense conv ground truth at the real shape (b1 256^3, NDHWC).
    xx = jax.random.normal(key, (1, 256, 256, 256, CIN), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, 3, CIN, COUT), jnp.bfloat16)

    @jax.jit
    def dense(xx, k):
        return lax.conv_general_dilated(
            xx, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    dt = _time(dense, xx, k)
    fl = 2.0 * COUT * CIN * 27 * 256 ** 3
    print(f"{'VX  XLA dense conv 64->32 k3 256^3 NDHWC':44s} {dt*1e3:8.1f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)

    kk = jax.random.normal(key, (3, 3, 3, COUT, CIN), jnp.bfloat16)
    xs = jax.random.normal(key, (1, 256, 256, 256, COUT), jnp.bfloat16)

    @jax.jit
    def dense2(xs, kk):
        return lax.conv_general_dilated(
            xs, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    dt = _time(dense2, xs, kk)
    print(f"{'VX2 XLA dense conv 32->64 k3 256^3 NDHWC':44s} {dt*1e3:8.1f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

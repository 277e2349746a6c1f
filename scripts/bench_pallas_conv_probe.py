"""Pallas MXU-orientation probe for the stage-3 implicit-GEMM conv.

The detail-enhancer conv1 (64ch -> 32ch, k3, 256^3; reference
model_progressive.py:259-267) is the largest conv in the stage-3 step
(1.86 TFLOP fwd). XLA's dense conv runs it at ~42 TF/s; XLA's *GEMM* at the
im2col shape (M=32, K=1728) only reaches 14 TF/s (scripts/bench_gemm_shapes.py)
while M=256 reaches 50 TF/s -- so the question this probe answers is which
matmul orientation Mosaic/the MXU actually sustains when WE pick the tiles:

  V1 weights-as-LHS : out[32, N]  = W[32, 1728] @ P[1728, N]     (M=C_out)
  V2 spatial-as-M   : out[N, 32]  = P[N, 1728] @ W[1728, 32]     (N=C_out lanes)
  V3 shifted GEMMs  : out[32, N] += W_k[32, 64] @ X_k[64, N] x27 (K=C_in)
  V0 control        : out[256, N] = A[256, 1728] @ P[1728, N]    (square-ish)

All variants use bf16 inputs / f32 accumulation and stream N blocks through
VMEM with an R-repeat grid dimension so total work dwarfs the ~30 ms axon
readback floor. Pure GEMM only -- patch building is probed separately once an
orientation wins.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64          # grid repeats over the same data
N_TOTAL = 131072
N_BLK = 2048
K = 1728        # 64 ch * 27 taps
CIN = 64


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


def v1_kernel(w_ref, p_ref, o_ref):
    o_ref[:] = lax.dot_general(
        w_ref[:], p_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make_v1(m):
    @jax.jit
    def f(w, p):
        return pl.pallas_call(
            v1_kernel,
            grid=(R, N_TOTAL // N_BLK),
            in_specs=[
                pl.BlockSpec((m, K), lambda r, j: (0, 0)),
                pl.BlockSpec((K, N_BLK), lambda r, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, N_BLK), lambda r, j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m, N_TOTAL), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel"),
            ),
        )(w, p)
    return f


def v2_kernel(p_ref, w_ref, o_ref):
    o_ref[:] = lax.dot_general(
        p_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.jit
def v2(p, w):
    return pl.pallas_call(
        v2_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((N_BLK, K), lambda r, j: (j, 0)),
            pl.BlockSpec((K, 32), lambda r, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N_BLK, 32), lambda r, j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((N_TOTAL, 32), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
        ),
    )(p, w)


def v3_kernel(w_ref, p_ref, o_ref):
    acc = jnp.zeros((32, N_BLK), jnp.float32)
    for t in range(27):
        acc += lax.dot_general(
            w_ref[pl.ds(32 * t, 32), :],
            p_ref[pl.ds(CIN * t, CIN), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v3(w27, p):
    return pl.pallas_call(
        v3_kernel,
        grid=(R, N_TOTAL // N_BLK),
        in_specs=[
            pl.BlockSpec((27 * 32, CIN), lambda r, j: (0, 0)),
            pl.BlockSpec((K, N_BLK), lambda r, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((32, N_BLK), lambda r, j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((32, N_TOTAL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
        ),
    )(w27, p)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (K, N_TOTAL), jnp.bfloat16)
    pt = jnp.swapaxes(p, 0, 1)
    w32 = jax.random.normal(key, (32, K), jnp.bfloat16)
    w256 = jax.random.normal(key, (256, K), jnp.bfloat16)
    w27 = jax.random.normal(key, (27 * 32, CIN), jnp.bfloat16)
    wt = jnp.swapaxes(w32, 0, 1)

    flops32 = 2.0 * R * 32 * K * N_TOTAL
    cases = [
        ("V1 weights-as-LHS (32,1728)@(1728,n)", make_v1(32), (w32, p), flops32),
        ("V0 control       (256,1728)@(1728,n)", make_v1(256), (w256, p), flops32 * 8),
        ("V2 spatial-as-M  (n,1728)@(1728,32)", v2, (pt, wt), flops32),
        ("V3 27x shifted   (32,64)@(64,n)", v3, (w27, p), flops32),
    ]
    for name, fn, args, flops in cases:
        try:
            dt = _time(fn, *args)
            print(f"{name:42s} {dt*1e3:8.1f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

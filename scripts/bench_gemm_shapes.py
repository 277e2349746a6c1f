"""MXU efficiency probe for implicit-GEMM conv formulations.

A k3³ conv C_in=64 → C_out=32 at 256³ is an (M=32, K=1728) @ (K, N=spatial)
GEMM after im2col. XLA's conv measures ~16 TF/s at these channel counts; if
the bare GEMM at the same shapes runs much faster, a Pallas implicit-GEMM
conv kernel is worth building — if not, the conv is already at the MXU's
small-M/N floor and the project is dead.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    def _sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    cases = [
        # (M, K, N, batch): sized so the batched RHS stays ~0.5-1 GB bf16
        ("conv1-as-gemm  (32,1728)@(1728,N)", 32, 1728, 8192, 32),
        ("conv1-N-lanes  (32,64)@(64,N)", 32, 64, 8192, 32 * 27),
        ("stem0-as-gemm  (64,864)@(864,N)", 64, 864, 8192, 32),
        ("square-control (256,1728)@(1728,N)", 256, 1728, 8192, 16),
    ]
    R = 16  # LHS variants so total work dwarfs the ~30 ms readback floor
    for name, M, K, N, B in cases:
        a = jax.random.normal(key, (R, M, K), jnp.bfloat16)
        b = jax.random.normal(key, (B, K, N), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.einsum("rmk,bkn->rbmn", a, b,
                                            preferred_element_type=jnp.float32).sum())
        _sync(f(a, b))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(f(a, b))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        flops = 2.0 * R * B * M * K * N
        print(f"{name:40s} {dt*1e3:8.1f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

"""On-chip microbench for the tap-M-packed small-cout conv path: the
detail-chain conv0 DGRAD shape (64→1 @ 256³, 58 GFLOP — measured 52 ms on
the generic M=1 path) and the trunk upsample-conv dgrad shape (32→1)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from hybrid_vit_cascade_tpu.ops.pallas.conv3d_k3 import conv3d_k3s1_valid_d


def _sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def _time(fn, *args):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    REPS = 8  # amortize the ~30 ms axon dispatch/readback floor
    for cin, cout in ((64, 1), (32, 1), (64, 4)):
        D, H, W = 256, 256, 256
        x = jax.random.normal(key, (1, cin, D + 2, H, W), jnp.bfloat16)
        w = jax.random.normal(key, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.1
        b = jnp.zeros((cout,), jnp.float32)
        fl = 2.0 * cout * cin * 27 * D * H * W

        @jax.jit
        def fwd(x, w, b):
            # vary w per rep to defeat CSE; the factor must be
            # bf16-representable — (1 + 1e-6·i) rounds to exactly 1.0 in
            # bf16 and CSE dedupes every rep (round-2 lesson)
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                wi = w * jnp.asarray(1.0 + i * 0.0078125, w.dtype)
                acc += conv3d_k3s1_valid_d(x, wi, b).astype(jnp.float32).sum()
            return acc

        dt = _time(fwd, x, w, b) / REPS
        print(f"conv {cin:3d}->{cout:2d} fwd {dt*1e3:8.1f} ms  "
              f"{fl/dt/1e12:6.1f} TF/s  (x{REPS} amortized)", flush=True)


if __name__ == "__main__":
    main()

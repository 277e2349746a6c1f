"""Micro-benchmark: 3D conv layout choice on TPU at 256³ slab shapes.

Times fwd and fwd+bwd of the detail-enhancer's hot conv (64→32 k3) and the
trunk's strided stem conv (32→64 k3 s2) on a D-slab, NCDHW vs NDHWC, to
decide the internal layout of the slab-streamed chain bodies (ops/slab.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(times)*1e3:8.1f} ms  (compile {compile_s:.0f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    # one slab: D=34 (32+halo) of a 256³ volume
    cases = [
        ("detail_conv1 64->32 k3 s1", (1, 64, 34, 256, 256), (32, 64, 3, 3, 3), 1),
        ("stem_conv0 32->64 k3 s2", (1, 32, 34, 256, 256), (64, 32, 3, 3, 3), 2),
        ("conv0 1->64 k3 s1", (1, 1, 34, 256, 256), (64, 1, 3, 3, 3), 1),
    ]
    for name, xshape, kshape, stride in cases:
        x_nc = jax.random.normal(key, xshape, jnp.bfloat16)
        k_oi = jax.random.normal(key, kshape, jnp.bfloat16) * 0.05
        x_nl = jnp.moveaxis(x_nc, 1, -1)  # NDHWC
        k_nl = jnp.transpose(k_oi, (2, 3, 4, 1, 0))  # DHWIO

        def conv_nc(x, k):
            return lax.conv_general_dilated(
                x, k, (stride,) * 3, [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))

        def conv_nl(x, k):
            return lax.conv_general_dilated(
                x, k, (stride,) * 3, [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        for tag, f, xx, kk in [("NCDHW", conv_nc, x_nc, k_oi), ("NDHWC", conv_nl, x_nl, k_nl)]:
            jf = jax.jit(lambda x, k, f=f: jnp.sum(f(x, k).astype(jnp.float32) ** 2))
            timeit(f"{name} [{tag}] fwd", jf, xx, kk)
            jg = jax.jit(jax.grad(lambda x, k, f=f: jnp.sum(f(x, k).astype(jnp.float32) ** 2),
                                  argnums=(0, 1)))
            timeit(f"{name} [{tag}] fwd+bwd", jg, xx, kk)


if __name__ == "__main__":
    main()

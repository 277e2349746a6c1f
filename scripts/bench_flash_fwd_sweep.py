"""Forward flash-attention block sweep with a raised scoped-VMEM limit.

The round-2 sweep stopped at (1024, 2048) because (2048, ·) tiles exceeded
the compiler's default 16 MB scoped-VMEM budget. The fused backward already
runs at vmem_limit_bytes=100 MB; this probes whether the forward gains from
the same raise (bigger kv blocks = fewer online-softmax correction passes
per score row; bigger q blocks = fewer k/v streams).

Hot shapes: stage-3 self-attention 8 heads x 32,768 tokens x d=32, and the
stage-3 cross-attention 8 x (32,768 q, 4,096 kv) x d=32.

Usage: python scripts/bench_flash_fwd_sweep.py [--iters 5]
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # NB: ops.pallas re-exports a *function* named flash_attention that shadows
    # the submodule attribute; importlib resolves the module itself
    import importlib

    fa = importlib.import_module("hybrid_vit_cascade_tpu.ops.pallas.flash_attention")

    def _sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    key = jax.random.PRNGKey(0)
    shapes = {
        "self 8x32768x32": ((1, 8, 32768, 32), (1, 8, 32768, 32)),
        "cross 8x(32768,4096)x32": ((1, 8, 32768, 32), (1, 8, 4096, 32)),
    }
    combos = [
        (1024, 2048, 0),            # production default (16 MB limit)
        (1024, 4096, 100 << 20),
        (2048, 2048, 100 << 20),
        (2048, 4096, 100 << 20),
        (4096, 2048, 100 << 20),
    ]
    for name, (qs, ks) in shapes.items():
        q = jax.random.normal(key, qs, jnp.bfloat16)
        k = jax.random.normal(key, ks, jnp.bfloat16)
        v = jax.random.normal(key, ks, jnp.bfloat16)
        print(f"== {name}", flush=True)
        for bq, bkv, lim in combos:
            if bkv > ks[2]:
                continue
            fa.FWD_VMEM_LIMIT = lim
            fn = jax.jit(lambda q, k, v, bq=bq, bkv=bkv: fa.flash_attention(
                q, k, v, block_q=bq, block_kv=bkv))
            try:
                _sync(fn(q, k, v))
            except Exception as e:  # noqa: BLE001 — VMEM-infeasible tiles
                print(f"  ({bq:5d},{bkv:5d}) lim={lim >> 20:3d}MB: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                continue
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                _sync(fn(q, k, v))
                times.append(time.perf_counter() - t0)
            print(f"  ({bq:5d},{bkv:5d}) lim={lim >> 20:3d}MB: "
                  f"{min(times) * 1e3:.1f} ms", flush=True)
    fa.FWD_VMEM_LIMIT = 0


if __name__ == "__main__":
    main()

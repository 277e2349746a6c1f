"""Fused flash-attention BACKWARD block sweep under the raised VMEM limit.

The fused backward keeps three (block_q, block_kv) fp32 temporaries
(s/p, dp, ds) live — (1024, 2048) = 24 MB fits the 100 MB scoped budget with
room to spare, so (2048, 2048) / (1024, 4096) (48 MB) and (2048, 4096)
(96 MB) are all admissible on paper. Bigger kv blocks shrink the dq-partials
residency AND the number of dq accumulation sweeps; bigger q blocks cut the
number of k/v streams per kv block.

Hot shapes: stage-3 self-attention 8 heads x 32,768 tokens x d=32 (684 ms of
the 1.44 s wave-8 train step, fwd+bwd), and stage-3 cross-attention
8 x (32,768 q, 4,096 kv) x d=32.

Usage: python scripts/bench_flash_bwd_sweep.py [--iters 5]
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

    import importlib

    import jax
    import jax.numpy as jnp

    fa = importlib.import_module("hybrid_vit_cascade_tpu.ops.pallas.flash_attention")

    def _sync(tree):
        return float(sum(jnp.asarray(t).astype(jnp.float32).mean() for t in jax.tree.leaves(tree)))

    key = jax.random.PRNGKey(0)
    shapes = {
        "self 8x32768x32": ((1, 8, 32768, 32), (1, 8, 32768, 32)),
        "cross 8x(32768,4096)x32": ((1, 8, 32768, 32), (1, 8, 4096, 32)),
    }
    combos = [(1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096)]
    for name, (qs, ks) in shapes.items():
        q = jax.random.normal(key, qs, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), ks, jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), ks, jnp.bfloat16)
        print(f"== {name}", flush=True)
        for bq, bkv in combos:
            if bkv > ks[2]:
                continue
            fa.BWD_FUSED_BLOCK_Q = bq
            fa.BWD_FUSED_BLOCK_KV = bkv

            # grads of a scalar through the kernel: times fwd+bwd together
            # (the bwd cannot run without the fwd residuals anyway); the fwd
            # is block-pinned so only the bwd varies across combos.
            def loss(q, k, v):
                return fa.flash_attention(
                    q, k, v, block_q=2048, block_kv=4096).astype(jnp.float32).mean()

            fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                _sync(fn(q, k, v))
            except Exception as e:  # noqa: BLE001 — VMEM-infeasible tiles
                print(f"  bwd({bq:5d},{bkv:5d}): FAIL {type(e).__name__}: {str(e)[:90]}",
                      flush=True)
                continue
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                _sync(fn(q, k, v))
                times.append(time.perf_counter() - t0)
            print(f"  bwd({bq:5d},{bkv:5d}): fwd+bwd {min(times) * 1e3:.1f} ms", flush=True)
    fa.BWD_FUSED_BLOCK_Q = 1024
    fa.BWD_FUSED_BLOCK_KV = 2048


if __name__ == "__main__":
    main()

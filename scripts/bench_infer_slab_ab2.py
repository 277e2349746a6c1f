"""Follow-up A/B: eval-tuned streaming variants of the 256³ inference fwd.

bench_infer_slab_ab.py measured streamed-slab (8 slabs, train-tuned
store_min_flops) at 423.9 ms vs 455.4 ms dense. At eval there are no saved
residuals, so memory is abundant — this probes (slab_count, store_min_flops)
points that trade memory for zero recompute / zero scan overhead:

  * slabs=8, store-all: every segment endpoint stored (no conv recompute)
  * slabs=1, store-all: whole-volume flat passes — zero relayouts AND zero
    scan/halo overhead; activations materialize in the flat (B, C, D·H·W)
    layout, which (unlike rank-5 NCDHW) has no 4× channel-minor padding
    (64ch 256³ bf16 = 2.1 GB physical).

Usage: python scripts/bench_infer_slab_ab2.py [--iters 5] [--slabs N]
       [--store-all]
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


def time_variant(slabs: int, store_all: bool, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
    from hybrid_vit_cascade_tpu.ops import slab as slab_mod

    if store_all:  # probe-only override of the train-tuned storing threshold
        orig = slab_mod.chain_apply_streamed
        slab_mod.chain_apply_streamed = functools.partial(orig, store_min_flops=0.0)

    try:
        model = ProgressiveCascadeModel(
            dtype=jnp.bfloat16, attn_impl="auto",
            stage3_slab_scan=True, slab_impl="streamed", slab_count=slabs)
        xrays = jnp.zeros((1, 2, 1, 512, 512), jnp.bfloat16)
        variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

        fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))
        t0 = time.perf_counter()
        _sync(fn(variables, xrays))  # compile + warm
        print(f"  [slabs={slabs} store_all={store_all}] compile+first: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            _sync(fn(variables, xrays))
        return (time.perf_counter() - t0) / iters
    finally:
        if store_all:
            slab_mod.chain_apply_streamed = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    for slabs, store_all in [(8, True), (1, True)]:
        dt = time_variant(slabs, store_all, args.iters)
        print(f"slabs={slabs} store_all={store_all}: {dt * 1e3:.1f} ms/step "
              f"({1.0 / dt:.3f} vol/s)", flush=True)


if __name__ == "__main__":
    main()

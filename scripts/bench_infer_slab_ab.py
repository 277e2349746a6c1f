"""A/B: 256³ cascade inference forward with dense vs streamed-slab stage-3
conv chains.

The wave-8 inference device trace (docs/ROUND_NOTES.md) showed ~104 ms of
pure relayout HLOs (copy/data-formatting/pad/reshape, 24% of the step) in
the DENSE eval path — the rank-5 NCDHW volumes relayout at every
XLA↔Pallas-conv boundary. The streamed slab path (`chain_apply_streamed`,
flat bodies) executes its segments with zero relayouts; this measures
whether that wins at eval too (it adds scan/stats overhead the dense path
doesn't pay, so it is not a foregone conclusion).

Usage: python scripts/bench_infer_slab_ab.py [--iters 5]
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


def time_variant(slab: bool, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

    model = ProgressiveCascadeModel(
        dtype=jnp.bfloat16, attn_impl="auto",
        stage3_slab_scan=slab, slab_impl="streamed")
    xrays = jnp.zeros((1, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))
    t0 = time.perf_counter()
    _sync(fn(variables, xrays))  # compile + warm
    print(f"  [slab={slab}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(variables, xrays))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    dense = time_variant(False, args.iters)
    slab = time_variant(True, args.iters)
    print(f"dense: {dense * 1e3:.1f} ms/step  ({1.0 / dense:.3f} vol/s)")
    print(f"slab : {slab * 1e3:.1f} ms/step  ({1.0 / slab:.3f} vol/s)")


if __name__ == "__main__":
    main()

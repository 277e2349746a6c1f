"""Device trace of the 256³ cascade INFERENCE forward (bench.py's exact
headline-metric program) — per-HLO-op ground truth for the eval path.

The train step has been trace-profiled since wave 7 (profile_trace.py);
this is the same capture+analyze harness pointed at the batch-1 bf16
`max_stage=3, train=False` forward that bench_inference times.

Usage: python scripts/profile_infer_trace.py [--iters 2] [--top 30]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_trace import analyze  # same trace parser


def capture(tracedir: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto")
    xrays = jnp.zeros((1, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))
    out = fn(variables, xrays)  # compile + warm
    float(jnp.asarray(out).astype(jnp.float32).mean())  # readback fence

    with jax.profiler.trace(tracedir):
        for _ in range(iters):
            out = fn(variables, xrays)
        float(jnp.asarray(out).astype(jnp.float32).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracedir", default="/tmp/infer_trace")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.tracedir, args.iters)
    analyze(args.tracedir, args.top)


if __name__ == "__main__":
    main()

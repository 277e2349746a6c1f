"""Inference throughput vs batch size for the 256³ cascade (bench headline).

Batch >1 amortizes kernel grid/dispatch overheads; this sweep finds the
throughput-optimal batch that still fits the chip.
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

    print("devices:", jax.devices(), flush=True)
    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto")
    for batch in (1, 2, 4):
        try:
            xrays = jnp.zeros((batch, 2, 1, 512, 512), jnp.bfloat16)
            variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
            variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
            fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))
            out = fn(variables, xrays)
            float(jnp.asarray(out).astype(jnp.float32).mean())  # compile+warm
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = fn(variables, xrays)
                float(jnp.asarray(out).astype(jnp.float32).mean())
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"batch {batch}: {dt*1e3:.1f} ms/batch -> {batch/dt:.3f} vol/s", flush=True)
        except Exception as e:
            print(f"batch {batch}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
            break


if __name__ == "__main__":
    main()

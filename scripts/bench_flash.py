"""Flash-attention kernel timings at the stage-3 hot shape
(8 heads × 32,768 tokens × d=32, batch 1, bf16)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.ops.pallas.flash_attention import flash_attention

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 8, 32768, 32), jnp.bfloat16)
    k = jax.random.normal(key, (1, 8, 32768, 32), jnp.bfloat16)
    v = jax.random.normal(key, (1, 8, 32768, 32), jnp.bfloat16)

    def _sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2),
                         argnums=(0, 1, 2)))
    for name, fn in [("fwd", fwd), ("fwd+bwd", g)]:
        out = fn(q, k, v)
        _sync(out[0] if isinstance(out, tuple) else out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(q, k, v)
            _sync(out[0] if isinstance(out, tuple) else out)
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

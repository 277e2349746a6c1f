"""Flash-attention block sweep at the stage-3 CROSS-attention shape
(q: 8 heads x 32,768 tokens, kv: 1,024 X-ray feature tokens, d=32, bf16).

The device trace attributes 88 ms/step to cross-attention custom-calls
(~43 TF/s padded-equivalent vs the self-attention kernel's ~141) — this
probe sweeps (block_q, block_kv) on the real chip to see whether the
short-KV shape just needs different tiles. Reps are amortized in-jit with
bf16-representable input scaling (1 + i*2^-7) so XLA cannot CSE-dedupe
the instances (see ROUND_NOTES wave 6).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 16


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.ops.pallas.flash_attention import flash_attention

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 8, 32768, 32), jnp.bfloat16)
    k = jax.random.normal(key, (1, 8, 1024, 32), jnp.bfloat16)
    v = jax.random.normal(key, (1, 8, 1024, 32), jnp.bfloat16)

    def _sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    def timed(fn, *args):
        _sync(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn(*args))
            times.append(time.perf_counter() - t0)
        return min(times) * 1e3 / REPS

    for bq, bkv in [(1024, 1024), (2048, 1024), (4096, 1024), (512, 1024),
                    (1024, 512), (2048, 512), (8192, 1024)]:
        if bkv > 1024:
            continue

        def fwd_many(q, k, v, bq=bq, bkv=bkv):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                s = jnp.asarray(1.0 + i * 2.0 ** -7, jnp.bfloat16)
                acc += flash_attention(q * s, k, v, block_q=bq,
                                       block_kv=bkv).astype(jnp.float32).mean()
            return acc

        def bwd_many(q, k, v, bq=bq, bkv=bkv):
            def loss(q, k, v):
                acc = jnp.zeros((), jnp.float32)
                for i in range(REPS):
                    s = jnp.asarray(1.0 + i * 2.0 ** -7, jnp.bfloat16)
                    acc += jnp.sum(
                        flash_attention(q * s, k, v, block_q=bq,
                                        block_kv=bkv).astype(jnp.float32) ** 2)
                return acc
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return g[0].astype(jnp.float32).mean()

        try:
            t_f = timed(jax.jit(fwd_many), q, k, v)
            t_b = timed(jax.jit(bwd_many), q, k, v)
            print(f"bq={bq:5d} bkv={bkv:5d}: fwd {t_f:6.2f} ms  fwd+bwd {t_b:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives infeasible tiles
            print(f"bq={bq:5d} bkv={bkv:5d}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # XLA reference path at the same shape, for comparison
    def xla_many(q, k, v):
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            s = jnp.asarray(1.0 + i * 2.0 ** -7, jnp.bfloat16)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q * s, k,
                                preferred_element_type=jnp.float32) * (32 ** -0.5)
            p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            acc += jnp.einsum("bhqk,bhkd->bhqd", p, v,
                              preferred_element_type=jnp.float32).mean()
        return acc

    def xla_bwd_many(q, k, v):
        def loss(q, k, v):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                s = jnp.asarray(1.0 + i * 2.0 ** -7, jnp.bfloat16)
                scores = jnp.einsum("bhqd,bhkd->bhqk", q * s, k,
                                    preferred_element_type=jnp.float32) * (32 ** -0.5)
                p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                acc += jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v,
                                          preferred_element_type=jnp.float32) ** 2)
            return acc
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return g[0].astype(jnp.float32).mean()

    print(f"xla ref: fwd {timed(jax.jit(xla_many), q, k, v):6.2f} ms  "
          f"fwd+bwd {timed(jax.jit(xla_bwd_many), q, k, v):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

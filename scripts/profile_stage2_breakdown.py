"""On-chip breakdown of the stage-2 128³ b2 train step (~0.171 s round 3).

Components: frozen stage-1 forward, stage-2 upsample-conv stem, stage-2 ViT
(d6, 4096 tokens), and the stage-2 loss stack at 128³.
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
    print(f"{name:40s} {min(times)*1e3:9.1f} ms   (compile {compile_s:.1f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = 2

    from hybrid_vit_cascade_tpu.losses import multiscale as ms
    from hybrid_vit_cascade_tpu.models.cascade import Stage1Base64, Stage2Refiner128

    # stage-2 loss stack at 128³ (grad wrt pred)
    pred = jax.random.normal(key, (B, 1, 128, 128, 128), jnp.bfloat16)
    target = jax.random.normal(key, (B, 1, 128, 128, 128), jnp.float32)
    loss_obj = ms.MultiScaleLoss()
    g = jax.jit(jax.value_and_grad(lambda p: loss_obj(p, target, stage=2)["total_loss"]))
    timeit("loss/stage2_full_128", g, pred)

    # frozen stage-1 forward (fwd only, as in stage-2 training)
    s1 = Stage1Base64(dtype=jnp.bfloat16, attn_impl="auto")
    xr = jax.random.normal(key, (B, 2, 1, 512, 512), jnp.bfloat16)
    v1 = jax.eval_shape(lambda: s1.init(key, xr))
    v1 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v1)
    f1 = jax.jit(lambda v, x: jnp.sum(s1.apply(v, x, train=False).astype(jnp.float32) ** 2))
    timeit("stage1/fwd_b2", f1, v1, xr)

    # stage-2 refiner fwd+bwd (vol64 + encoder feats as inputs)
    s2 = Stage2Refiner128(dtype=jnp.bfloat16, attn_impl="auto")
    vol64 = jax.random.normal(key, (B, 64, 64, 64, 1), jnp.bfloat16)
    feats = jax.random.normal(key, (B, 32, 32, 512), jnp.bfloat16)
    cond = jax.random.normal(key, (B, 1024), jnp.bfloat16)
    v2 = jax.jit(s2.init)(key, vol64, feats, cond)

    def lossf(params, vol64):
        out = s2.apply({"params": params}, vol64, feats, cond, train=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g2 = jax.jit(jax.value_and_grad(lossf))
    timeit("stage2/refiner fwd+bwd", g2, v2["params"], vol64)
    f2 = jax.jit(lambda p, v: jnp.sum(s2.apply({"params": p}, v, feats, cond,
                                               train=False).astype(jnp.float32) ** 2))
    timeit("stage2/refiner fwd", f2, v2["params"], vol64)


if __name__ == "__main__":
    main()

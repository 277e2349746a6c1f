"""Isolate the dropout-RNG cost in the stage-3 ViT train step.

The blocks run 5-6 nn.Dropout sites per layer at 32k tokens (the MLP's
hidden one is 33.5M elements, recomputed under remat_mode='mlp'); threefry
random-bit generation is pure VPU work, so at depth 8 the step may hide
~10⁹ random draws. Measures the d8/32k-token ViT f+b with train=True
(dropout active) vs train=False (dropout compiled away) — the delta is the
RNG + mask cost. Amortized in-jit like profile_stage3_amortized.py.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def timeit(name, fn, *args, reps=2, iters=3):
    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            # bf16-representable factor (1+1e-6 rounds to 1.0 in bf16 → CSE)
            scaled = jax.tree.map(
                lambda t: t * jnp.asarray(1.0 + i * 0.0078125, t.dtype), a[0])
            out = fn(scaled, *a[1:])
            for leaf in jax.tree.leaves(out):
                acc += jnp.sum(leaf.astype(jnp.float32))
        return acc

    t0 = time.perf_counter()
    _sync(run(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(run(*args))
        times.append(time.perf_counter() - t0)
    per = min(times) / reps
    print(f"{name:40s} {per*1e3:9.1f} ms/op  (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    from hybrid_vit_cascade_tpu.models.vit3d import HybridViT3D

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = 1
    vit = HybridViT3D(
        volume_size=(256, 256, 256), in_channels=256, voxel_dim=256, depth=8,
        num_heads=8, context_dim=512, cond_dim=1024, dtype=jnp.bfloat16,
        attn_impl="auto", remat=True, remat_mode="mlp", layout="NCDHW",
        external_stem=True,
    )
    feat = jax.random.normal(key, (B, 256, 32, 32, 32), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, 4096, 512), jnp.bfloat16)
    cond = jax.random.normal(key, (B, 1024), jnp.bfloat16)
    variables = jax.jit(vit.init)(key, feat, ctx, cond)
    params = variables["params"]

    def loss_train(feat, params):
        out = vit.apply({"params": params}, feat, ctx, cond, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_eval(feat, params):
        out = vit.apply({"params": params}, feat, ctx, cond, train=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_train = jax.value_and_grad(loss_train, argnums=(0, 1))
    g_eval = jax.value_and_grad(loss_eval, argnums=(0, 1))
    timeit("vit/d8_32k f+b train=True (dropout)", g_train, feat, params)
    timeit("vit/d8_32k f+b train=False", g_eval, feat, params)
    timeit("vit/d8_32k fwd train=False", loss_eval, feat, params, reps=3)


if __name__ == "__main__":
    main()

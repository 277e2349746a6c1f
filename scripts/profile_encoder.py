"""Isolate the MultiScaleXrayEncoder cost at the real stage shapes.

Wave-6 bisect left a ~170 ms residual attributed to "stage-3 encoder call +
glue" (vg3 - C - vg2). This probe times the encoder forward and
value_and_grad per stage (B=1, 2 views, 512x512), plus the trunk-only
XrayConditioningModule, to see how much of that residual is the encoder and
whether repeated per-stage trunk recompute is being CSE'd by XLA.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def timeit(name, fn, *args, iters=6):
    def reduced(*a):
        out = fn(*a)
        acc = jnp.zeros((), jnp.float32)
        for leaf in jax.tree.leaves(out):
            acc += jnp.sum(leaf.astype(jnp.float32))
        return acc

    jfn = jax.jit(reduced)
    t0 = time.perf_counter()
    _sync(jfn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(jfn(*args))
        times.append(time.perf_counter() - t0)
    per = min(times)
    print(f"{name:52s} {per*1e3:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    from hybrid_vit_cascade_tpu.models.encoders import MultiScaleXrayEncoder

    print("devices:", jax.devices(), flush=True)
    B = 1
    xr = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 1, 512, 512), jnp.float32)

    enc = MultiScaleXrayEncoder(base_dim=512, num_views=2, dtype=jnp.bfloat16)
    import flax.linen as nn

    def init_all(rng, x):
        # init must touch every per-stage branch to create all params
        def run(mdl, x):
            for s in (1, 2, 3):
                mdl(x, stage=s)
        return nn.init(run, enc)(rng, x)

    variables = jax.jit(lambda x: init_all(jax.random.PRNGKey(1), x))(xr)
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def fwd(params, xr, stage):
        out, _ = enc.apply({"params": params, "batch_stats": bs}, xr, stage=stage,
                           train=True, mutable=["batch_stats"])
        feats, cond, ctx = out
        return feats, cond, ctx

    for stage in (1, 2, 3):
        timeit(f"encoder fwd stage={stage}", lambda p, x, s=stage: jax.tree.map(
            lambda y: jnp.sum(y.astype(jnp.float32)), fwd(p, x, s)), params, xr)

    def loss_one(params, xr, stage):
        feats, cond, ctx = fwd(params, xr, stage)
        return (jnp.sum(feats.astype(jnp.float32) ** 2)
                + jnp.sum(cond.astype(jnp.float32) ** 2))

    for stage in (2, 3):
        timeit(f"encoder f+b stage={stage}",
               jax.grad(lambda p, x, s=stage: loss_one(p, x, s)), params, xr)

    # the cascade's max_stage=3 pattern: three calls on the same input
    def loss_all(params, xr):
        acc = jnp.zeros((), jnp.float32)
        for s in (1, 2, 3):
            feats, cond, ctx = fwd(params, xr, s)
            acc += jnp.sum(feats.astype(jnp.float32) ** 2)
        return acc

    timeit("encoder f+b stages 1+2+3 (cascade pattern)", jax.grad(loss_all), params, xr)


if __name__ == "__main__":
    main()

"""Bisect the REAL stage-3 train step: where do ~1.7 s actually go?

The amortized component profile (profile_stage3_amortized.py) accounts for
only ~750 ms of the measured 1.70 s step (trunk 81 + detail 167 + ViT 467 +
losses ~30 + resize 5). This script times amortized in-jit variants of the
REAL ProgressiveCascadeModel composition to locate the remaining ~950 ms:

  vg3      value_and_grad of apply(max_stage=3) + full stage-3 MultiScaleLoss
  vg3_l1   same but L1-only loss
  vg2      value_and_grad of apply(max_stage=2) + stage-2 loss (batch 1)
  fwd3     forward only, max_stage=3
  step     the full train step incl. optimizer (donation off for reps)

Usage: python scripts/profile_step_bisect.py --only vg3,vg2
"""

import argparse
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
    print(f"{name:28s} {per*1e3:9.1f} ms/op  (x{reps}, compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="vg3,vg3_l1,vg2,fwd3")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    groups = set(args.only.split(","))

    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.losses.multiscale import l1_loss
    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
    from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear

    print("devices:", jax.devices(), flush=True)
    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto",
                                    stage3_slab_scan=True, remat_mode="mlp")
    B = 1
    xrays = jnp.zeros((B, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
    variables = jax.tree.map(lambda s: (jnp.zeros(s.shape, s.dtype)
                                        if s.size > 1 else jnp.ones(s.shape, s.dtype)), variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    loss_obj = MultiScaleLoss()
    target256 = jnp.zeros((B, 1, 256, 256, 256), jnp.float32)
    xr_in = jnp.zeros((B, 2, 1, 512, 512), jnp.float32)
    rng = jax.random.PRNGKey(1)

    def apply_stage(params, max_stage, train=True):
        vs = {"params": params, "batch_stats": batch_stats}
        out = model.apply(vs, xrays, max_stage=max_stage,
                          train=train, stop_grad_stage1=max_stage >= 2,
                          mutable=["batch_stats"] if train else False,
                          rngs={"dropout": rng} if train else None)
        return out[0] if train else out

    if "vg3" in groups:
        def loss3(params):
            pred = apply_stage(params, 3)
            return loss_obj(pred, target256, stage=3,
                            input_xrays=xr_in)["total_loss"].astype(jnp.float32)

        timeit("vg3 (full loss)", jax.grad(loss3), params,
               reps=args.reps, iters=args.iters)

    if "vg3_l1" in groups:
        def loss3l1(params):
            pred = apply_stage(params, 3)
            return l1_loss(pred, target256).astype(jnp.float32)

        timeit("vg3_l1", jax.grad(loss3l1), params,
               reps=args.reps, iters=args.iters)

    if "vg2" in groups:
        target128 = resize_trilinear(target256, (128, 128, 128), align_corners=False)

        def loss2(params):
            pred = apply_stage(params, 2)
            return loss_obj(pred, target128, stage=2)["total_loss"].astype(jnp.float32)

        timeit("vg2 (stage-2 loss)", jax.grad(loss2), params,
               reps=args.reps, iters=args.iters)

    if "fwd3" in groups:
        def fwd3(params):
            return jnp.sum(apply_stage(params, 3, train=False).astype(jnp.float32))

        timeit("fwd3 (eval fwd)", fwd3, params, reps=args.reps, iters=args.iters)


if __name__ == "__main__":
    main()

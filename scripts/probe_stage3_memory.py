"""On-chip probe: does the 256³ stage-3 cascade TRAIN step fit one v5e chip
with the slab-streamed conv branches? Prints compile status + step time.

Usage:  python scripts/probe_stage3_memory.py [--slabs 8] [--dense] [--stage 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slabs", type=int, default=8)
    ap.add_argument("--dense", action="store_true", help="disable slab streaming")
    ap.add_argument("--stage", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat-mode", type=str, default="block", choices=["block", "mlp"])
    ap.add_argument("--slab-impl", type=str, default="streamed", choices=["streamed", "recompute"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
    from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear
    from hybrid_vit_cascade_tpu.training import make_optimizer, make_train_step
    from hybrid_vit_cascade_tpu.training.trainer import TrainState

    print("devices:", jax.devices())
    res = {1: 64, 2: 128, 3: 256}[args.stage]
    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto",
                                    stage3_slab_scan=not args.dense, slab_count=args.slabs,
                                    slab_impl=args.slab_impl, remat_mode=args.remat_mode)
    B = args.batch
    xrays = jnp.zeros((B, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=args.stage))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.1f}M  slab_scan={not args.dense} slabs={args.slabs}")

    loss_obj = MultiScaleLoss()

    def loss_fn(pred, b):
        target = resize_trilinear(b["ct_volume"], (res,) * 3, align_corners=False)
        xr = b["drr_stacked"] if args.stage == 3 else None
        return loss_obj(pred, target, stage=args.stage, input_xrays=xr)

    trainable = [f"stage{args.stage}"] + (["xray_encoder"] if args.stage >= 2 else [])
    tx = make_optimizer(1e-4, 1000, trainable_prefixes=trainable, params=variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    batch = {
        "drr_stacked": jnp.zeros((B, 2, 1, 512, 512), jnp.float32),
        "ct_volume": jnp.zeros((B, 1, 256, 256, 256), jnp.float32),
    }
    step = make_train_step(model, loss_fn, {"max_stage": args.stage})
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    loss = float(m["total_loss"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s, loss={loss:.4f}")
    # absorb the donated-step recompile quirk
    state, m = step(state, batch, rng)
    float(m["total_loss"])
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, m = step(state, batch, rng)
        float(m["total_loss"])  # readback fence
        times.append(time.perf_counter() - t0)
    print(f"steady-state step: {min(times):.3f}s  ({1/min(times):.3f} steps/s)")
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"HBM: in_use={in_use:.2f} GiB  peak={peak:.2f} GiB  limit={limit:.2f} GiB")
    except Exception as e:  # memory_stats is optional on experimental platforms
        print(f"HBM stats unavailable: {e}")


if __name__ == "__main__":
    main()

"""Find the ~870 ms of stage-3 composition overhead.

profile_step_bisect.py: vg3 (full model+loss grad) = 1722 ms, vg2 = 105 ms,
so stage-3 marginal f+b = ~1.6 s — but the isolated components sum to only
~750 ms (trunk 81 + detail 167 + ViT 467 + resize 5 + loss ~30). This probe
rebuilds the stage-3 composition from the same library pieces and adds the
glue incrementally:

  A   resize(vol128→256) → trunk chain → ViT           (expect ~550 ms)
  B   A + detail chain on the (second) resized base + NDHWC blend
  C   B + full stage-3 MultiScaleLoss on _nchw3d(blend)

Whichever step jumps is the hole. All variants are value_and_grad over the
chain arrays + ViT params, single rep (256³ doesn't fit 2 live copies).
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


def timeit(name, fn, *args, iters=4):
    @jax.jit
    def run(*a):
        out = fn(*a)
        acc = jnp.zeros((), jnp.float32)
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
    per = min(times)
    print(f"{name:44s} {per*1e3:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="A,B,C")
    args = ap.parse_args()
    groups = set(args.only.split(","))

    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.models.vit3d import HybridViT3D
    from hybrid_vit_cascade_tpu.ops import slab
    from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = 1

    # trunk chain: upsample_conv(1→32) + 3 stride-2 stem convs to 256ch@32³
    def mk_chain(spec, k2):
        chain = []
        for item in spec:
            if item[0] == "conv":
                _, o, i, kk, s = item
                k2, sub = jax.random.split(k2)
                w = jax.random.normal(sub, (o, i, kk, kk, kk), jnp.float32) * 0.05
                chain.append(("conv", w, jnp.zeros((o,), jnp.float32), s))
            elif item[0] == "gn":
                _, g, c = item
                chain.append(("gn", g, jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)))
            else:
                chain.append(item)
        return chain

    trunk_spec = [
        ("conv", 32, 1, 3, 1), ("gn", 8, 32), ("act", "gelu"),
        ("conv", 64, 32, 3, 2), ("gn", 8, 64), ("act", "silu"),
        ("conv", 128, 64, 3, 2), ("gn", 8, 128), ("act", "silu"),
        ("conv", 256, 128, 3, 2), ("gn", 8, 256), ("act", "silu"),
    ]
    detail_spec = [
        ("conv", 64, 1, 3, 1), ("gn", 16, 64), ("act", "gelu"),
        ("conv", 32, 64, 3, 1), ("gn", 8, 32), ("act", "gelu"),
        ("conv", 1, 32, 1, 1),
    ]
    trunk = mk_chain(trunk_spec, jax.random.PRNGKey(1))
    detail = mk_chain(detail_spec, jax.random.PRNGKey(2))
    trunk_arrs = slab.chain_arrays(trunk)
    detail_arrs = slab.chain_arrays(detail)

    vit = HybridViT3D(
        volume_size=(256, 256, 256), in_channels=256, voxel_dim=256, depth=8,
        num_heads=8, context_dim=512, cond_dim=1024, dtype=jnp.bfloat16,
        attn_impl="auto", remat=True, remat_mode="mlp", layout="NCDHW",
        external_stem=True,
    )
    ctx = jax.random.normal(key, (B, 4096, 512), jnp.bfloat16)
    cond = jax.random.normal(key, (B, 1024), jnp.bfloat16)
    feat0 = jnp.zeros((B, 256, 32, 32, 32), jnp.bfloat16)
    vparams = jax.jit(vit.init)(key, feat0, ctx, cond)["params"]

    vol128 = jax.random.normal(key, (B, 1, 128, 128, 128), jnp.bfloat16)
    target256 = jax.random.normal(key, (B, 1, 256, 256, 256), jnp.float32)
    xr = jax.random.normal(key, (B, 2, 1, 512, 512), jnp.float32)
    loss_obj = MultiScaleLoss()

    def run_trunk_vit(vol128, t_arrs, vp):
        x1 = resize_trilinear(vol128, (256, 256, 256), align_corners=False).astype(jnp.bfloat16)
        c = slab.chain_rebuild(trunk, t_arrs)
        feat = slab.chain_apply_streamed(x1, c, 8, dtype=jnp.bfloat16)
        out = vit.apply({"params": vp}, feat, ctx, cond, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return out  # (B, 256, 256, 256, 1) NDHWC

    if "A" in groups:
        def lossA(args):
            t_arrs, vp = args
            out = run_trunk_vit(vol128, t_arrs, vp)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        timeit("A: resize+trunk+vit f+b", jax.grad(lossA), (trunk_arrs, vparams))

    def run_blend(args):
        t_arrs, d_arrs, vp = args
        refinement = run_trunk_vit(vol128, t_arrs, vp)
        base_nc = resize_trilinear(vol128, (256, 256, 256), align_corners=False)
        dc = slab.chain_rebuild(detail, d_arrs)
        details = slab.chain_apply_streamed(base_nc.astype(jnp.bfloat16), dc, 8, dtype=jnp.bfloat16)
        base = jnp.moveaxis(base_nc, 1, -1)
        out = base + 0.5 * refinement + 0.3 * jnp.moveaxis(details, 1, -1)
        return jnp.moveaxis(out, -1, 1)  # (B, 1, 256³) NCDHW

    if "B" in groups:
        def lossB(args):
            return jnp.sum(run_blend(args).astype(jnp.float32) ** 2)

        timeit("B: A + detail + blend f+b", jax.grad(lossB),
               (trunk_arrs, detail_arrs, vparams))

    if "C" in groups:
        def lossC(args):
            pred = run_blend(args)
            return loss_obj(pred, target256, stage=3,
                            input_xrays=xr)["total_loss"].astype(jnp.float32)

        timeit("C: B + stage-3 MultiScaleLoss f+b", jax.grad(lossC),
               (trunk_arrs, detail_arrs, vparams))


if __name__ == "__main__":
    main()

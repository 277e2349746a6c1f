"""On-chip breakdown of the stage-3 256³ train-step cost (5.49 s round 2).

Times each component's fwd+bwd separately (jit value_and_grad, readback-fenced)
so the optimization effort goes where the time is:
  * each MultiScaleLoss stage-3 term at 256³ (l1 / ssim / tv / freq / vgg / drr)
  * the two slab-streamed conv chains (stage-3 trunk stem, detail enhancer)
  * the stage-3 ViT trunk (32,768 tokens, depth 8, remat) on its own
  * trilinear 128³→256³ resize

Usage: python scripts/profile_stage3_breakdown.py [--iters 3] [--only loss,chain,vit]
"""

import argparse
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
    print(f"{name:34s} {min(times)*1e3:9.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", type=str, default="loss,chain,vit,misc")
    args = ap.parse_args()
    groups = set(args.only.split(","))

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = 1

    if "loss" in groups:
        from hybrid_vit_cascade_tpu.losses import multiscale as ms

        pred = jax.random.normal(key, (B, 1, 256, 256, 256), jnp.bfloat16)
        target = jax.random.normal(key, (B, 1, 256, 256, 256), jnp.float32)
        xrays = jax.random.normal(key, (B, 2, 1, 512, 512), jnp.float32)
        perc = ms.TriPlanarPerceptualLoss()

        terms = {
            "loss/l1": lambda p: ms.l1_loss(p, target),
            "loss/ssim": lambda p: ms.ssim_loss(p, target),
            "loss/tv": lambda p: ms.total_variation_loss(p, target),
            "loss/freq(fft)": lambda p: ms.frequency_loss(p, target),
            "loss/vgg_slices": lambda p: perc(p, target),
            "loss/drr_reproj": lambda p: ms.drr_reprojection_loss(p, xrays),
        }
        for name, f in terms.items():
            g = jax.jit(jax.value_and_grad(lambda p, f=f: f(p).astype(jnp.float32)))
            timeit(name, g, pred, iters=args.iters)

    if "chain" in groups:
        from hybrid_vit_cascade_tpu.ops import slab

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
        x = jax.random.normal(key, (B, 1, 256, 256, 256), jnp.bfloat16)
        impls = {
            "recompute": lambda x, c: slab.chain_apply_slab(x, c, 8, dtype=jnp.bfloat16),
            "streamed": lambda x, c: slab.chain_apply_streamed(x, c, 8, dtype=jnp.bfloat16),
            "streamed_all": lambda x, c: slab.chain_apply_streamed(
                x, c, 8, dtype=jnp.bfloat16, store_min_flops=0.0),
        }
        wanted = [s for s in ("streamed", "streamed_all", "recompute") if s in groups] or ["streamed"]
        for name, spec in [("chain/trunk_stem", trunk_spec), ("chain/detail", detail_spec)]:
            chain = mk_chain(spec, key)
            arrs = slab.chain_arrays(chain)
            for impl in wanted:
                fn = impls[impl]

                def lossf(x, arrs, fn=fn, chain=chain):
                    c = slab.chain_rebuild(chain, arrs)
                    return jnp.sum(fn(x, c).astype(jnp.float32) ** 2)

                g = jax.jit(jax.value_and_grad(lossf, argnums=(0, 1)))
                timeit(f"{name}[{impl}] fwd+bwd", g, x, arrs, iters=args.iters)
                f = jax.jit(lambda x, arrs, fn=fn, chain=chain: jnp.sum(
                    fn(x, slab.chain_rebuild(chain, arrs)).astype(jnp.float32) ** 2))
                timeit(f"{name}[{impl}] fwd", f, x, arrs, iters=args.iters)

    if "vit" in groups:
        from hybrid_vit_cascade_tpu.models.vit3d import HybridViT3D

        vit = HybridViT3D(
            volume_size=(256, 256, 256), in_channels=256, voxel_dim=256, depth=8,
            num_heads=8, context_dim=512, cond_dim=1024, dtype=jnp.bfloat16,
            attn_impl="auto", remat=True, layout="NCDHW", external_stem=True,
        )
        feat = jax.random.normal(key, (B, 256, 32, 32, 32), jnp.bfloat16)
        ctx = jax.random.normal(key, (B, 4096, 512), jnp.bfloat16)
        cond = jax.random.normal(key, (B, 1024), jnp.bfloat16)
        variables = jax.jit(vit.init)(key, feat, ctx, cond)

        def lossf(params, feat):
            out = vit.apply({"params": params}, feat, ctx, cond, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.value_and_grad(lossf))
        timeit("vit/stage3_d8_32k fwd+bwd", g, variables["params"], feat, iters=args.iters)
        f = jax.jit(lambda p, x: jnp.sum(vit.apply({"params": p}, x, ctx, cond,
                                                   train=False).astype(jnp.float32) ** 2))
        timeit("vit/stage3_d8_32k fwd", f, variables["params"], feat, iters=args.iters)

    if "misc" in groups:
        from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear

        v128 = jax.random.normal(key, (B, 1, 128, 128, 128), jnp.bfloat16)
        g = jax.jit(jax.value_and_grad(
            lambda v: jnp.sum(resize_trilinear(v, (256, 256, 256),
                                               align_corners=False).astype(jnp.float32) ** 2)))
        timeit("misc/resize128->256 fwd+bwd", g, v128, iters=args.iters)


if __name__ == "__main__":
    main()

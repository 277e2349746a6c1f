"""Stage-3 256³ component costs, amortized against the axon dispatch floor.

The per-dispatch breakdown (profile_stage3_breakdown.py) times each component
as a separate jit dispatch with a device→host readback — a single dispatch on
axon carries a ~28-34 ms floor (calibrated via an empty jit), so sub-100 ms
components read too slow. This profiler loops each component REPS times
INSIDE one jit and divides.

CSE WARNING (round-2 lesson): the original rep-variation `x·(1 + i·1e-6)`
ROUNDS TO EXACTLY x IN BF16 (7 mantissa bits), so XLA CSE-deduped all reps
into one computation and every amortized number read reps× too fast. Reps
are now varied by (1 + i·2⁻⁷), which is bf16-representable. Even with real
variation, reps of INDEPENDENT work interleave in the schedule (~1.2-1.4×
measured on a big-matmul control), so amortized numbers still read somewhat
optimistic vs serial cost — for serial truth use single-dispatch timings
minus the calibrated floor, or composed reps=1 measurements
(profile_step_bisect.py / profile_stage3_glue.py).

Usage: python scripts/profile_stage3_amortized.py [--only loss,chain,vit,misc]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


def timeit_amortized(name, fn, *args, reps, iters=3):
    """fn(*args) -> pytree; times a REPS-unrolled in-jit loop of fn."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            # 1 + i·2⁻⁷ is exactly representable in bf16 — (1 + i·1e-6)
            # rounds to 1.0 there and lets CSE dedupe every rep (see module
            # docstring)
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
    print(f"{name:34s} {per*1e3:9.1f} ms/op  (x{reps}, compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="loss,chain,vit,misc")
    ap.add_argument("--iters", type=int, default=3)
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
            g = jax.value_and_grad(lambda p, f=f: f(p).astype(jnp.float32))
            timeit_amortized(name + " f+b", g, pred, reps=6, iters=args.iters)

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
        for name, spec in [("chain/trunk_stem", trunk_spec), ("chain/detail", detail_spec)]:
            chain = mk_chain(spec, key)
            arrs = slab.chain_arrays(chain)

            def lossf(x, arrs, chain=chain):
                c = slab.chain_rebuild(chain, arrs)
                return jnp.sum(slab.chain_apply_streamed(
                    x, c, 8, dtype=jnp.bfloat16).astype(jnp.float32) ** 2)

            timeit_amortized(f"{name}[streamed] f+b",
                             jax.value_and_grad(lossf, argnums=(0, 1)),
                             x, arrs, reps=3, iters=args.iters)
            timeit_amortized(f"{name}[streamed] fwd",
                             lossf, x, arrs, reps=3, iters=args.iters)

    if "vit" in groups:
        from hybrid_vit_cascade_tpu.models.vit3d import HybridViT3D

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

        def lossf(feat, params):
            out = vit.apply({"params": params}, feat, ctx, cond, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        timeit_amortized("vit/stage3_d8_32k f+b",
                         jax.value_and_grad(lossf, argnums=(0, 1)),
                         feat, variables["params"], reps=2, iters=args.iters)
        timeit_amortized("vit/stage3_d8_32k fwd",
                         lossf, feat, variables["params"], reps=2,
                         iters=args.iters)

    if "misc" in groups:
        from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear

        v128 = jax.random.normal(key, (B, 1, 128, 128, 128), jnp.bfloat16)
        timeit_amortized(
            "misc/resize128->256 f+b",
            jax.value_and_grad(lambda v: jnp.sum(resize_trilinear(
                v, (256, 256, 256), align_corners=False).astype(jnp.float32) ** 2)),
            v128, reps=6, iters=args.iters)


if __name__ == "__main__":
    main()

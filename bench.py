"""Benchmark: 256³ progressive-cascade inference throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference never measured inference throughput; its only
recorded hardware throughput is 256³ *training* on a B200 at ~15-20 min per
~80-patient epoch (VETTING_256_SCRATCH.md:185-205) ≈ 0.076 samples/s. We use
that as the denominator until a better baseline exists — i.e. vs_baseline is
"our 256³ cascade inference volumes/s/chip over the reference's recorded
256³ samples/s on its best GPU".
"""

import json
import time

REFERENCE_SAMPLES_PER_SEC = 80.0 / (17.5 * 60.0)  # ≈ 0.076 (B200, training)


def main():
    import jax
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto")
    xrays = jnp.zeros((1, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
    # random-ish params without a giant host init: zeros are fine for timing
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))

    def run_synced():
        out = fn(variables, xrays)
        # NOTE: on the experimental axon platform block_until_ready returns
        # early; only a real device→host readback reliably fences the stream.
        return float(out.astype(jnp.float32).mean())

    run_synced()  # compile + warm-up
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run_synced()
    dt = (time.perf_counter() - t0) / n_iters
    vols_per_sec = xrays.shape[0] / dt

    print(json.dumps({
        "metric": "cascade256_inference_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 4),
        "unit": "vol/s/chip",
        "vs_baseline": round(vols_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

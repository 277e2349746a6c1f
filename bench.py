"""Benchmark: 256³ progressive-cascade inference throughput per chip, plus
training steps/sec for the stage-2 (128³) and stage-3 (256³) cascade stages.

Prints a JSON line {"metric", "value", "unit", "vs_baseline", "extra"} after
EVERY completed phase — the driver records the stdout tail and the LAST line
wins, so a partial run (or an external `timeout` killing this process
mid-phase) still leaves a complete, parseable result with whatever phases
finished. The final line carries everything.

vs_baseline: the reference never measured inference throughput; its only
recorded hardware throughput is 256³ *training* on a B200 at ~15-20 min per
~80-patient epoch (VETTING_256_SCRATCH.md:185-205) ≈ 0.076 samples/s. We use
that as the denominator until a better baseline exists — i.e. vs_baseline is
"our 256³ cascade inference volumes/s/chip over the reference's recorded
256³ samples/s on its best GPU". `extra` carries the training-throughput
north-star metrics (BASELINE.md) on the same chip: steps/sec for a batch-2
128³ stage-2 step and a batch-1 256³ stage-3 step (full MultiScaleLoss,
donated buffers, slab-streamed stage-3 conv branches), each with its own
same-task vs-reference ratio.

Resilience history:
  * round 3: every phase runs in its OWN subprocess with a hard timeout
    (a wedged backend can't hang the orchestrator, which never imports
    jax); retries with backoff on transient TPU-tunnel faults; the XLA
    compile cache is keyed per backend+machine under /root/jaxcache.
  * round 5 (the round-4 driver capture was rc=124 with an EMPTY tail —
    the driver killed the orchestrator before its single end-of-run print):
    (a) a result line is now streamed after every phase (and one
    immediately at startup), flushed; (b) a GLOBAL wall-clock budget
    (HVC_BENCH_BUDGET_S, default 2000 s ≈ 33 min) bounds the worst case
    from a COLD compile cache — each phase's subprocess timeout is clamped
    to the remaining budget, a phase that would start with <120 s left is
    skipped with a recorded error instead of retried, and train phases get
    exactly one attempt. Worst case total stays under ~35 min; the driver
    budget (>2400 s) can no longer expire before the first line.
Cold-cache phase costs measured on axon (docs/ROUND_NOTES.md): backend
init ~2 min worst, 256³ inference compile ~4-6 min, stage-2 train compile
~2 min, stage-3 256³ split-free train compile ~9-12 min (dominates — hence
last, with whatever budget remains).
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_SAMPLES_PER_SEC = 80.0 / (17.5 * 60.0)  # ≈ 0.076 (B200, training)

TOTAL_BUDGET_S = float(os.environ.get("HVC_BENCH_BUDGET_S", "2000"))
MIN_PHASE_S = 120  # don't start a phase with less than this left
# Nominal per-phase wall-clock limits (seconds), clamped to remaining budget.
PHASE_TIMEOUT = {"probe": 300, "inference": 900, "train2": 600, "train3": 1500}
PHASE_ATTEMPTS = {"probe": 2, "inference": 2, "train2": 1, "train3": 1}
RETRY_BACKOFF_S = 15

_T0 = time.monotonic()


def _remaining() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _T0)


def _machine_tag() -> str:
    """Short host fingerprint: XLA:CPU AOT entries bake the compile host's
    CPU features, and loading them on a different host warns of SIGILL
    (seen in round-2 MULTICHIP logs). Key the cache per machine so entries
    never cross hosts."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def _setup_backend_keyed_cache():
    """Initialize jax and point the persistent compile cache at a
    per-backend, per-machine directory. Called inside worker subprocesses
    only (the orchestrator never imports jax)."""
    import jax

    backend = jax.default_backend()  # forces backend init
    cache_dir = os.path.join("/root/jaxcache", f"{backend}-{_machine_tag()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return jax


def _sync(x):
    """Device→host readback fence. NOTE: on the experimental axon platform
    block_until_ready can return early; only a real readback reliably fences."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


# ---------------------------------------------------------------------------
# Worker phases (each runs in its own subprocess; prints ONE json line)
# ---------------------------------------------------------------------------

def phase_probe() -> dict:
    """Pre-flight: backend init + trivial matmul + readback."""
    t0 = time.perf_counter()
    jax = _setup_backend_keyed_cache()
    import jax.numpy as jnp

    t1 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.bfloat16)
    val = _sync((x @ x).astype(jnp.float32))
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "init_s": round(t1 - t0, 1),
        "matmul_s": round(time.perf_counter() - t1, 1),
        "ok": abs(val - 256.0) < 1.0,
    }


def phase_inference(n_iters: int = 5, batch: int = 3) -> dict:
    """Serving throughput at the throughput-optimal batch (flat-schedule
    sweep on v5e, wave 11: b2 675 ms → 2.96 vol/s, b3 999 ms → 3.00 vol/s,
    b4 fails to compile on the 15.75 GB chip — batch 3 banks the last +1.5%
    of dispatch/grid amortization; round-4 VERDICT item 8)."""
    jax = _setup_backend_keyed_cache()
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto")
    xrays = jnp.zeros((batch, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=3))
    # random-ish params without a giant host init: zeros are fine for timing
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fn = jax.jit(lambda v, x: model.apply(v, x, max_stage=3, train=False))
    _sync(fn(variables, xrays))  # compile + warm-up
    t0 = time.perf_counter()
    for _ in range(n_iters):
        _sync(fn(variables, xrays))
    dt = (time.perf_counter() - t0) / n_iters
    return {"volumes_per_sec": xrays.shape[0] / dt, "batch": batch}


def phase_train(stage: int, batch: int, n_iters: int = 3) -> dict:
    """Steps/sec for one cascade training stage (full loss, frozen-mask
    optimizer, donated buffers — the real train step, not a fwd/bwd toy)."""
    jax = _setup_backend_keyed_cache()
    import jax.numpy as jnp

    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
    from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear
    from hybrid_vit_cascade_tpu.training import make_optimizer, make_train_step
    from hybrid_vit_cascade_tpu.training.trainer import TrainState

    res = {2: 128, 3: 256}[stage]
    # remat_mode='mlp': attention kernels run once in the backward (not
    # recomputed) — measured 2.73 s/step vs 3.00 ('block') at 256³ batch 1,
    # and it fits the 15.75 GB chip with the streamed slab chains
    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto",
                                    stage3_slab_scan=(stage == 3), remat_mode="mlp")
    xrays = jnp.zeros((batch, 2, 1, 512, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xrays, max_stage=stage))
    variables = jax.tree.map(lambda s: (jnp.zeros(s.shape, s.dtype)
                                        if s.size > 1 else jnp.ones(s.shape, s.dtype)), variables)

    loss_obj = MultiScaleLoss()

    def loss_fn(pred, b):
        target = resize_trilinear(b["ct_volume"], (res, res, res), align_corners=False)
        xr = b["drr_stacked"] if stage == 3 else None
        return loss_obj(pred, target, stage=stage, input_xrays=xr)

    trainable = [f"stage{stage}", "xray_encoder"]
    tx = make_optimizer(1e-4, 1000, trainable_prefixes=trainable, params=variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    batch_data = {
        "drr_stacked": jnp.zeros((batch, 2, 1, 512, 512), jnp.float32),
        "ct_volume": jnp.zeros((batch, 1, 256, 256, 256), jnp.float32),
    }
    # stop_grad_stage1: matches Trainer.fit_cascade's refine-stage steps —
    # stage 1 is frozen during stages 2/3, so its backward is pruned (the
    # reference's requires_grad=False freeze semantics)
    step = make_train_step(model, loss_fn,
                           {"max_stage": stage, "stop_grad_stage1": True})
    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch_data, rng)  # compile + warm-up
    _sync(m["total_loss"])
    # NOTE: the second call of a donated step recompiles once on axon; absorb it
    state, m = step(state, batch_data, rng)
    _sync(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch_data, rng)
        _sync(m["total_loss"])
    dt = (time.perf_counter() - t0) / n_iters
    return {"steps_per_sec": 1.0 / dt}


# ---------------------------------------------------------------------------
# Orchestrator (no jax import — a wedged backend can never hang this process)
# ---------------------------------------------------------------------------

def _run_phase(phase: str) -> dict:
    """Run one phase in a subprocess, timeout clamped to the remaining global
    budget. Returns the phase's JSON dict, or {"error": ...} when the phase
    failed, timed out, or the budget has no room left for it."""
    attempts = PHASE_ATTEMPTS.get(phase, 1)
    last_err = "unknown"
    for attempt in range(attempts):
        if attempt:
            time.sleep(RETRY_BACKOFF_S)
        timeout = min(PHASE_TIMEOUT.get(phase, 600), _remaining())
        if timeout < MIN_PHASE_S:
            return {"error": f"skipped: global budget exhausted "
                             f"({_remaining():.0f}s left of {TOTAL_BUDGET_S:.0f}); {last_err}"
                             if last_err != "unknown" else
                             f"skipped: global budget exhausted "
                             f"({_remaining():.0f}s left of {TOTAL_BUDGET_S:.0f})"}
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", phase],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {timeout:.0f}s (attempt {attempt + 1}/{attempts})"
            continue
        if res.returncode == 0:
            # the phase's json line is the LAST stdout line (jax may log above)
            for line in reversed(res.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        return json.loads(line)
                    except json.JSONDecodeError:
                        continue
            last_err = f"no json in phase output (attempt {attempt + 1})"
        else:
            tail = (res.stderr or res.stdout or "").strip().splitlines()[-6:]
            last_err = f"rc={res.returncode}: " + " | ".join(tail)[-500:]
    return {"error": last_err}


def _emit(vols_per_sec, extra) -> None:
    """Print the (current) headline JSON line. Streamed after every phase:
    the driver keeps the tail and the last line wins, so partial progress is
    always parseable."""
    print(json.dumps({
        "metric": "cascade256_inference_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 4) if vols_per_sec else None,
        "unit": "vol/s/chip",
        "vs_baseline": round(vols_per_sec / REFERENCE_SAMPLES_PER_SEC, 2) if vols_per_sec else None,
        "extra": extra,
    }), flush=True)


def main(argv=None):
    """argv=None parses sys.argv; the CLI (`hvc bench`) passes an explicit
    list so its own subcommand tokens don't leak into this parser."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true",
                    help="inference metric only (fast driver runs)")
    ap.add_argument("--phase", choices=["probe", "inference", "train2", "train3"],
                    help="internal: run one benchmark phase in-process")
    args = ap.parse_args(argv)

    if args.phase:  # worker mode
        out = {
            "probe": phase_probe,
            "inference": phase_inference,
            "train2": lambda: phase_train(2, 2),
            "train3": lambda: phase_train(3, 1),
        }[args.phase]()
        print(json.dumps(out))
        return

    # First line lands immediately: even a kill during the probe leaves a
    # parseable (null-valued) record of how far the run got.
    extra = {"status": "started", "budget_s": TOTAL_BUDGET_S}
    _emit(None, extra)

    probe = _run_phase("probe")
    extra["probe"] = probe
    if "error" in probe or not probe.get("ok", False):
        extra["error"] = "preflight probe failed — TPU backend unavailable"
        extra["status"] = "aborted"
        _emit(None, extra)
        return

    extra["status"] = "probed"
    _emit(None, extra)

    inf = _run_phase("inference")
    vols_per_sec = inf.get("volumes_per_sec")
    if vols_per_sec is None:
        extra["inference_error"] = inf.get("error", "unknown")
    extra["status"] = "inference_done"
    _emit(vols_per_sec, extra)

    if not args.skip_train:
        # cheapest-first: stage-2's compile is ~5× cheaper than stage-3's, so
        # a budget squeeze sacrifices only the most expensive number
        for phase, key, ref_key in [
            ("train2", "train_stage2_128_b2_steps_per_sec", None),
            ("train3", "train_stage3_256_b1_steps_per_sec",
             "train_stage3_vs_reference_b200"),
        ]:
            r = _run_phase(phase)
            extra[key] = (round(r["steps_per_sec"], 4) if "steps_per_sec" in r
                          else f"error: {r.get('error', 'unknown')}")
            # Apples-to-apples ratio: OUR 256³ stage-3 training throughput
            # over the reference's only recorded 256³ training throughput
            # (B200). The headline vs_baseline mixes inference/training
            # (documented in the module docstring) — this one is same-task.
            if ref_key and isinstance(extra[key], float):
                extra[ref_key] = round(extra[key] / REFERENCE_SAMPLES_PER_SEC, 2)
            extra["status"] = f"{phase}_done"
            _emit(vols_per_sec, extra)

    extra["status"] = "complete"
    extra["elapsed_s"] = round(time.monotonic() - _T0, 1)
    _emit(vols_per_sec, extra)


if __name__ == "__main__":
    main()

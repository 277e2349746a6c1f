"""Ground-truth profile of the real stage-3 (or stage-2) train step.

Captures a jax.profiler device trace of bench.py's exact train step and
parses the Chrome-trace export: per-HLO-op device durations grouped by
category and by tf_op attribution, plus device idle time inside the module.
This replaces the compositional bisect probes (profile_step_bisect / _glue),
whose per-probe ~30 ms dispatch floor left a ~170 ms unattributed residual.

Usage: python scripts/profile_trace.py [--stage 3] [--batch 1] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(stage: int, batch: int, tracedir: str, iters: int,
            slabs: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    # bench.bench_train_stage times internally; we re-create its exact step
    # here instead so we can trace. Inline (duplicated on purpose — a probe).
    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
    from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear
    from hybrid_vit_cascade_tpu.training import make_optimizer, make_train_step
    from hybrid_vit_cascade_tpu.training.trainer import TrainState

    res = {1: 64, 2: 128, 3: 256}[stage]
    model = ProgressiveCascadeModel(dtype=jnp.bfloat16, attn_impl="auto",
                                    stage3_slab_scan=(stage == 3), remat_mode="mlp",
                                    slab_count=slabs)
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
    step = make_train_step(model, loss_fn,
                           {"max_stage": stage, "stop_grad_stage1": stage >= 2})
    rng = jax.random.PRNGKey(0)

    def _sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    state, m = step(state, batch_data, rng)
    _sync(m["total_loss"])
    state, m = step(state, batch_data, rng)  # absorb the donated-step recompile
    _sync(m["total_loss"])
    with jax.profiler.trace(tracedir):
        for _ in range(iters):
            state, m = step(state, batch_data, rng)
            _sync(m["total_loss"])
    print("trace captured", flush=True)


def analyze(tracedir: str, top: int) -> None:
    paths = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {tracedir}")
    d = json.load(gzip.open(paths[-1]))
    evs = d.get("traceEvents", [])

    # find the device pid and its thread names
    dev_pid = None
    tnames = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and e["args"]["name"].startswith("/device:TPU"):
            dev_pid = e["pid"]
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e.get("pid") == dev_pid:
            tnames[e["tid"]] = e["args"]["name"]
    ops_tid = [t for t, n in tnames.items() if n == "XLA Ops"]
    mod_tid = [t for t, n in tnames.items() if n == "XLA Modules"]

    mods = [e for e in evs if e.get("ph") == "X" and e.get("pid") == dev_pid
            and e.get("tid") in mod_tid]
    ops = [e for e in evs if e.get("ph") == "X" and e.get("pid") == dev_pid
           and e.get("tid") in ops_tid]
    by_mod = collections.Counter()
    mod_count = collections.Counter()
    for e in mods:
        name = e["name"].rstrip("0123456789.")
        by_mod[name] += e["dur"]
        mod_count[name] += 1
    print("modules (total ms, execs):")
    for name, dur in by_mod.most_common():
        print(f"  {name[:70]:70s} {dur/1e3:9.1f} {mod_count[name]:4d}")
    # step count = executions of the dominant module (the train step)
    per = mod_count[by_mod.most_common(1)[0][0]] if mods else 1
    mod_total = sum(e["dur"] for e in mods)
    if len(mods) > 1:
        # time BETWEEN module executions = dispatch/readback gaps
        mods_sorted = sorted(mods, key=lambda e: e["ts"])
        gaps = [mods_sorted[i+1]["ts"] - (mods_sorted[i]["ts"] + mods_sorted[i]["dur"])
                for i in range(len(mods) - 1)]
        print(f"inter-module gaps: {[round(g/1e3,1) for g in gaps]} ms")

    # Exclusive durations: ph=X events on one tid nest by (ts, dur); an op's
    # self time excludes its children (e.g. fusions inside a `while` body),
    # otherwise scan bodies are double-counted and idle reads negative.
    ops_sorted = sorted(ops, key=lambda e: (e["ts"], -e["dur"]))
    excl = {}
    stack = []
    for e in ops_sorted:
        while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"]:
            stack.pop()
        if stack:
            excl[id(stack[-1])] -= e["dur"]
        excl[id(e)] = excl.get(id(e), 0) + e["dur"]
        stack.append(e)
    op_total = sum(excl.values())
    print(f"ops: {len(ops)} events, {op_total/1e3:.1f} ms exclusive total; "
          f"device idle inside modules = {(mod_total-op_total)/1e3:.1f} ms; "
          f"per step = {mod_total/1e3/per:.1f} ms over {per} steps")
    by_cat = collections.Counter()
    by_name = collections.Counter()
    name_count = collections.Counter()
    flops_by_name = collections.Counter()
    bytes_by_name = collections.Counter()
    for e in ops:
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        dur = excl[id(e)]
        by_cat[cat] += dur
        # group by op-name stem (strip trailing .N / digits)
        name = e["name"].rstrip("0123456789.")
        by_name[name] += dur
        name_count[name] += 1
        flops_by_name[name] += int(args.get("model_flops", 0) or 0)
        bytes_by_name[name] += int(args.get("raw_bytes_accessed", 0) or 0)

    print(f"\n== by hlo_category (ms per step, over {per} steps) ==")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:34s} {dur/1e3/per:9.1f}")

    print(f"\n== top {top} op stems (ms per step) ==")
    print(f"  {'op':58s} {'ms':>8s} {'#':>5s} {'TF/s':>6s} {'GB/s':>7s}")
    for name, dur in by_name.most_common(top):
        tfs = flops_by_name[name] / (dur * 1e-6) / 1e12 / per if dur else 0
        gbs = bytes_by_name[name] / (dur * 1e-6) / 1e9 / per if dur else 0
        print(f"  {name[:58]:58s} {dur/1e3/per:8.1f} {name_count[name]//per:5d} "
              f"{tfs:6.1f} {gbs:7.0f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tracedir", type=str, default="/tmp/step_trace")
    ap.add_argument("--slabs", type=int, default=8)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.stage, args.batch, args.tracedir, args.iters, args.slabs)
    analyze(args.tracedir, args.top)


if __name__ == "__main__":
    main()

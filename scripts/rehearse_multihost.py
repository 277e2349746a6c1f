"""Two-process multi-host rehearsal on localhost CPU (round-3 VERDICT item 8).

Exercises, with REAL multiple processes (jax.distributed.initialize over a
localhost coordinator), the three multi-host paths that single-process tests
cannot reach:

  1. DataLoader per-process index sharding (data/pipeline.py `_indices`):
     the two processes must see disjoint halves of the dataset, same count.
  2. Global-batch assembly (`shard_batch` → make_array_from_process_local_data)
     + one real DP train step over the 2-device global mesh: the psum'd loss
     must be identical on both processes and finite.
  3. The collective checkpoint save (training/checkpoint.py `save`): every
     process calls save() (Orbax runs sync_global_devices barriers inside);
     only the filesystem bookkeeping in `_write` is process-0-gated. Both
     processes must agree on the best-tag decision and restore round-trip.
  4. A few-epoch `Trainer.fit_cascade` crossing the stage1→stage2 boundary
     (round-3 VERDICT item 7): per-stage optimizers/freeze masks, the
     host-side target pre-resize transform in the prefetch thread, sharded
     eval (global-batch divisibility), collective per-stage checkpoints, and
     a resume call that must skip both completed stages — with identical
     metrics on both processes at every step.

Run:  python scripts/rehearse_multihost.py          (spawns 2 workers, checks)
The reference has no analog — its DDP paths were only ever exercised on 4
physical GPUs (SURVEY.md §4 'Multi-node/multi-GPU is never tested').
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, port: int, tmp: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS env
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2 and len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np

    from hybrid_vit_cascade_tpu.data import SyntheticCTDataset
    from hybrid_vit_cascade_tpu.data.pipeline import DataLoader, shard_batch
    from hybrid_vit_cascade_tpu.losses import MultiScaleLoss
    from hybrid_vit_cascade_tpu.models import Stage1Base64
    from hybrid_vit_cascade_tpu.parallel import (data_sharding, make_mesh,
                                                 replicated_sharding)
    from hybrid_vit_cascade_tpu.training import (CheckpointManager,
                                                 make_optimizer,
                                                 make_train_step)
    from hybrid_vit_cascade_tpu.training.trainer import TrainState

    report = {"process": process_id}

    # --- 1. loader sharding: disjoint per-process index slices -------------
    ds = SyntheticCTDataset(num_patients=8, volume_size=(16, 16, 16), xray_size=64)
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=3, drop_last=True)
    report["loader_indices"] = [int(i) for i in loader._indices()]
    report["loader_len"] = len(loader)

    # --- 2. one DP train step over the global 2-device mesh ---------------
    mesh = make_mesh(data=2, model=1)
    model = Stage1Base64(volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1,
                         num_heads=4, xray_feature_dim=32)
    batch = next(iter(loader))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(batch["drr_stacked"][:1]))
    loss_obj = MultiScaleLoss()
    loss_fn = lambda pred, b: loss_obj(jnp.moveaxis(pred, -1, 1),
                                       b["ct_volume"], stage=1)
    tx = make_optimizer(1e-4, 10, trainable_prefixes=list(variables["params"].keys()),
                        params=variables["params"])
    repl = replicated_sharding(mesh)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=jax.device_put(variables["params"], repl),
                       batch_stats=jax.device_put(variables.get("batch_stats", {}), repl),
                       opt_state=jax.device_put(tx.init(variables["params"]), repl), tx=tx)
    gbatch = shard_batch({k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                         data_sharding(mesh))
    step = make_train_step(model, loss_fn)
    with mesh:
        state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
    report["loss"] = float(metrics["total_loss"])

    # --- 3. collective checkpoint save + restore round-trip ----------------
    # The Orbax save is a COLLECTIVE: every process calls it (it runs
    # sync_global_devices barriers internally); filesystem bookkeeping is
    # process-0-only inside CheckpointManager._write. A process-0-only early
    # return desyncs the barriers — the original bug this rehearsal caught.
    ckpt_dir = os.path.join(tmp, "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    host_params = jax.device_get(state.params)
    improved = mgr.save(host_params, epoch=0,
                        metrics={"loss": report["loss"], "psnr": 1.0, "ssim": 0.1})
    report["ckpt_improved"] = bool(improved)
    restored, meta = mgr.restore("latest", host_params)
    leaves_ok = jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.allclose(a, b)), restored, host_params))
    report["ckpt_roundtrip"] = bool(leaves_ok) and meta.get("epoch") == 0

    # --- 4. few-epoch fit_cascade across the stage1→stage2 boundary --------
    # Tiny cascade (8³→16³→32³), 2 epochs/stage: exercises per-stage
    # optimizers + freeze masks, the host pre-resize transform in the
    # prefetch thread, data-sharded eval under process_count=2, collective
    # per-stage checkpoints, and completed-stage skip on resume.
    from hybrid_vit_cascade_tpu.config import (CheckpointConfig, Config,
                                               DataConfig, ModelConfig,
                                               StageConfig, TrainingConfig)
    from hybrid_vit_cascade_tpu.training.trainer import Trainer

    cfg = Config(
        model=ModelConfig(family="cascade", volume_size=(8, 8, 8), xray_img_size=32,
                          voxel_dim=32, vit_depth=1, num_heads=4, xray_feature_dim=32,
                          stage_depths=(1, 1, 1), stage_heads=(4, 4, 4),
                          stage_sizes=(8, 16, 32), use_gradient_checkpointing=False,
                          attn_impl="xla"),
        training=TrainingConfig(seed=5, stages={
            "stage1": StageConfig(2, 2, 1e-4, (8, 8, 8)),
            "stage2": StageConfig(2, 2, 5e-5, (16, 16, 16)),
            "stage3": StageConfig(1, 2, 2e-5, (32, 32, 32)),
        }),
        data=DataConfig(synthetic=True, synthetic_patients=12, xray_size=32,
                        train_split=2 / 3, val_split=1 / 6, num_prefetch=2),
        checkpoints=CheckpointConfig(save_dir=os.path.join(tmp, "cascade_run")),
    )
    trainer = Trainer(cfg)
    fitted = trainer.fit_cascade(stages=("stage1", "stage2"), resume=True)
    report["cascade_metrics"] = {k: float(v) for k, v in fitted.items()}
    # resume: both completed stages must be skipped with best-meta echoed
    resumed = Trainer(cfg).fit_cascade(stages=("stage1", "stage2"), resume=True)
    report["cascade_resume"] = {k: float(v) for k, v in resumed.items()}

    with open(os.path.join(tmp, f"report_{process_id}.json"), "w") as f:
        json.dump(report, f)
    # Align process exits: interpreter teardown runs jax.distributed's
    # Shutdown barrier, which FAILS if one process exits minutes before the
    # other (process 0 pays the Orbax checkpoint write; process 1 doesn't).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rehearsal_done")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--tmp", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.port, args.tmp)
        return

    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp(prefix="hvc_multihost_")
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         "--port", str(port), "--tmp", tmp], env=env, cwd=REPO)
        for i in range(2)]
    rcs = [p.wait(timeout=900) for p in procs]
    assert rcs == [0, 0], f"worker return codes: {rcs}"

    reports = []
    for i in range(2):
        with open(os.path.join(tmp, f"report_{i}.json")) as f:
            reports.append(json.load(f))
    i0, i1 = (set(r["loader_indices"]) for r in reports)
    assert i0.isdisjoint(i1), (i0, i1)
    assert len(i0) == len(i1) == 4, (i0, i1)  # 8 patients, 2 hosts
    assert reports[0]["loader_len"] == reports[1]["loader_len"] == 2
    assert abs(reports[0]["loss"] - reports[1]["loss"]) < 1e-6, reports
    # identical deterministic best-tag decisions on both processes; restore
    # round-trips on both (only process 0 touched the filesystem)
    assert reports[0]["ckpt_improved"] and reports[1]["ckpt_improved"], reports
    assert reports[0]["ckpt_roundtrip"] and reports[1]["ckpt_roundtrip"], reports
    assert os.path.isdir(os.path.join(tmp, "ckpt", "latest"))
    # cascade fit: identical final metrics on both processes; resume skipped
    # both completed stages and echoed the same best metrics
    cm0, cm1 = reports[0]["cascade_metrics"], reports[1]["cascade_metrics"]
    for k in cm0:
        assert abs(cm0[k] - cm1[k]) < 1e-5, (k, cm0, cm1)
    rs0, rs1 = reports[0]["cascade_resume"], reports[1]["cascade_resume"]
    for k in ("psnr", "ssim"):  # resume echoes BEST meta — equal across procs
        assert abs(rs0[k] - rs1[k]) < 1e-5, (k, rs0, rs1)
    for st in ("stage1", "stage2"):
        assert os.path.isdir(os.path.join(tmp, "cascade_run", st, "latest")), st
    print(json.dumps({"multihost_rehearsal": "OK", "port": port,
                      "loss": reports[0]["loss"],
                      "cascade": cm0,
                      "indices": [sorted(i0), sorted(i1)]}))


if __name__ == "__main__":
    main()

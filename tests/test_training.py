"""Training-runtime tests: optimizer freezing, synthetic overfit gate,
checkpoint patterns, 8-device DP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_vit_cascade_tpu.config import Config
from hybrid_vit_cascade_tpu.training import (
    CheckpointManager,
    filtered_restore,
    make_optimizer,
    shape_matched_transfer,
    stage_freeze_labels,
)


class TestTrainStepBNFree:
    def test_train_step_without_batch_stats(self):
        """Regression: a model with NO BatchNorm (the CNN decoder families are
        GroupNorm-only) must pass a plain array as `pred` into the loss —
        flax's apply returns an (out, vars) tuple for ANY list-valued
        `mutable`, including the empty list, which used to leak into
        loss_fn."""
        import flax.linen as nn

        from hybrid_vit_cascade_tpu.training.trainer import TrainState, make_train_step

        class Tiny(nn.Module):  # GroupNorm-only, no batch_stats collection
            @nn.compact
            def __call__(self, x, train=False):
                h = nn.Dense(8)(x.reshape(x.shape[0], -1))
                return nn.Dense(4)(nn.silu(h))

        model = Tiny()
        batch = {"drr_stacked": jnp.ones((2, 2, 1, 4, 4)), "ct_volume": jnp.ones((2, 4))}
        variables = model.init(jax.random.PRNGKey(0), batch["drr_stacked"])
        assert "batch_stats" not in variables
        tx = make_optimizer(1e-3, 10, trainable_prefixes=list(variables["params"].keys()),
                            params=variables["params"])
        state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                           batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx)

        def loss_fn(pred, b):
            assert not isinstance(pred, tuple), "pred leaked flax's (out, vars) tuple"
            return {"total_loss": jnp.mean((pred - b["ct_volume"]) ** 2)}

        step = make_train_step(model, loss_fn)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total_loss"]))


class TestFreezing:
    def test_stage_freeze_labels(self):
        params = {"stage1": {"w": jnp.ones(3)}, "stage2": {"w": jnp.ones(3)}, "xray_encoder": {"w": jnp.ones(3)}}
        labels = stage_freeze_labels(params, ["stage2", "xray_encoder"])
        assert labels["stage1"]["w"] == "freeze"
        assert labels["stage2"]["w"] == "train"

    def test_frozen_params_do_not_move(self):
        params = {"stage1": {"w": jnp.ones(4)}, "stage2": {"w": jnp.ones(4)}}
        tx = make_optimizer(0.1, 100, trainable_prefixes=["stage2"], params=params)
        grads = {"stage1": {"w": jnp.ones(4)}, "stage2": {"w": jnp.ones(4)}}
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates["stage1"]["w"]).max()) == 0.0
        assert float(jnp.abs(updates["stage2"]["w"]).max()) > 0.0

    def test_stop_grad_stage1_trainable_grads_unchanged(self):
        """stop_grad_stage1 prunes the frozen stage-1 backward (the
        reference's requires_grad=False semantics) WITHOUT touching the
        gradients of anything trainable at max_stage>=2: stage-N subtrees and
        the cascade-level encoder grads are the same math (only XLA fusion
        order may differ — tight tolerance), while stage-1 grads become
        exactly zero."""
        from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel

        model = ProgressiveCascadeModel(
            stage_sizes=(8, 16, 32), voxel_dim=32, stage_depths=(1, 1, 1),
            stage_heads=(4, 4, 4), xray_feature_dim=32, attn_impl="xla",
        )
        xrays = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 32, 32))
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16, 1)) * 0.3
        variables = jax.jit(lambda x: model.init(jax.random.PRNGKey(2), x, max_stage=2))(xrays)

        bs = variables.get("batch_stats", {})

        def loss(params, sg):
            pred = model.apply({"params": params, "batch_stats": bs}, xrays,
                               max_stage=2, stop_grad_stage1=sg)
            return jnp.mean((pred - target) ** 2)

        g_off = jax.jit(jax.grad(lambda p: loss(p, False)))(variables["params"])
        g_on = jax.jit(jax.grad(lambda p: loss(p, True)))(variables["params"])
        for sub in ("stage2", "xray_encoder"):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
                g_off[sub], g_on[sub])
        leaves = jax.tree.leaves(g_on["stage1"])
        assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)
        # ...and without the flag stage-1 gradients were actually nonzero
        assert any(float(jnp.abs(l).max()) > 0.0 for l in jax.tree.leaves(g_off["stage1"]))


class TestCheckpointing:
    def _tree(self, scale=1.0):
        return {"params": {"stage1": {"w": jnp.full((3,), scale)}, "stage2": {"b": jnp.full((2,), scale * 2)}},
                "batch_stats": {}}

    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_every=2)
        tree = self._tree(1.5)
        mgr.save(tree, epoch=0, metrics={"loss": 0.5, "psnr": 20.0, "ssim": 0.7}, config={"a": 1})
        restored, meta = mgr.restore("latest", self._tree(0.0))
        np.testing.assert_allclose(np.asarray(restored["params"]["stage1"]["w"]), 1.5)
        assert meta["epoch"] == 0 and meta["config"] == {"a": 1}

    def test_triple_best_checkpoints(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_every=0)
        mgr.save(self._tree(1), 0, {"loss": 0.5, "psnr": 20.0, "ssim": 0.5})
        improved = mgr.save(self._tree(2), 1, {"loss": 0.6, "psnr": 25.0, "ssim": 0.4})
        assert improved == {"psnr": True}  # loss worse, ssim worse, psnr better
        best_psnr, meta = mgr.restore("best_psnr", self._tree(0))
        assert meta["epoch"] == 1
        best_loss, meta = mgr.restore("best_loss", self._tree(0))
        assert meta["epoch"] == 0

    def test_periodic_checkpoints(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_every=2)
        for e in range(4):
            mgr.save(self._tree(e), e, {"loss": 1.0})
        assert (tmp_path / "epoch_0001").exists()
        assert (tmp_path / "epoch_0003").exists()
        assert not (tmp_path / "epoch_0000").exists()

    def test_opt_state_roundtrip(self, tmp_path):
        """Optimizer state + step are checkpointed alongside the model tree
        and restored exactly (ref: resume_direct128.py:87-88 restores
        optimizer_state_dict)."""
        mgr = CheckpointManager(str(tmp_path), save_every=0)
        params = {"stage1": {"w": jnp.ones(3)}}
        tx = make_optimizer(1e-3, 100)
        opt_state = tx.init(params)
        # advance the optimizer so the restored state is distinguishable
        for _ in range(3):
            updates, opt_state = tx.update({"stage1": {"w": jnp.ones(3)}}, opt_state, params)
        mgr.save({"params": params, "batch_stats": {}}, 0, {"loss": 1.0},
                 opt={"opt_state": opt_state, "step": jnp.asarray(3, jnp.int32)})
        template = {"opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}
        restored = mgr.restore_opt(template)
        assert restored is not None
        assert int(restored["step"]) == 3
        got_mu = jax.tree.leaves(restored["opt_state"])
        want_mu = jax.tree.leaves(opt_state)
        for g, w in zip(got_mu, want_mu):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))

    def test_restore_opt_absent_or_mismatched(self, tmp_path):
        """Legacy checkpoints without latest_opt (or with a different
        optimizer structure) resume with fresh optimizer state, not a crash."""
        mgr = CheckpointManager(str(tmp_path), save_every=0)
        params = {"w": jnp.ones(2)}
        mgr.save({"params": params, "batch_stats": {}}, 0, {"loss": 1.0})  # no opt
        assert mgr.restore_opt({"opt_state": (), "step": jnp.zeros(())}) is None

    def test_filtered_restore(self):
        params = self._tree()["params"]
        loaded = {"stage1": {"w": jnp.zeros(3)}, "stage2": {"b": jnp.zeros(2)}}
        out = filtered_restore(params, loaded, include_prefixes=["stage1"])
        assert float(out["stage1"]["w"].sum()) == 0.0
        assert float(out["stage2"]["b"].sum()) != 0.0

    def test_shape_matched_transfer(self):
        params = {"a": jnp.zeros((2, 3)), "b": jnp.zeros((4,)), "c": jnp.zeros((5,))}
        loaded = {"a": np.ones((2, 3)), "b": np.ones((9,)), "d": np.ones((1,))}
        out, transferred, skipped = shape_matched_transfer(params, loaded)
        assert transferred == 1 and float(out["a"].sum()) == 6.0
        assert float(out["b"].sum()) == 0.0  # shape mismatch skipped


class TestEndToEnd:
    def test_synthetic_overfit_direct_vit(self, tmp_path):
        """Acceptance gate mirroring start_direct_training.sh:16-21: loss must
        drop markedly when overfitting a tiny synthetic set."""
        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = Config()
        cfg.model.family = "direct_vit"
        cfg.model.volume_size = (16, 16, 16)
        cfg.model.voxel_dim = 32
        cfg.model.vit_depth = 1
        cfg.model.num_heads = 4
        cfg.model.xray_feature_dim = 32
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 4
        cfg.data.xray_size = 64
        cfg.data.train_split = 1.0
        cfg.data.val_split = 0.0
        cfg.training.num_epochs = 12
        cfg.training.batch_size = 4
        cfg.training.learning_rate = 3e-3
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0

        tr = Trainer(cfg)
        import json, pathlib

        tr.fit(progress=False)
        log = [json.loads(l) for l in pathlib.Path(cfg.checkpoints.save_dir, "training_log.jsonl").read_text().splitlines()]
        first, last = log[0]["train_loss"], log[-1]["train_loss"]
        assert last < first * 0.7, (first, last)
        assert log[-1]["psnr"] > 10.0, log[-1]


class TestCascadeTrainer:
    def test_fit_cascade_stagewise_tiny(self, tmp_path):
        """End-to-end stagewise pipeline (train stage1 → freeze → stage2 →
        freeze → stage3) at scaled-down cube sizes. Exercises per-stage
        optimizers/masks, target resizing, per-stage checkpoints."""
        from hybrid_vit_cascade_tpu.config import Config, StageConfig
        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = Config()
        cfg.model.family = "cascade"
        cfg.model.voxel_dim = 32
        cfg.model.xray_feature_dim = 32
        cfg.model.stage_depths = (1, 1, 1)
        cfg.model.stage_heads = (4, 4, 4)
        cfg.model.stage_sizes = (16, 32, 64)
        # the production fast path: streamed slab chains + mlp-granular remat
        cfg.model.stage3_slab_scan = True
        cfg.model.slab_count = 4
        cfg.model.slab_impl = "streamed"
        cfg.model.remat_mode = "mlp"
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 2
        cfg.data.xray_size = 64
        cfg.data.train_split = 1.0
        cfg.data.val_split = 0.0
        cfg.training.stages = {
            "stage1": StageConfig(1, 2, 1e-3, (16, 16, 16)),
            "stage2": StageConfig(1, 2, 1e-3, (32, 32, 32)),
            "stage3": StageConfig(1, 2, 1e-3, (64, 64, 64)),
        }
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        cfg.training.viz_every = 1  # exercise the epoch-end visualization hook
        metrics = Trainer(cfg).fit()
        assert np.isfinite(metrics["loss"])
        for stage in ("stage1", "stage2", "stage3"):
            assert (tmp_path / "ckpt" / stage / "latest").exists(), stage
        # epoch-end visualization (ref visualize_epoch_features): every stage
        # wrote its prediction grid; stage-1 also captured attention salience
        viz = tmp_path / "ckpt" / "viz" / "epoch_000"
        for stage in ("stage1", "stage2", "stage3"):
            assert (viz / f"{stage}_prediction_vs_gt.png").exists(), stage
            assert (viz / f"{stage}_xray_features.png").exists(), stage
        assert (viz / "stage1_attention_salience.png").exists()


class TestCascadeResume:
    def _cfg(self, tmp_path, stage2_epochs):
        from hybrid_vit_cascade_tpu.config import Config, StageConfig

        cfg = Config()
        cfg.model.family = "cascade"
        cfg.model.voxel_dim = 32
        cfg.model.xray_feature_dim = 32
        cfg.model.stage_depths = (1, 1, 1)
        cfg.model.stage_heads = (4, 4, 4)
        cfg.model.stage_sizes = (8, 16, 32)
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 2
        cfg.data.xray_size = 64
        cfg.data.train_split = 1.0
        cfg.data.val_split = 0.0
        cfg.training.stages = {
            "stage1": StageConfig(2, 2, 1e-3, (8, 8, 8)),
            "stage2": StageConfig(stage2_epochs, 2, 1e-3, (16, 16, 16)),
            "stage3": StageConfig(1, 2, 1e-3, (32, 32, 32)),  # config-complete, never trained here
        }
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        return cfg

    def test_resume_skips_completed_and_continues_in_progress(self, tmp_path):
        """Kill/restart semantics (ref train_progressive_1gpu.py:205-235):
        a finished stage is restored from disk and skipped; an interrupted
        stage resumes at its saved epoch with its optimizer step intact."""
        import csv
        import json
        import pathlib

        from hybrid_vit_cascade_tpu.training import Trainer

        stages = ("stage1", "stage2")
        # run 1: stage1 (2 epochs) + stage2 interrupted after 1 of 3 epochs,
        # simulated by configuring stage2 for a single epoch
        Trainer(self._cfg(tmp_path, stage2_epochs=1)).fit_cascade(stages=stages, progress=False)
        ckpt = tmp_path / "ckpt"
        assert json.loads((ckpt / "stage2" / "latest" / "meta.json").read_text())["epoch"] == 0

        # run 2: full schedule (stage2: 3 epochs) → stage1 skipped, stage2
        # resumes at epoch 1
        Trainer(self._cfg(tmp_path, stage2_epochs=3)).fit_cascade(stages=stages, progress=False)
        assert json.loads((ckpt / "stage2" / "latest" / "meta.json").read_text())["epoch"] == 2
        assert json.loads((ckpt / "stage1" / "latest" / "meta.json").read_text())["epoch"] == 1

        rows = list(csv.DictReader(pathlib.Path(ckpt, "training_log.csv").open()))
        stage1_epochs = [r for r in rows if r["phase"] == "stage1"]
        stage2_epochs = [r for r in rows if r["phase"] == "stage2"]
        assert len(stage1_epochs) == 2, "stage1 must not retrain on resume"
        assert [r["epoch"] for r in stage2_epochs] == ["0", "1", "2"]

        # optimizer state is persisted alongside the stage checkpoint
        assert (ckpt / "stage2" / "latest_opt").exists()

    def test_stage3_frozen_encoder_and_split_step(self, tmp_path):
        """freeze_shared_encoder_stage3 + stage3_split_step (round-3 VERDICT
        items 2 and 5): stage 3 trains against a precomputed stage-2 volume,
        the shared encoder (params AND BN running stats) must be bitwise
        unchanged by stage-3 training — so the stage-2 intermediate cannot
        collapse — and the stage2_volume-injected forward must equal the full
        cascade forward exactly at eval."""
        import numpy as np

        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = self._cfg(tmp_path, stage2_epochs=1)
        cfg.training.freeze_shared_encoder_stage3 = True
        cfg.training.stage3_split_step = True
        tr = Trainer(cfg)
        out = tr.fit_cascade(progress=False)  # all three stages
        assert np.isfinite(out["loss"])

        # shared encoder pinned through stage 3: compare stage-2-end vs
        # stage-3-end checkpoints (params and batch_stats)
        import jax

        from hybrid_vit_cascade_tpu.training import CheckpointManager

        tpl = {"params": jax.device_get(tr._last_state.params),
               "batch_stats": jax.device_get(tr._last_state.batch_stats)}
        ck2, _ = CheckpointManager(str(tmp_path / "ckpt" / "stage2")).restore("latest", dict(tpl))
        ck3, _ = CheckpointManager(str(tmp_path / "ckpt" / "stage3")).restore("latest", dict(tpl))
        for coll in ("params", "batch_stats"):
            a, b = ck2[coll]["xray_encoder"], ck3[coll]["xray_encoder"]
            flat_a = jax.tree_util.tree_leaves(a)
            flat_b = jax.tree_util.tree_leaves(b)
            for x, y in zip(flat_a, flat_b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # ...and stage-3 itself actually trained
        s3_moved = any(
            not np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(ck2["params"]["stage3"]),
                            jax.tree_util.tree_leaves(ck3["params"]["stage3"])))
        assert s3_moved, "stage-3 params did not move"

        # exactness of the injection point: full forward == split forward
        import jax.numpy as jnp

        vs = {"params": tr._last_state.params}
        if tr._last_state.batch_stats:
            vs["batch_stats"] = tr._last_state.batch_stats
        xr = jnp.asarray(np.asarray(tr.train_ds[0]["drr_stacked"])[None], jnp.float32)
        full = tr.model.apply(vs, xr, train=False, max_stage=3)
        vol2 = tr.model.apply(vs, xr, train=False, max_stage=2)
        split = tr.model.apply(vs, xr, train=False, max_stage=3, stage2_volume=vol2)
        np.testing.assert_allclose(np.asarray(full), np.asarray(split), rtol=1e-6, atol=1e-6)


class TestDiffusionTrainer:
    def test_diffusion_one_epoch(self, tmp_path):
        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = Config()
        cfg.model.family = "diffusion"
        cfg.model.volume_size = (16, 16, 16)
        cfg.model.voxel_dim = 32
        cfg.model.vit_depth = 1
        cfg.model.num_heads = 4
        cfg.model.xray_feature_dim = 32
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 2
        cfg.data.xray_size = 64
        cfg.data.train_split = 1.0
        cfg.data.val_split = 0.0
        cfg.training.num_epochs = 1
        cfg.training.batch_size = 2
        cfg.training.diffusion_sample_steps = 4  # keep the CPU eval fast
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        metrics = Trainer(cfg).fit(progress=False)
        assert np.isfinite(metrics["loss"])
        # eval now runs the DDIM sampler → real (finite, nonzero) metrics
        assert np.isfinite(metrics["psnr"]) and metrics["psnr"] != 0.0
        assert 0.0 <= metrics["ssim"] <= 1.0 and metrics["ssim"] != 0.0

    def test_diffusion_cascade_chaining(self, tmp_path):
        """Progressive diffusion (VERDICT r3 item 6): a 2-stage tiny ladder
        trains with GT-prev conditioning (stage 2's train/eval feed
        prev_stage_volume), then cascaded DDIM sampling chains stage 2 on
        stage 1's GENERATED volume. Matches unified_model.py:261-392's
        prev_stage_volume surface, which no reference script ever drove."""
        from hybrid_vit_cascade_tpu.config import StageConfig
        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = Config()
        cfg.model.family = "diffusion"
        cfg.model.volume_size = (16, 16, 16)
        cfg.model.voxel_dim = 32
        cfg.model.vit_depth = 1
        cfg.model.num_heads = 4
        cfg.model.xray_feature_dim = 32
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 2
        cfg.data.xray_size = 64
        cfg.data.train_split = 1.0
        cfg.data.val_split = 0.0
        cfg.training.batch_size = 2
        cfg.training.diffusion_sample_steps = 2
        cfg.training.stages = {
            "stage1": StageConfig(1, 2, 1e-4, (8, 8, 8)),
            "stage2": StageConfig(1, 2, 1e-4, (16, 16, 16)),
        }
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        ladder = (
            dict(name="lo", volume_size=(8, 8, 8), voxel_dim=32, vit_depth=1,
                 num_heads=4, use_depth_lifting=True, use_physics_loss=True),
            dict(name="hi", volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1,
                 num_heads=4, use_depth_lifting=True, use_physics_loss=True),
        )
        # the trainer builds the model from config (single-stage ladder at
        # tiny sizes); rebuild it with the 2-stage test ladder
        tr = Trainer(cfg)
        from hybrid_vit_cascade_tpu.models import UnifiedHybridViTCascade

        tr.model = UnifiedHybridViTCascade(stage_configs=ladder, xray_embed_dim=32,
                                           num_timesteps=10)
        metrics = tr.fit_diffusion_cascade(stage_configs=ladder, progress=False)
        for nm in ("lo", "hi"):
            assert np.isfinite(metrics[f"chain_{nm}_psnr"]), metrics
            assert 0.0 <= metrics[f"chain_{nm}_ssim"] <= 1.0, metrics
            assert (tmp_path / "ckpt" / f"diffusion_{nm}" / "latest").exists()
        # prev-conditioning params materialized for the refiner stage (proof
        # the chaining path is real, not silently unconditioned)
        assert "prev_proj_hi" in tr._last_state.params


@pytest.mark.slow  # full-cascade virtual-mesh dryruns: minutes of CPU
# compile, and the driver's own MULTICHIP check runs this very entry point
class TestSharding:
    def test_dryrun_multichip_8(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        import __graft_entry__ as g

        assert jax.device_count() >= 8
        g.dryrun_multichip(8)

    def test_full_cascade_flash_path_engages_and_matches_xla(self):
        """The PRODUCTION multi-chip attention graph: Pallas flash composed
        inside the full 3-stage train step under a (data, model) mesh must
        (a) actually take the head-sharded path — pinned via the trace-time
        dispatch log — and (b) match the single-device exact-softmax step
        (round-2 VERDICT item 4)."""
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        import __graft_entry__ as g
        from hybrid_vit_cascade_tpu.ops.attention import dispatch_log
        from hybrid_vit_cascade_tpu.parallel import make_mesh

        assert jax.device_count() >= 8
        mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
        dispatch_log(clear=True)
        loss_flash = g.run_full_cascade_step(mesh, global_batch=4, attn_impl="flash")
        paths = {d["path"] for d in dispatch_log(clear=True)}
        assert "head" in paths, paths
        single = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        loss_xla = g.run_full_cascade_step(single, global_batch=4, attn_impl="xla")
        np.testing.assert_allclose(loss_flash, loss_xla, rtol=2e-3, atol=2e-4)

    def test_model_axis_matches_dp(self):
        """Sequence-sharding voxel tokens over the 'model' axis is a pure
        re-partition: the hybrid (data=4, model=2) step must numerically
        match the DP-only (data=4) step on the same global batch."""
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        import __graft_entry__ as g
        from hybrid_vit_cascade_tpu.parallel import make_mesh

        assert jax.device_count() >= 8
        mesh_dp = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        mesh_hy = make_mesh(data=4, model=2, devices=jax.devices()[:8])
        loss_dp, params_dp = g.run_cascade_step(mesh_dp, global_batch=8)
        loss_hy, params_hy = g.run_cascade_step(mesh_hy, global_batch=8)
        np.testing.assert_allclose(loss_hy, loss_dp, rtol=1e-5, atol=1e-6)
        # Adam's grad/(sqrt(v)+eps) amplifies reduction-order noise on
        # near-zero grads — allow a few e-5 of absolute slack on the params
        for got, want in zip(jax.tree.leaves(params_hy), jax.tree.leaves(params_dp)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-5)


@pytest.mark.slow
class TestRefinementDirection:
    def test_stage2_refines_its_stage1_input_on_path(self, tmp_path):
        """On-path quality guard (round-4 VERDICT item 3a): actually run
        fit_cascade (stage1 → stage2) on seeded phantoms and assert the
        refinement DIRECTION — stage-2 training improves the val PSNR of its
        own stage-1-derived starting point. Unlike
        tests/test_quality_regression.py (which parses the committed run
        artifact), this fails on a CODE change that breaks refinement:
        carry-best transitions, stage freezing, loss dispatch, resize
        conventions, or the optimizer masks."""
        import json
        import pathlib

        from hybrid_vit_cascade_tpu.config import Config, StageConfig
        from hybrid_vit_cascade_tpu.training import Trainer

        cfg = Config()
        cfg.model.family = "cascade"
        cfg.model.voxel_dim = 32
        cfg.model.xray_feature_dim = 32
        cfg.model.stage_depths = (1, 1, 1)
        cfg.model.stage_heads = (4, 4, 4)
        cfg.model.stage_sizes = (16, 32, 64)
        cfg.data.synthetic = True
        cfg.data.synthetic_patients = 8
        cfg.data.xray_size = 64
        cfg.data.train_split = 0.75
        cfg.data.val_split = 0.25
        cfg.training.stages = {
            "stage1": StageConfig(6, 2, 1e-3, (16, 16, 16)),
            "stage2": StageConfig(8, 2, 1e-3, (32, 32, 32)),
            "stage3": StageConfig(1, 2, 1e-3, (64, 64, 64)),  # config-complete
        }
        # quality-run loss shape (aux terms trimmed: the r4 log showed the
        # unnormalized freq/vgg terms trading val PSNR away after the peak)
        cfg.loss.stage2 = {"l1": 1.0, "ssim": 0.5, "vgg": 0.0, "tv": 0.005, "freq": 0.002}
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        Trainer(cfg).fit_cascade(stages=("stage1", "stage2"), progress=False)

        log = [json.loads(l) for l in pathlib.Path(
            cfg.checkpoints.save_dir, "training_log.jsonl").read_text().splitlines()]
        s2 = [r["psnr"] for r in log if r.get("phase") == "stage2" and "psnr" in r]
        assert len(s2) == 8, s2
        # direction: stage-2 training must IMPROVE on its starting point
        # (first-epoch val PSNR), not erode it
        assert max(s2) > s2[0] + 0.1, s2
        # and the stage-2 peak must at least reach the stage-1 quality bar
        # (the flagship refinement property, reference QUALITY_IMPROVEMENT.md:5)
        s1 = [r["psnr"] for r in log if r.get("phase") == "stage1" and "psnr" in r]
        assert max(s2) > max(s1) - 0.5, (max(s1), max(s2))

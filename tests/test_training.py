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
        metrics = Trainer(cfg).fit()
        assert np.isfinite(metrics["loss"])
        for stage in ("stage1", "stage2", "stage3"):
            assert (tmp_path / "ckpt" / stage / "latest").exists(), stage


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
        cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoints.save_every = 0
        metrics = Trainer(cfg).fit(progress=False)
        assert np.isfinite(metrics["loss"])


class TestSharding:
    def test_dryrun_multichip_8(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        import __graft_entry__ as g

        assert jax.device_count() >= 8
        g.dryrun_multichip(8)

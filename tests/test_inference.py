"""Inference engine roundtrip + config round-trip + CLI smoke."""

import json
from pathlib import Path

import numpy as np
import pytest

from hybrid_vit_cascade_tpu.config import Config, validate_config


def _tiny_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.model.family = "direct_vit"
    cfg.model.volume_size = (16, 16, 16)
    cfg.model.voxel_dim = 32
    cfg.model.vit_depth = 1
    cfg.model.num_heads = 4
    cfg.model.xray_feature_dim = 32
    cfg.data.synthetic = True
    cfg.data.synthetic_patients = 3
    cfg.data.xray_size = 64
    cfg.data.train_split = 1.0
    cfg.data.val_split = 0.0
    cfg.training.num_epochs = 1
    cfg.training.batch_size = 2
    cfg.checkpoints.save_dir = str(tmp_path / "ckpt")
    cfg.checkpoints.save_every = 0
    return cfg


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        p = tmp_path / "c.json"
        cfg.to_json(str(p))
        cfg2 = Config.from_json(str(p))
        assert cfg2.model.voxel_dim == 32
        assert tuple(cfg2.model.volume_size) == (16, 16, 16)
        assert cfg2.training.stages["stage2"].batch_size == 2
        validate_config(cfg2)

    def test_validate_rejects_bad(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        cfg.model.family = "nope"
        with pytest.raises(ValueError):
            validate_config(cfg)
        cfg = _tiny_cfg(tmp_path)
        cfg.data.synthetic = False
        with pytest.raises(ValueError):
            validate_config(cfg)

    def test_loads_reference_style_progressive_json(self, tmp_path):
        # the reference's config_progressive.json puts stage blocks in "training"
        ref_style = {
            "model_name": "progressive_cascade_multiscale",
            "model": {"xray_feature_dim": 512, "voxel_dim": 256},
            "training": {
                "weight_decay": 0.01,
                "stage1": {"num_epochs": 50, "batch_size": 8, "learning_rate": 1e-4},
                "stage2": {"num_epochs": 30, "batch_size": 2, "learning_rate": 5e-5},
                "stage3": {"num_epochs": 20, "batch_size": 2, "learning_rate": 2e-5},
            },
            "loss": {"stage1": {"l1": 1.0, "ssim": 0.5}},
        }
        p = tmp_path / "ref.json"
        p.write_text(json.dumps(ref_style))
        cfg = Config.from_json(str(p))
        assert cfg.model.family == "cascade"
        assert cfg.training.stages["stage2"].learning_rate == 5e-5


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """One tiny trained checkpoint shared by the engine tests."""
    from hybrid_vit_cascade_tpu.training import Trainer

    tmp = tmp_path_factory.mktemp("engine")
    cfg = _tiny_cfg(tmp)
    Trainer(cfg).fit(progress=False)
    return cfg


class TestInferenceEngine:
    def test_train_save_infer_roundtrip(self, tmp_path, trained_ckpt):
        from hybrid_vit_cascade_tpu.inference import InferenceEngine
        from hybrid_vit_cascade_tpu.data import SyntheticCTDataset

        cfg = trained_ckpt
        engine = InferenceEngine(str(Path(cfg.checkpoints.save_dir) / "latest"))
        assert engine.cfg.model.voxel_dim == 32  # config recovered from ckpt

        ds = SyntheticCTDataset(num_patients=1, volume_size=(16, 16, 16), xray_size=64)
        item = ds[0]
        vol = engine.reconstruct(item["drr_stacked"][None])
        assert np.asarray(vol).shape == (1, 1, 16, 16, 16)

        metrics = engine.evaluate_sample(item)
        assert np.isfinite(metrics["psnr"]) and 0 <= metrics["ssim"] <= 1

        paths = engine.export(item["drr_stacked"][None], str(tmp_path / "out"),
                              prefix="t", upscale=(24, 24, 24),
                              target=item["ct_volume"][None])
        assert Path(paths["npy"]).exists()
        up = np.load(paths["npy"])
        assert up.shape == (24, 24, 24)
        assert Path(paths["views"]).exists()
        # 18-panel summary figure incl. MIP (inference_direct.py:98-235)
        assert Path(paths["summary"]).exists()

        summary = engine.evaluate_dataset(ds, out_json=str(tmp_path / "eval.json"))
        assert "psnr" in summary and (tmp_path / "eval.json").exists()

    def test_export_serving_roundtrip(self, tmp_path, trained_ckpt):
        """StableHLO serving artifact: weights baked in, loadable without
        model code, numerically identical to the live engine."""
        from pathlib import Path as _P

        from hybrid_vit_cascade_tpu.data import SyntheticCTDataset
        from hybrid_vit_cascade_tpu.inference import InferenceEngine, load_serving

        cfg = trained_ckpt
        engine = InferenceEngine(str(_P(cfg.checkpoints.save_dir) / "latest"))
        art = tmp_path / "model.stablehlo"
        info = engine.export_serving(str(art), batch_size=1)
        assert art.exists() and info["bytes"] > 0
        assert (tmp_path / "model.stablehlo.json").exists()

        serve = load_serving(str(art))
        ds = SyntheticCTDataset(num_patients=1, volume_size=(16, 16, 16), xray_size=64)
        xr = ds[0]["drr_stacked"][None]
        got = np.asarray(serve(xr))
        want = np.asarray(engine.reconstruct(xr))
        assert got.shape == want.shape == (1, 1, 16, 16, 16)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_inspect_checkpoint(self, trained_ckpt):
        from hybrid_vit_cascade_tpu.inference import inspect_checkpoint

        report = inspect_checkpoint(str(Path(trained_ckpt.checkpoints.save_dir) / "latest"))
        assert report["meta"].get("epoch") == 0

    def test_diagnose_cli(self, tmp_path, trained_ckpt, capsys):
        """`diagnose` grades a reconstruction via DiagnosticLosses with live
        cross-attention capture (diagnostic_losses.py:534-636)."""
        import json as _json

        from hybrid_vit_cascade_tpu.cli import main as cli_main

        cli_main([
            "diagnose", "--checkpoint", str(Path(trained_ckpt.checkpoints.save_dir) / "latest"),
            "--synthetic", "--output", str(tmp_path / "diag.json"),
        ])
        report = _json.loads((tmp_path / "diag.json").read_text())
        assert "diffusion" in report["losses"] and "projection_single" in report["losses"]
        assert report["health"]  # at least one graded component
        assert report["captured_attention"] == ["cross_attention"]
        assert all(np.isfinite(v) for v in report["losses"].values())

    def test_raw_xray_pair_cli(self, tmp_path, trained_ckpt, rng):
        """Raw PNG pair → reconstruction, no dataset folder
        (inference_visualization.py:196-248's --pa_xray/--lat_xray surface)."""
        from PIL import Image

        from hybrid_vit_cascade_tpu.cli import main as cli_main

        pa = tmp_path / "pa.png"
        lat = tmp_path / "lat.png"
        for p in (pa, lat):
            Image.fromarray((rng.random((80, 80)) * 255).astype(np.uint8)).save(p)

        cli_main([
            "infer", "--checkpoint", str(Path(trained_ckpt.checkpoints.save_dir) / "latest"),
            "--pa-xray", str(pa), "--lat-xray", str(lat),
            "--output", str(tmp_path / "out"), "--denormalize",
        ])
        vol = np.load(tmp_path / "out" / "raw_pair.npy")
        assert vol.shape == (16, 16, 16)
        assert vol.min() >= -1024 - 1 and vol.max() <= 3071 + 1  # HU denormalized

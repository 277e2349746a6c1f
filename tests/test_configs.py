"""Every shipped preset in configs/ must load, validate, and build its model
with a consistent shape plan. Guards against exactly the reference's failure
mode: its progressive_h200 config can't instantiate its own model
(SURVEY.md §2.8 — broken preset committed and never loaded by a test)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from hybrid_vit_cascade_tpu.config import Config, validate_config
from hybrid_vit_cascade_tpu.training.trainer import build_model

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
PRESETS = sorted(CONFIG_DIR.glob("*.json"))


@pytest.mark.parametrize("path", PRESETS, ids=lambda p: p.stem)
def test_preset_loads_validates_and_builds(path):
    cfg = Config.from_json(str(path))
    if not cfg.data.dataset_path:
        # real-data presets ship with dataset_path deliberately blank (the
        # user fills it in); architecture checks don't need data
        cfg.data.synthetic = True
    validate_config(cfg)
    model = build_model(cfg)
    # shape-only init: proves the architecture is self-consistent (pos-embed
    # vs stem plan, stage ladders, encoder dims) without paying any FLOPs —
    # exactly what the reference's broken progressive_h200 preset fails
    xrays = jnp.zeros((1, 2, 1, cfg.data.xray_size, cfg.data.xray_size), jnp.float32)
    rng = jax.random.PRNGKey(0)
    if cfg.model.family == "diffusion":
        from hybrid_vit_cascade_tpu.training.trainer import diffusion_stage_configs

        stage = diffusion_stage_configs(cfg.model)[0]
        vol = jnp.zeros((1, 1) + tuple(stage["volume_size"]), jnp.float32)
        shapes = jax.eval_shape(lambda: model.init(rng, vol, xrays, stage["name"], rng))
    elif cfg.model.family == "cascade":
        shapes = jax.eval_shape(lambda: model.init(rng, xrays, max_stage=3))
    else:
        shapes = jax.eval_shape(lambda: model.init(rng, xrays))
    n_params = sum(s.size for s in jax.tree.leaves(shapes["params"]))
    assert n_params > 1_000, (path.stem, n_params)


def test_preset_round_trip(tmp_path):
    """from_json(to_json(cfg)) is the identity on every preset."""
    for path in PRESETS:
        cfg = Config.from_json(str(path))
        out = tmp_path / path.name
        out.write_text(__import__("json").dumps(cfg.to_dict()))
        again = Config.from_json(str(out))
        assert again.to_dict() == cfg.to_dict(), path.stem


def test_data_volume_size_top_resolution():
    """Eval/infer datasets must be built at the TOP resolution a family
    trains against — the cascade's stage-2/3 metrics were previously
    computed against up-resized 64³ targets via `hvc eval` (r5 fix; one
    definition now shared by Trainer._build_data and the CLI surfaces)."""
    from hybrid_vit_cascade_tpu.config import data_volume_size

    cfg = Config()
    cfg.model.family = "cascade"
    cfg.model.volume_size = (64, 64, 64)
    assert data_volume_size(cfg) == (256, 256, 256)
    cfg.model.stage_sizes = (32, 64, 128)
    assert data_volume_size(cfg) == (128, 128, 128)
    cfg.model.family = "direct128_h200"
    assert data_volume_size(cfg) == (128, 128, 128)
    cfg.model.family = "direct256_b200"
    assert data_volume_size(cfg) == (256, 256, 256)
    cfg.model.family = "direct_vit"
    assert data_volume_size(cfg) == (64, 64, 64)

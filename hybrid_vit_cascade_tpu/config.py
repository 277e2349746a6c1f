"""One typed configuration (L6) with JSON round-trip.

Replaces the reference's config soup — two JSON shapes (config_direct.json,
config_progressive.json) plus per-script argparse flags and in-code mutations
(SURVEY.md §5 'Config / flag system') — with a single dataclass tree. JSON
files matching either reference layout load through `Config.from_json`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional, Tuple

MODEL_FAMILIES = (
    "direct_vit",       # DirectCTRegression (model_direct.py)
    "cascade",          # ProgressiveCascadeModel (model_progressive.py)
    "direct128_h200",   # Direct128ModelH200
    "direct256_h200",   # Direct256ModelH200
    "direct256_b200",   # Direct256ModelB200
    "diffusion",        # UnifiedHybridViTCascade (unified_model.py)
)


@dataclass
class ModelConfig:
    family: str = "direct_vit"
    volume_size: Tuple[int, int, int] = (64, 64, 64)
    xray_img_size: int = 512
    voxel_dim: int = 256
    vit_depth: int = 4
    num_heads: int = 4
    xray_feature_dim: int = 512
    # cascade per-stage ViT depths/heads; H200 preset = (4,8,12)/(16,16,16)+voxel_dim 512
    stage_depths: Tuple[int, int, int] = (4, 6, 8)
    stage_heads: Tuple[int, int, int] = (4, 8, 8)
    stage_sizes: Tuple[int, int, int] = (64, 128, 256)
    use_gradient_checkpointing: bool = True
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    attn_impl: str = "auto"  # "auto" | "flash" | "xla"
    # depth-slab streaming of the stage-3 256³ conv branches (ops/slab.py):
    # required to TRAIN stage 3 on a 16 GB chip; parameters are identical to
    # the dense path so checkpoints interchange freely
    stage3_slab_scan: bool = False
    slab_count: int = 8
    # 'streamed' (endpoint-storing, ~2.4× faster at 256³) | 'recompute'
    # (zero-storage fallback); identical numerics and parameters
    slab_impl: str = "streamed"
    # stage-3 remat granularity: 'block' (minimum memory) | 'mlp' (faster —
    # attention kernels are not re-run in the backward; ~1.5 GB extra HBM)
    remat_mode: str = "block"
    # diffusion family: >1 streams each stage's depth-lifter fusion in this
    # many depth slabs (never materializes the GB-scale lift intermediates
    # at full depth — unlocks batch ≥2 at the 128³ ladder stage)
    diffusion_lift_slabs: int = 0


@dataclass
class StageConfig:
    num_epochs: int = 50
    batch_size: int = 8
    learning_rate: float = 1e-4
    target_resolution: Tuple[int, int, int] = (64, 64, 64)


@dataclass
class TrainingConfig:
    weight_decay: float = 0.01
    gradient_clip: float = 1.0
    seed: int = 0
    diffusion_sample_steps: int = 20  # DDIM eval steps for the diffusion family
    # diffusion family: train the full progressive ladder with prev-stage
    # chaining + cascaded DDIM eval (fit_diffusion_cascade) instead of the
    # single top stage
    diffusion_progressive: bool = False
    # diffusion ladder: freeze the shared xray_encoder + time-MLP after
    # stage 1 — the diffusion analog of freeze_shared_encoder_stage3 (earlier
    # stages' samplers otherwise run under whatever encoder the last stage
    # left behind, the shared-module-shift mechanism of the r3 cascade
    # collapse)
    freeze_shared_diffusion: bool = False
    # cascade: freeze the SHARED xray_encoder during stage-3 training. The
    # reference trains it through stage 3 (train_progressive_1gpu.py:229-250
    # freezes only stage modules), which silently degrades the frozen
    # stage-2's intermediate output (its encoder shifts under it) and breaks
    # max_stage=2 early-exit serving (model_progressive.py:368-402). With
    # True, stage-2 serving stays at its trained quality (documented
    # deviation; see docs/ROUND_NOTES.md round-4 experiment).
    freeze_shared_encoder_stage3: bool = False
    # cascade stage-3: split the train step into (frozen stage-1/2 forward)
    # + (stage-3 fwd/bwd on the precomputed 128³ volume). EXACT only under
    # freeze_shared_encoder_stage3 (vol128 must be constant w.r.t. trainable
    # params — validated in Trainer.fit_cascade). Shrinks the stage-3
    # compiled program: the round-3 b2-at-256³ compile-OOM lever.
    stage3_split_step: bool = False
    num_epochs: int = 100          # single-model families
    batch_size: int = 8
    learning_rate: float = 1e-4
    warmup_steps: int = 0
    # observability / numerics (SURVEY.md §5): jax.profiler trace dir and
    # the TPU analog of the reference's NaN guards
    profile_dir: str = ""          # non-empty: write a TensorBoard trace of epoch 0
    debug_nans: bool = False       # jax_debug_nans (reference: NaN-batch skipping)
    use_wandb: bool = False        # optional wandb metric logging (no-op if absent)
    # epoch-end feature/attention/prediction visualization every N epochs
    # (0 = off; reference visualize_epoch_features, utils/visualization.py:324-472)
    viz_every: int = 0
    stages: Dict[str, StageConfig] = field(
        default_factory=lambda: {
            "stage1": StageConfig(50, 8, 1e-4, (64, 64, 64)),
            "stage2": StageConfig(30, 2, 5e-5, (128, 128, 128)),
            "stage3": StageConfig(20, 2, 2e-5, (256, 256, 256)),
        }
    )


@dataclass
class LossConfig:
    # per-stage weights (config_progressive.json "loss" block)
    stage1: Dict[str, float] = field(default_factory=lambda: {"l1": 1.0, "ssim": 0.5})
    stage2: Dict[str, float] = field(
        default_factory=lambda: {"l1": 1.0, "ssim": 0.5, "vgg": 0.1, "tv": 0.02, "freq": 0.05}
    )
    stage3: Dict[str, float] = field(
        default_factory=lambda: {"l1": 1.0, "ssim": 0.5, "vgg": 0.1, "tv": 0.03, "freq": 0.07, "drr": 0.3}
    )
    # path to a converted ImageNet VGG16 .npz (scripts/convert_vgg16.py);
    # None → fixed-seed random frozen filters (documented deviation)
    vgg_weights: Optional[str] = None


@dataclass
class DataConfig:
    dataset_path: str = ""
    synthetic: bool = False          # use the phantom dataset (no files needed)
    synthetic_patients: int = 16
    max_patients: Optional[int] = None
    train_split: float = 0.8
    val_split: float = 0.1
    # 'seeded_random' (utils/dataset.py:393-428) or 'sorted_fraction' (the
    # simple dataset's deterministic sorted-dir slicing, dataset_simple.py:62-73)
    split_mode: str = "seeded_random"
    normalization: str = "soft_tissue"
    xray_size: int = 512
    augmentation: bool = False
    cache_in_memory: bool = False
    num_prefetch: int = 2


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    save_every: int = 10
    keep_best: Tuple[str, ...] = ("loss", "psnr", "ssim")  # triple best-checkpoints


@dataclass
class ParallelConfig:
    data_axis: int = -1   # -1: all local devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    checkpoints: CheckpointConfig = field(default_factory=CheckpointConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    # --- JSON round-trip --------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path: str) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2, default=list))

    @staticmethod
    def from_dict(d: dict) -> "Config":
        def build(cls, src: dict):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in src:
                    continue
                v = src[f.name]
                if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
                    v = build(f.type, v)
                elif isinstance(v, list) and isinstance(getattr(cls(), f.name, None), tuple):
                    # JSON has no tuples: normalize list-valued sequence
                    # fields to the dataclass default's tuple type so
                    # from_dict(to_dict(cfg)) round-trips exactly
                    v = tuple(v)
                kwargs[f.name] = v
            return cls(**kwargs)

        cfg = Config(
            model=build(ModelConfig, d.get("model", {})),
            training=_build_training(d.get("training", {})),
            loss=build(LossConfig, d.get("loss", {})),
            data=build(DataConfig, d.get("data", {})),
            checkpoints=build(CheckpointConfig, d.get("checkpoints", {})),
            parallel=build(ParallelConfig, d.get("parallel", {})),
        )
        # tolerate reference-style flat fields
        if "model_name" in d and "progressive" in str(d.get("model_name", "")):
            cfg.model.family = "cascade"
        for key in ("volume_size",):
            if key in d.get("model", {}):
                cfg.model.volume_size = tuple(d["model"][key])
        return cfg

    @staticmethod
    def from_json(path: str) -> "Config":
        return Config.from_dict(json.loads(Path(path).read_text()))


def _build_training(src: dict) -> TrainingConfig:
    t = TrainingConfig()
    for f in dataclasses.fields(TrainingConfig):
        if f.name in src and f.name != "stages":
            setattr(t, f.name, src[f.name])
    stages = {}
    for name, sv in src.get("stages", {}).items():
        stages[name] = StageConfig(
            num_epochs=sv.get("num_epochs", 50),
            batch_size=sv.get("batch_size", 8),
            learning_rate=sv.get("learning_rate", 1e-4),
            target_resolution=tuple(sv.get("target_resolution", (64, 64, 64))),
        )
    # reference config_progressive.json puts stage blocks directly in "training"
    for name in ("stage1", "stage2", "stage3"):
        if name in src and isinstance(src[name], dict):
            sv = src[name]
            stages[name] = StageConfig(
                num_epochs=sv.get("num_epochs", 50),
                batch_size=sv.get("batch_size", 8),
                learning_rate=sv.get("learning_rate", 1e-4),
                target_resolution=tuple(sv.get("target_resolution", (64, 64, 64))),
            )
    if stages:
        t.stages = stages
    return t


def validate_config(cfg: Config) -> None:
    """Schema/consistency checks (ref: progressive_cascade/utils.py:230-254)."""
    if cfg.model.family not in MODEL_FAMILIES:
        raise ValueError(f"unknown model family {cfg.model.family!r}; expected one of {MODEL_FAMILIES}")
    if cfg.model.dtype not in ("float32", "bfloat16"):
        raise ValueError(f"dtype must be float32|bfloat16, got {cfg.model.dtype}")
    if cfg.model.slab_impl not in ("streamed", "recompute"):
        raise ValueError(f"slab_impl must be streamed|recompute, got {cfg.model.slab_impl}")
    if cfg.model.remat_mode not in ("block", "mlp"):
        raise ValueError(f"remat_mode must be block|mlp, got {cfg.model.remat_mode}")
    if cfg.model.family == "cascade":
        for name in ("stage1", "stage2", "stage3"):
            if name not in cfg.training.stages:
                raise ValueError(f"cascade training requires stages stage1..3; missing {name}")
    if not cfg.data.synthetic and not cfg.data.dataset_path:
        raise ValueError("data.dataset_path required unless data.synthetic=true")


def data_volume_size(cfg: Config) -> Tuple[int, int, int]:
    """Dataset target volume size for a config: the TOP resolution any part
    of the model trains/evals against. The cascade refines up to
    stage_sizes[-1] and the direct128/256 families name theirs, so eval
    targets must carry real high-resolution detail — evaluating stage 2/3
    against up-resized 64³ volumes (what model.volume_size alone implies for
    the cascade) silently inflates their metrics. One definition shared by
    the trainer's dataset construction and the CLI eval/infer/diagnose
    surfaces (ref: the trainer/eval resolution contract in
    train_progressive_1gpu.py:267-304 vs inference_progressive.py:66-91)."""
    m = cfg.model
    if m.family == "cascade":
        top = max(m.stage_sizes)
        return (top, top, top)
    if m.family.startswith("direct128"):
        return (128, 128, 128)
    if m.family.startswith("direct256"):
        return (256, 256, 256)
    return tuple(m.volume_size)

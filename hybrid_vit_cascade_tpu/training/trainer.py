"""Trainer: jit-compiled data-parallel steps + the reference's training
surface (stagewise cascade training with freezing, periodic/best
checkpoints, resume with LR override, CSV/JSONL logs).

Replaces all eleven reference training scripts (SURVEY.md §2.5) with one
engine parameterized by Config. Parallelism: parameters are replicated and
batches sharded over the mesh's 'data' axis; XLA inserts the gradient
all-reduce (the reference's DDP/NCCL ring) over ICI automatically.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config, validate_config
from ..data import DataLoader, PatientDRRDataset, SyntheticCTDataset, create_train_val_datasets, shard_batch
from ..losses import Direct256Loss, MultiScaleLoss, psnr, ssim_metric
from ..losses.multiscale import l1_loss
from ..models import (
    Direct128ModelH200,
    Direct256ModelB200,
    Direct256ModelH200,
    DirectCTRegression,
    ProgressiveCascadeModel,
)
from ..ops.resize import resize_trilinear
from ..parallel import data_sharding, make_mesh, replicated_sharding
from ..utils import CSVLogger, JSONLLogger
from .checkpoint import CheckpointManager
from .schedules import make_optimizer


def _arrays_only(batch: Dict) -> Dict:
    """Drop non-array entries (patient ids, flags) before entering jit."""
    return {k: v for k, v in batch.items() if isinstance(v, (jax.Array, np.ndarray))}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def build_model(cfg: Config):
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32
    if m.family == "direct_vit":
        return DirectCTRegression(
            volume_size=tuple(m.volume_size), voxel_dim=m.voxel_dim, vit_depth=m.vit_depth,
            num_heads=m.num_heads, xray_feature_dim=m.xray_feature_dim, dtype=dtype, attn_impl=m.attn_impl,
        )
    if m.family == "cascade":
        return ProgressiveCascadeModel(
            xray_feature_dim=m.xray_feature_dim, voxel_dim=m.voxel_dim, dtype=dtype, attn_impl=m.attn_impl,
            stage_depths=tuple(m.stage_depths), stage_heads=tuple(m.stage_heads),
            stage_sizes=tuple(m.stage_sizes),
            use_gradient_checkpointing=m.use_gradient_checkpointing,
            stage3_slab_scan=m.stage3_slab_scan, slab_count=m.slab_count,
            slab_impl=m.slab_impl, remat_mode=m.remat_mode,
        )
    if m.family == "direct128_h200":
        return Direct128ModelH200(xray_feature_dim=m.xray_feature_dim, dtype=dtype,
                                  remat=m.use_gradient_checkpointing)
    if m.family == "direct256_h200":
        return Direct256ModelH200(xray_feature_dim=m.xray_feature_dim, dtype=dtype,
                                  remat=m.use_gradient_checkpointing)
    if m.family == "direct256_b200":
        return Direct256ModelB200(dtype=dtype, remat=m.use_gradient_checkpointing)
    if m.family == "diffusion":
        from ..models import UnifiedHybridViTCascade

        return UnifiedHybridViTCascade(
            stage_configs=diffusion_stage_configs(m), xray_embed_dim=m.xray_feature_dim, dtype=dtype,
            attn_impl=m.attn_impl, remat=m.use_gradient_checkpointing,
            lift_slabs=m.diffusion_lift_slabs,
        )
    raise ValueError(f"unsupported family for Trainer: {m.family}")


def diffusion_stage_configs(m) -> tuple:
    """Default diffusion stage ladder (unified_model.py __main__:471-490),
    truncated to the configured volume size."""
    ladder = [
        dict(name="stage1_low", volume_size=(64, 64, 64), voxel_dim=m.voxel_dim,
             vit_depth=4, num_heads=4, use_depth_lifting=True, use_physics_loss=True),
        dict(name="stage2_mid", volume_size=(128, 128, 128), voxel_dim=m.voxel_dim,
             vit_depth=6, num_heads=8, use_depth_lifting=True, use_physics_loss=True),
        dict(name="stage3_high", volume_size=(256, 256, 256), voxel_dim=m.voxel_dim,
             vit_depth=8, num_heads=8, use_depth_lifting=True, use_physics_loss=True),
    ]
    top = max(m.volume_size)
    if top < 64:  # scaled-down configs (tests): single stage at the given size
        return (
            dict(name="stage1_low", volume_size=tuple(m.volume_size), voxel_dim=m.voxel_dim,
                 vit_depth=m.vit_depth, num_heads=m.num_heads, use_depth_lifting=True,
                 use_physics_loss=True),
        )
    return tuple(c for c in ladder if max(c["volume_size"]) <= top)


def _merge_stats(old, new):
    """Merge a (possibly partial) batch_stats update over the full old tree —
    modules skipped this step (e.g. stages 1-2 under the split stage-3 step)
    keep their previous running stats."""
    if isinstance(old, dict):
        return {k: (_merge_stats(v, new[k]) if isinstance(new, dict) and k in new else v)
                for k, v in old.items()}
    return new if new is not None else old


def make_train_step(model, loss_fn: Callable, model_kwargs: Optional[Dict] = None,
                    extra_inputs: Optional[Dict[str, str]] = None,
                    freeze_stats_prefixes: Optional[Tuple[str, ...]] = None):
    """loss_fn(pred, batch) -> dict with 'total_loss'. Returns a jitted
    (state, batch, rng) -> (state, metrics) step.

    extra_inputs: {model_kwarg: batch_key} — feed a (traced) batch entry as a
    model kwarg, e.g. the split stage-3 step's precomputed stage2_volume.
    freeze_stats_prefixes: top-level batch_stats subtrees to pin (no BN
    running-stat drift — the freeze_shared_encoder_stage3 arm freezes the
    shared encoder's stats too, otherwise the frozen stage-2 still shifts
    under drifting normalization)."""
    mkw = dict(model_kwargs or {})

    def apply_loss(params, batch_stats, batch, rng):
        variables = {"params": params}
        # mutable must be False (not []) for BN-free models: flax's apply
        # returns an (out, vars) tuple for ANY list-valued mutable, empty
        # included — the empty list used to leak that tuple into loss_fn as
        # `pred` for the CNN families (GroupNorm-only, no batch_stats)
        mutable = False
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        kw = dict(mkw)
        if extra_inputs:
            for kwname, bkey in extra_inputs.items():
                kw[kwname] = batch[bkey]
        out = model.apply(
            variables, batch["drr_stacked"], train=True,
            mutable=mutable, rngs={"dropout": rng}, **kw,
        )
        pred, updates = out if mutable else (out, {})
        new_bs = batch_stats
        if mutable and "batch_stats" in updates:
            new_bs = _merge_stats(batch_stats, updates["batch_stats"])
            if freeze_stats_prefixes:
                new_bs = {k: (batch_stats[k] if any(k.startswith(p) for p in freeze_stats_prefixes)
                              else v) for k, v in new_bs.items()}
        ld = loss_fn(pred, batch)
        return ld["total_loss"].astype(jnp.float32), (ld, new_bs)

    # donate the state: without it the old and updated params/opt-state
    # coexist (~2x params+adam HBM), which matters at the 256³ stages
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, (metrics, new_bs)), grads = jax.value_and_grad(apply_loss, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        state = state.apply_gradients(grads)
        if new_bs is not None:
            state = state.replace(batch_stats=new_bs)
        return state, metrics

    return step


def make_eval_step(model, target_fn: Callable, model_kwargs: Optional[Dict] = None):
    mkw = dict(model_kwargs or {})

    @jax.jit
    def step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        pred = model.apply(variables, batch["drr_stacked"], train=False, **mkw)
        target = target_fn(batch)
        return {
            "loss": l1_loss(pred, target),
            "psnr": psnr(pred, target),
            "ssim": ssim_metric(pred, target),
        }

    return step


def resize_target(batch_volume: jnp.ndarray, resolution: Tuple[int, int, int]) -> jnp.ndarray:
    """Resize the full-res CT target to a stage resolution
    (align_corners=False, matching the reference trainers)."""
    if tuple(batch_volume.shape[-3:]) == tuple(resolution):
        return batch_volume
    return resize_trilinear(batch_volume, resolution, align_corners=False)


def host_target_transform(resolution: Tuple[int, int, int], cache: bool = False):
    """DataLoader batch map: pre-resize the CT target to the stage resolution
    on the HOST (same interpolation matrices as the device `resize_target`,
    which then short-circuits). Without this, a 64³ stage-1 step ships the
    full 256³ float32 volume over the host↔device link every step — measured
    ~110 s/epoch vs ~50 s with the pre-resize (and ~25 s with `cache`) on the
    tunneled single-chip setup. Runs in the loader's prefetch thread,
    overlapping device compute.

    `cache=True` memoizes the per-patient resized target — only valid
    when targets are epoch-invariant, i.e. augmentation is off.

    The resample runs in the native threaded C++ core when the .so is
    available (native/nifti_io.cpp `resample_trilinear_f32`: ~9 ms for
    256³→64³ vs ~0.6 s single-threaded numpy, fp32-identical to ~2e-7),
    falling back to the numpy matrices otherwise."""
    from ..data import native_io
    from ..ops.resize import resize_trilinear_np

    res = tuple(resolution)
    memo: Optional[Dict] = {} if cache else None

    def resize_one(vol: np.ndarray) -> np.ndarray:
        """(..., D, H, W) → (..., *res); leading dims flattened for the
        native per-volume entry point."""
        lead = vol.shape[:-3]
        flat = vol.reshape((-1,) + vol.shape[-3:]).astype(np.float32, copy=False)
        out = []
        for v3 in flat:
            r = native_io.resample_trilinear(v3, res, align_corners=False) \
                if native_io.available() else None
            out.append(r if r is not None
                       else resize_trilinear_np(v3, res, align_corners=False))
        return np.stack(out).reshape(lead + res)

    def tf(batch):
        v = batch.get("ct_volume")
        if not (isinstance(v, np.ndarray) and tuple(v.shape[-3:]) != res):
            return batch
        batch = dict(batch)
        pids = batch.get("patient_id")
        if memo is not None and pids is not None:
            out = []
            for i, pid in enumerate(pids):
                if pid not in memo:
                    memo[pid] = resize_one(v[i])
                out.append(memo[pid])
            batch["ct_volume"] = np.stack(out)
        else:
            batch["ct_volume"] = resize_one(v)
        return batch

    return tf


@dataclass
class EpochResult:
    train_loss: float
    val: Dict[str, float]
    seconds: float
    samples_per_sec: float


class Trainer:
    """End-to-end training engine. `Trainer(cfg).fit()`"""

    def __init__(self, cfg: Config, mesh=None):
        validate_config(cfg)
        self.cfg = cfg
        from ..utils import setup_compile_cache

        setup_compile_cache()  # 256³ stage programs: ~10 min cold, s when cached
        if cfg.training.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if cfg.training.use_wandb:
            from ..utils import wandb_compat

            wandb_compat.init(config=cfg.to_dict())
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = build_model(cfg)
        self.ckpt = CheckpointManager(cfg.checkpoints.save_dir, cfg.checkpoints.save_every,
                                      cfg.checkpoints.keep_best)
        self.csv = CSVLogger(f"{cfg.checkpoints.save_dir}/training_log.csv")
        self.jsonl = JSONLLogger(f"{cfg.checkpoints.save_dir}/training_log.jsonl")
        self._build_data()

    # --- data -------------------------------------------------------------
    def _build_data(self):
        from ..config import data_volume_size

        d = self.cfg.data
        target_size = data_volume_size(self.cfg)
        if d.synthetic:
            ds = SyntheticCTDataset(
                num_patients=d.synthetic_patients, volume_size=target_size, xray_size=d.xray_size,
            )
        else:
            ds = PatientDRRDataset(
                d.dataset_path, target_xray_size=d.xray_size, target_volume_size=target_size,
                normalization=d.normalization, augmentation=d.augmentation,
                cache_in_memory=d.cache_in_memory, max_patients=d.max_patients,
            )
        self.train_ds, self.val_ds, self.test_ds = create_train_val_datasets(
            ds, d.train_split, d.val_split, seed=42, split_mode=d.split_mode
        )
        if len(self.val_ds) == 0:  # tiny datasets: validate on train
            self.val_ds = self.train_ds

    def _mesh_for_batch(self, batch_size: int):
        """Largest data-axis size that divides the batch. DP requires the
        global batch to split evenly; replicating the batch instead triggers
        pathological GSPMD compiles, so surplus devices sit idle (exactly the
        reference's behavior when batch < world_size)."""
        import math

        n = self.mesh.shape["data"]
        k = math.gcd(batch_size, n)
        if k == n:
            return self.mesh
        print(f"[trainer] batch {batch_size} % {n} devices != 0 -> using {k} "
              f"devices, {n - k} idle (raise batch or drop device count to avoid)")
        return make_mesh(data=k, model=1, devices=jax.devices()[:k])

    # --- init -------------------------------------------------------------
    def init_variables(self, rng=None, **model_kwargs):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        item = self.train_ds[0]
        xr = jnp.zeros((1, *item["drr_stacked"].shape), jnp.float32)
        # init under jit: eager per-op dispatch is pathologically slow on
        # multi-(virtual-)device backends
        init_fn = jax.jit(lambda r, x: self.model.init(r, x, **model_kwargs))
        return init_fn(rng, xr)

    def _make_state(self, variables, tx, mesh=None) -> TrainState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        repl = replicated_sharding(mesh if mesh is not None else self.mesh)
        params = jax.device_put(params, repl)
        batch_stats = jax.device_put(batch_stats, repl)
        # step is device_put like everything else: checkpoint restore places
        # arrays per the template's sharding, and a mix of committed
        # single-device and mesh-replicated arrays breaks the jitted step
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), repl), params=params,
            batch_stats=batch_stats,
            opt_state=jax.device_put(tx.init(params), repl), tx=tx,
        )

    # --- single-model families -------------------------------------------
    def fit(self, epochs: Optional[int] = None, lr_override: Optional[float] = None,
            resume: bool = True, progress: bool = True) -> Dict[str, float]:
        fam = self.cfg.model.family
        if fam == "cascade":
            return self.fit_cascade(resume=resume)
        if fam == "diffusion":
            if self.cfg.training.diffusion_progressive:
                return self.fit_diffusion_cascade(resume=resume, progress=progress)
            return self.fit_diffusion(epochs=epochs, progress=progress)
        t = self.cfg.training
        epochs = epochs if epochs is not None else t.num_epochs
        lr = lr_override if lr_override is not None else t.learning_rate
        steps_per_epoch = max(1, len(self.train_ds) // t.batch_size)
        tx = make_optimizer(lr, steps_per_epoch * epochs, t.weight_decay, t.gradient_clip, t.warmup_steps)

        variables = self.init_variables()
        mesh = self._mesh_for_batch(t.batch_size)
        state = self._make_state(variables, tx, mesh)
        start_epoch = 0
        if resume:
            state, start_epoch = self._restore_state(self.ckpt, state)

        if fam == "direct_vit":
            loss_obj = MultiScaleLoss({"stage1": self.cfg.loss.stage1},
                                      vgg_weights=self.cfg.loss.vgg_weights)
            loss_fn = lambda pred, batch: loss_obj(pred, batch["ct_volume"], stage=1)
        else:
            d256 = Direct256Loss()
            loss_fn = lambda pred, batch: d256(pred, batch["ct_volume"])

        train_step = make_train_step(self.model, loss_fn)
        eval_step = make_eval_step(self.model, lambda b: b["ct_volume"])
        return self._run_epochs(state, train_step, eval_step, t.batch_size, start_epoch, epochs, lr,
                                progress, mesh=mesh, viz_kwargs={})

    def _restore_state(self, ckpt: CheckpointManager, state: TrainState) -> Tuple[TrainState, int]:
        """Restore params/batch_stats (+ optimizer state and step when the
        checkpoint carries them) from `latest`. Returns (state, start_epoch);
        (state, 0) untouched when nothing is saved yet."""
        restored = ckpt.restore_latest({"params": state.params, "batch_stats": state.batch_stats})
        if restored is None:
            return state, 0
        tree, meta = restored
        state = state.replace(params=tree["params"], batch_stats=tree["batch_stats"])
        opt = ckpt.restore_opt({"opt_state": state.opt_state, "step": state.step})
        if opt is not None:
            state = state.replace(opt_state=opt["opt_state"], step=opt["step"])
        return state, int(meta.get("epoch", -1)) + 1

    # --- diffusion family -------------------------------------------------
    def _diffusion_steps(self, stage_cfgs, stage_idx: int, variables_template=None):
        """Build the jitted (train_step, eval_step) pair for one diffusion
        stage. Refiner stages (idx > 0) are conditioned on the GROUND-TRUTH
        volume downsampled to the previous stage's resolution — the
        progressive chaining of unified_model.py:261-392 that no reference
        script ever drove (its fit never fed prev_stage_volume)."""
        model = self.model
        cfg_stage = stage_cfgs[stage_idx]
        stage = cfg_stage["name"]
        resolution = tuple(cfg_stage["volume_size"])
        prev_res = tuple(stage_cfgs[stage_idx - 1]["volume_size"]) if stage_idx > 0 else None

        def prev_of(batch):
            if prev_res is None:
                return None
            return resize_target(batch["ct_volume"], prev_res)

        # donated state: old+new params/opt-state must not coexist at the
        # 256³ ladder top (same reasoning as make_train_step)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            d_rng, t_rng = jax.random.split(rng)

            def apply_loss(params, batch_stats):
                x_start = resize_target(batch["ct_volume"], resolution)
                vs = {"params": params}
                mutable = []
                if batch_stats:
                    vs["batch_stats"] = batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(vs, x_start, batch["drr_stacked"], stage, t_rng,
                                  prev_stage_volume=prev_of(batch),
                                  train=True, mutable=mutable, rngs={"dropout": d_rng})
                ld, updates = out if mutable else (out, {})
                return ld["loss"], (ld, updates.get("batch_stats", batch_stats))

            (_, (ld, new_bs)), grads = jax.value_and_grad(apply_loss, has_aux=True)(
                state.params, state.batch_stats
            )
            state = state.apply_gradients(grads)
            if new_bs is not None:
                state = state.replace(batch_stats=new_bs)
            return state, ld

        sample_steps = self.cfg.training.diffusion_sample_steps

        @jax.jit
        def eval_step(params, batch_stats, batch):
            from ..models.diffusion import ddim_sample

            vs = {"params": params}
            if batch_stats:
                vs["batch_stats"] = batch_stats
            target = resize_target(batch["ct_volume"], resolution)
            prev = prev_of(batch)
            ld = model.apply(vs, target, batch["drr_stacked"], stage,
                             jax.random.PRNGKey(0), prev_stage_volume=prev, train=False)
            # real reconstruction metrics via the DDIM sampler (the reference
            # has no sampler — its diffusion quality was unmeasurable);
            # teacher-forced prev conditioning isolates this stage's quality
            recon = ddim_sample(model, vs, batch["drr_stacked"], stage,
                                jax.random.PRNGKey(1), resolution, num_steps=sample_steps,
                                prev_stage_volume=prev)
            return {"loss": ld["loss"], "psnr": psnr(recon, target),
                    "ssim": ssim_metric(recon, target)}

        def renamed_step(state, batch, rng):
            state, ld = train_step(state, batch, rng)
            return state, {"total_loss": ld["loss"], **ld}

        return renamed_step, eval_step, resolution

    def _init_diffusion_stage(self, stage_cfgs, stage_idx: int, rng):
        """jit-init one diffusion stage's variables (with a zero prev volume
        for refiner stages, so prev_proj/fusion params materialize)."""
        cfg_stage = stage_cfgs[stage_idx]
        resolution = tuple(cfg_stage["volume_size"])
        item = self.train_ds[0]
        x0 = jnp.zeros((1, 1, *resolution), jnp.float32)
        xr = jnp.zeros((1, *item["drr_stacked"].shape), jnp.float32)
        prev = (jnp.zeros((1, 1, *stage_cfgs[stage_idx - 1]["volume_size"]), jnp.float32)
                if stage_idx > 0 else None)
        init_fn = jax.jit(lambda r, a, b, p: self.model.init(
            r, a, b, cfg_stage["name"], r, prev_stage_volume=p))
        return init_fn(rng, x0, xr, prev)

    def fit_diffusion(self, stage_name: Optional[str] = None, epochs: Optional[int] = None,
                      progress: bool = True) -> Dict[str, float]:
        """Train one diffusion stage. Refiner stages are conditioned on the
        GT-downsampled previous-stage volume (see _diffusion_steps); use
        fit_diffusion_cascade for the full progressive schedule."""
        t = self.cfg.training
        epochs = epochs if epochs is not None else t.num_epochs
        stages = diffusion_stage_configs(self.cfg.model)
        idx = len(stages) - 1 if stage_name is None else \
            [s["name"] for s in stages].index(stage_name)
        variables = self._init_diffusion_stage(stages, idx, jax.random.PRNGKey(t.seed))
        steps_per_epoch = max(1, len(self.train_ds) // t.batch_size)
        tx = make_optimizer(t.learning_rate, steps_per_epoch * epochs, t.weight_decay, t.gradient_clip)
        mesh = self._mesh_for_batch(t.batch_size)
        state = self._make_state(variables, tx, mesh)
        train_step, eval_step, resolution = self._diffusion_steps(stages, idx)
        return self._run_epochs(state, train_step, eval_step, t.batch_size, 0, epochs,
                                t.learning_rate, progress, phase=f"diffusion_{stages[idx]['name']}",
                                mesh=mesh, target_resolution=resolution)

    def fit_diffusion_cascade(self, stage_configs=None, resume: bool = True,
                              progress: bool = True, chain_eval: bool = True) -> Dict[str, float]:
        """Progressive diffusion training 64³→128³→256³ with prev-stage
        chaining (unified_model.py:261-392 + the stagewise schedule of the
        cascade family), then a fully-GENERATED cascaded DDIM evaluation
        (stage N sampled conditioned on stage N-1's sample, not GT).

        Per-stage epochs/batch/LR come from training.stages['stageN'] (by
        ladder position). Each stage trains its own subtree + the shared
        encoder/time-MLP; completed stages freeze (reference freeze_stage
        semantics). Checkpoints land in save_dir/diffusion_{name}/."""
        from ..models.diffusion import cascaded_ddim_sample

        t = self.cfg.training
        stages = list(stage_configs if stage_configs is not None
                      else diffusion_stage_configs(self.cfg.model))
        rng = jax.random.PRNGKey(t.seed)

        def merge(a, b):
            if isinstance(a, dict) and isinstance(b, dict):
                out = dict(a)
                for k, v in b.items():
                    out[k] = merge(a[k], v) if k in a else v
                return out
            return a  # identical shared leaves: keep the first init's value

        variables = None
        for i in range(len(stages)):
            vs = self._init_diffusion_stage(stages, i, rng)
            variables = vs if variables is None else merge(variables, vs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        last: Dict[str, float] = {}
        for i, sc_diff in enumerate(stages):
            name = sc_diff["name"]
            sc = t.stages.get(f"stage{i + 1}")
            epochs = sc.num_epochs if sc else t.num_epochs
            batch = sc.batch_size if sc else t.batch_size
            lr = sc.learning_rate if sc else t.learning_rate
            steps_per_epoch = max(1, len(self.train_ds) // batch)
            trainable = [f"stage_{name}", f"prev_proj_{name}", "xray_encoder",
                         "Dense_0", "Dense_1"]  # shared time-embedding MLP
            if i > 0 and t.freeze_shared_diffusion:
                # pin the shared encoder + time-MLP after stage 1: the same
                # shared-module-shift mechanism behind the cascade's r3
                # stage-2 collapse applies here (earlier stages' samplers run
                # under whatever encoder the LAST stage left behind) —
                # analogous to freeze_shared_encoder_stage3
                trainable = [f"stage_{name}", f"prev_proj_{name}"]
            tx = make_optimizer(lr, steps_per_epoch * epochs, t.weight_decay,
                                t.gradient_clip, trainable_prefixes=trainable, params=params)
            mesh = self._mesh_for_batch(batch)
            state = self._make_state({"params": params, "batch_stats": batch_stats}, tx, mesh)
            stage_ckpt = CheckpointManager(
                f"{self.cfg.checkpoints.save_dir}/diffusion_{name}", self.cfg.checkpoints.save_every
            )
            start_epoch = 0
            if resume:
                state, start_epoch = self._restore_state(stage_ckpt, state)
                if start_epoch >= epochs:
                    # best-val-PSNR params, not 'latest' — same reasoning as
                    # fit_cascade's stage transitions (a late-schedule decline
                    # would poison later stages' conditioning)
                    params, batch_stats = self._carry_best(
                        stage_ckpt, state.params, state.batch_stats)
                    meta = getattr(stage_ckpt, "_best", {})
                    last = {"loss": meta.get("loss", 0.0), "psnr": meta.get("psnr", 0.0),
                            "ssim": meta.get("ssim", 0.0)}
                    if progress:
                        print(f"[diffusion_{name}] complete at epoch {start_epoch - 1}; skipping")
                    continue
            train_step, eval_step, resolution = self._diffusion_steps(stages, i)
            last = self._run_epochs(state, train_step, eval_step, batch, start_epoch, epochs,
                                    lr, progress, phase=f"diffusion_{name}", ckpt=stage_ckpt,
                                    mesh=mesh, target_resolution=resolution)
            # carry the BEST-val-PSNR params into the next stage's conditioning
            # (mirrors fit_cascade._carry_best; the recorded r4 summary showed
            # stage-2 final 19.92 vs best 21.01 dB — a final-epoch carry would
            # hand later stages the declined params)
            params, batch_stats = self._carry_best(
                stage_ckpt, self._last_state.params, self._last_state.batch_stats)

        if chain_eval:
            # fully-generated cascaded sampling on one val batch: the honest
            # progressive-inference number (no GT leakage into conditioning)
            item = self.val_ds[0]
            xr = jnp.asarray(np.asarray(item["drr_stacked"])[None], jnp.float32)
            vs = {"params": params}
            if batch_stats:
                vs["batch_stats"] = batch_stats
            vols = jax.jit(
                lambda v, x: cascaded_ddim_sample(
                    self.model, v, x, jax.random.PRNGKey(7),
                    num_steps=t.diffusion_sample_steps,
                    stage_names=tuple(s["name"] for s in stages))
            )(vs, xr)
            gt = jnp.asarray(np.asarray(item["ct_volume"])[None], jnp.float32)
            for nm, vol in vols.items():
                tgt = resize_target(gt, vol.shape[-3:])
                last[f"chain_{nm}_psnr"] = float(psnr(vol, tgt))
                last[f"chain_{nm}_ssim"] = float(ssim_metric(vol, tgt))
            if jax.process_index() == 0:
                self.jsonl.log({"phase": "diffusion_chain_eval",
                                **{k: v for k, v in last.items() if k.startswith("chain_")}})
            if progress:
                chain = {k: round(v, 3) for k, v in last.items() if k.startswith("chain_")}
                print(f"[diffusion] cascaded DDIM eval: {chain}")
        return last

    # --- cascade stagewise -----------------------------------------------
    def fit_cascade(self, stages=("stage1", "stage2", "stage3"), resume: bool = True,
                    progress: bool = True) -> Dict[str, float]:
        """Stagewise cascade training with cross-run resume: each stage has
        its own checkpoint dir (save_dir/stageN); on resume, completed stages
        are skipped (their params restored from disk — the reference's
        filtered stage{N-1}_best load, train_progressive_1gpu.py:205-235) and
        an in-progress stage continues at its saved epoch with its optimizer
        state."""
        t = self.cfg.training
        variables = self.init_variables(max_stage=3)
        loss_obj = MultiScaleLoss({
            "stage1": self.cfg.loss.stage1, "stage2": self.cfg.loss.stage2, "stage3": self.cfg.loss.stage3,
        }, vgg_weights=self.cfg.loss.vgg_weights)
        last: Dict[str, float] = {}
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        for stage_name in stages:
            n = int(stage_name[-1])
            sc = t.stages[stage_name]
            steps_per_epoch = max(1, len(self.train_ds) // sc.batch_size)
            # Trainable = exactly the subtrees exercised at max_stage=n: this
            # stage plus (for the refiners) the shared cascade-level encoder.
            # Earlier stages are frozen (ref freeze_stage) and FUTURE stages
            # too — torch AdamW skips no-grad params, so the reference leaves
            # untouched stages bitwise intact; labeling them trainable here
            # would weight-decay them through exactly-zero grads.
            # freeze_shared_encoder_stage3: keep the shared encoder fixed in
            # stage 3 so the frozen stage-2 intermediate (which reads the same
            # encoder) is not degraded under it — see TrainingConfig.
            share_enc = n >= 2 and not (n == 3 and t.freeze_shared_encoder_stage3)
            trainable = [stage_name] + (["xray_encoder"] if share_enc else [])
            tx = make_optimizer(sc.learning_rate, steps_per_epoch * sc.num_epochs, t.weight_decay,
                                t.gradient_clip, trainable_prefixes=trainable, params=params)
            stage_mesh = self._mesh_for_batch(sc.batch_size)
            state = self._make_state({"params": params, "batch_stats": batch_stats}, tx, stage_mesh)

            start_epoch = 0
            stage_ckpt = CheckpointManager(
                f"{self.cfg.checkpoints.save_dir}/{stage_name}", self.cfg.checkpoints.save_every
            )
            if resume:
                state, start_epoch = self._restore_state(stage_ckpt, state)
                if start_epoch >= sc.num_epochs:  # stage already complete
                    params, batch_stats = self._carry_best(
                        stage_ckpt, state.params, state.batch_stats)
                    meta = getattr(stage_ckpt, "_best", {})
                    last = {"loss": meta.get("loss", 0.0), "psnr": meta.get("psnr", 0.0),
                            "ssim": meta.get("ssim", 0.0)}
                    if progress:
                        print(f"[{stage_name}] complete at epoch {start_epoch - 1}; skipping")
                    continue

            resolution = tuple(sc.target_resolution)

            def loss_fn(pred, batch, _n=n, _res=resolution):
                target = resize_target(batch["ct_volume"], _res)
                xr = batch["drr_stacked"] if _n == 3 else None
                return loss_obj(pred, target, stage=_n, input_xrays=xr)

            mkw = {"max_stage": n}
            freeze_enc3 = n == 3 and t.freeze_shared_encoder_stage3
            split3 = freeze_enc3 and t.stage3_split_step
            if t.stage3_split_step and n == 3 and not t.freeze_shared_encoder_stage3:
                raise ValueError(
                    "stage3_split_step requires freeze_shared_encoder_stage3: "
                    "with a trainable shared encoder the precomputed vol128 "
                    "would silently drop the encoder-through-stage-2 gradient")
            # Refine stages: prune the (fully frozen) stage-1 backward, as the
            # reference's requires_grad=False freeze does — see
            # ProgressiveCascadeModel.stop_grad_stage1.
            fs = ("xray_encoder",) if freeze_enc3 else None
            if split3:
                model = self.model

                @jax.jit
                def stage2_forward(params, batch_stats, batch, rng):
                    vs = {"params": params}
                    mutable = False
                    if batch_stats:
                        vs["batch_stats"] = batch_stats
                        mutable = ["batch_stats"]  # train-mode BN needs a
                        # writable collection; updates are DISCARDED (the
                        # freeze arm pins the prefix's running stats)
                    out = model.apply(vs, batch["drr_stacked"], train=True,
                                      max_stage=2, mutable=mutable,
                                      rngs={"dropout": rng})
                    return out[0] if mutable else out

                base_step = make_train_step(
                    self.model, loss_fn, {**mkw},
                    extra_inputs={"stage2_volume": "stage2_vol"},
                    freeze_stats_prefixes=fs)

                def train_step(state, batch, rng, _fwd=stage2_forward, _step=base_step):
                    pre_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), 17)
                    vol128 = _fwd(state.params, state.batch_stats, batch, pre_rng)
                    return _step(state, {**batch, "stage2_vol": vol128}, rng)
            else:
                train_step = make_train_step(
                    self.model, loss_fn, {**mkw, "stop_grad_stage1": n >= 2},
                    freeze_stats_prefixes=fs)
            eval_step = make_eval_step(self.model, lambda b, _res=resolution: resize_target(b["ct_volume"], _res), mkw)
            self.ckpt_stage = stage_ckpt
            last = self._run_epochs(
                state, train_step, eval_step, sc.batch_size, start_epoch, sc.num_epochs,
                sc.learning_rate, progress, phase=stage_name, ckpt=self.ckpt_stage, mesh=stage_mesh,
                target_resolution=resolution, viz_kwargs=dict(mkw),
            )
            # Carry the BEST-val-PSNR params to the next stage, not the final
            # epoch's — the reference's stage transition loads
            # stage{N-1}_best.pth (train_progressive_1gpu.py:205-235), and a
            # late-schedule decline (the freq term keeps trading PSNR for
            # spectrum match after the PSNR peak) would otherwise poison
            # every later stage's input.
            params, batch_stats = self._carry_best(
                stage_ckpt, self._last_state.params, self._last_state.batch_stats)
        return last

    def _carry_best(self, stage_ckpt: CheckpointManager, params, batch_stats):
        """Best-val-PSNR params of a finished stage (falls back to the given
        final-epoch values when no best_psnr checkpoint exists)."""
        if not (stage_ckpt.save_dir / "best_psnr").exists():
            return params, batch_stats
        tpl = {"params": params, "batch_stats": batch_stats}
        restored, meta = stage_ckpt.restore("best_psnr", dict(tpl))
        return restored["params"], restored["batch_stats"]

    # --- epoch loop -------------------------------------------------------
    def _run_epochs(self, state, train_step, eval_step, batch_size, start_epoch, epochs, lr,
                    progress, phase="train", ckpt=None, mesh=None,
                    target_resolution=None, viz_kwargs=None) -> Dict[str, float]:
        mesh = mesh if mesh is not None else self._mesh_for_batch(batch_size)
        ckpt = ckpt or self.ckpt
        d = self.cfg.data
        assert batch_size % mesh.shape["data"] == 0, (batch_size, mesh.shape)
        dsh = data_sharding(mesh)
        esh = replicated_sharding(mesh)
        tf = (host_target_transform(target_resolution, cache=not d.augmentation)
              if target_resolution else None)
        train_loader = DataLoader(self.train_ds, batch_size, shuffle=True, seed=self.cfg.training.seed,
                                  num_prefetch=d.num_prefetch, transform=tf)
        val_loader = DataLoader(self.val_ds, batch_size=min(batch_size, max(1, len(self.val_ds))),
                                shuffle=False, drop_last=False, num_prefetch=0, transform=tf)
        rng = jax.random.PRNGKey(self.cfg.training.seed + 1)
        metrics: Dict[str, float] = {}
        profile_dir = self.cfg.training.profile_dir
        # Enter the mesh context for the whole epoch loop so in-model
        # sharding constraints (token / D-axis sharding over a 'model' axis)
        # see the mesh when the steps trace.
        from contextlib import ExitStack

        _mesh_ctx = ExitStack()
        _mesh_ctx.enter_context(mesh)
        for epoch in range(start_epoch, epochs):
            if profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(profile_dir)
            train_loader.set_epoch(epoch)
            t0 = time.time()
            losses = []
            n_samples = 0
            for batch in train_loader:
                batch = _arrays_only(shard_batch(batch, dsh))
                state, m = train_step(state, batch, rng)
                losses.append(m["total_loss"])
                n_samples += batch["drr_stacked"].shape[0]
            if profile_dir and epoch == start_epoch:
                jax.profiler.stop_trace()
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            vals = []
            n_data = mesh.shape["data"]
            n_proc = jax.process_count()
            for batch in val_loader:
                # shard eval over the data axis when the GLOBAL batch (the
                # loader yields process-local shards) divides it — otherwise
                # every chip would redundantly compute the full eval batch.
                global_b = batch["drr_stacked"].shape[0] * n_proc
                if global_b % n_data == 0:
                    bsh = dsh
                elif n_proc == 1:
                    bsh = esh  # odd tail, single host: replicate (same data)
                else:
                    # multi-host ragged tail: a replicated sharding over
                    # per-process-DISTINCT loader shards would assemble an
                    # inconsistent array and desync per-process metrics (and
                    # then the collective checkpoint barriers); drop it.
                    if not getattr(self, "_warned_ragged_val", False):
                        self._warned_ragged_val = True
                        print(f"[trainer] dropping ragged multi-host val tail "
                              f"(global batch {global_b} % data axis {n_data} != 0); "
                              f"pad the val set or align batch sizes to eval every sample")
                    continue
                batch = _arrays_only(shard_batch(batch, bsh))
                vals.append(eval_step(state.params, state.batch_stats, batch))
            if not vals and len(self.val_ds) > 0 and not getattr(self, "_warned_empty_val", False):
                self._warned_empty_val = True
                print("[trainer] WARNING: every val batch was dropped (ragged multi-host "
                      "tails) — val metrics fall back to 0.0 and best-checkpoint "
                      "selection is degraded; align val size to the data axis")
            val = {k: float(jnp.mean(jnp.stack([v[k] for v in vals]))) for k in vals[0]} if vals else {}
            dt = time.time() - t0
            metrics = {"loss": val.get("loss", train_loss), "psnr": val.get("psnr", 0.0),
                       "ssim": val.get("ssim", 0.0)}
            ckpt.save({"params": state.params, "batch_stats": state.batch_stats}, epoch, metrics,
                      config=self.cfg.to_dict(),
                      opt={"opt_state": state.opt_state, "step": state.step})
            if jax.process_index() == 0:  # rank-0 logging (shared FS: every
                # process appending the same CSV/JSONL rows would race)
                self.csv.log(epoch=epoch, phase=phase, loss=f"{train_loss:.6f}",
                             psnr=f"{metrics['psnr']:.3f}", ssim=f"{metrics['ssim']:.4f}",
                             lr=lr, time=f"{dt:.1f}")
                self.jsonl.log({"epoch": epoch, "phase": phase, "train_loss": train_loss, **val,
                                "seconds": dt, "samples_per_sec": n_samples / max(dt, 1e-9)})
            if self.cfg.training.use_wandb and jax.process_index() == 0:
                from ..utils import wandb_compat

                wandb_compat.log({"phase": phase, "train_loss": train_loss, **val}, step=epoch)
            if progress:
                print(f"[{phase}] epoch {epoch}: loss={train_loss:.4f} "
                      f"val_psnr={metrics['psnr']:.2f} dB val_ssim={metrics['ssim']:.4f} ({dt:.1f}s)")
            ve = self.cfg.training.viz_every
            # process-0 only: every process writing the same PNG/JSONL paths
            # on a shared filesystem would race (and duplicate the capture
            # forward); viz is pure observation, so no collective is involved
            if ve and viz_kwargs is not None and jax.process_index() == 0 \
                    and ((epoch + 1) % ve == 0 or epoch == epochs - 1):
                try:
                    self._viz_epoch(state, epoch, phase, esh, viz_kwargs)
                except Exception as exc:  # viz must never kill a training run
                    print(f"[viz] epoch {epoch} visualization failed: {exc}")
        _mesh_ctx.close()
        self._last_state = state
        return metrics

    # --- epoch-end visualization -----------------------------------------
    def _viz_epoch(self, state, epoch: int, phase: str, esh, model_kwargs: Dict) -> None:
        """Epoch-end feature/attention/prediction visualization on one val
        sample (reference `visualize_epoch_features`,
        utils/visualization.py:324-472): writes to
        {save_dir}/viz/epoch_NNN/ —
          * per-stage prediction vs ground-truth mid-slice grids,
          * X-ray-encoder 2D feature-map channels (flax capture_intermediates
            replaces the reference's extract_feature_maps forward hooks),
          * stage-1 cross-attention salience (sown fp32 probability maps).
        Figures are wandb-logged as images when wandb is active. The capture
        forward is its own cached jit (compiled once per phase); viz runs on
        a batch of 1, replicated over the mesh."""
        from pathlib import Path

        from ..models.attention import collect_attention_maps
        from ..utils import viz as V
        from ..utils import wandb_compat

        out_dir = Path(self.cfg.checkpoints.save_dir) / "viz" / f"epoch_{epoch:03d}"
        out_dir.mkdir(parents=True, exist_ok=True)
        item = self.val_ds[0]
        params, batch_stats = state.params, state.batch_stats
        if jax.process_count() > 1:
            # only process 0 reaches here: a jit over the global mesh would
            # be a collective and hang, so run the capture forward on a
            # process-LOCAL device (params are replicated → fully addressable)
            local = jax.local_devices()[0]
            params = jax.device_put(jax.device_get(params), local)
            batch_stats = jax.device_put(jax.device_get(batch_stats), local)
            xrays = jax.device_put(np.asarray(item["drr_stacked"])[None], local)
        else:
            xrays = jax.device_put(np.asarray(item["drr_stacked"])[None], esh)
        gt = np.asarray(item["ct_volume"], np.float32)

        fns = getattr(self, "_viz_fns", None)
        if fns is None:
            fns = self._viz_fns = {}
        key = (phase, tuple(sorted(model_kwargs.items())))
        if key not in fns:
            viz_model = self.model
            if hasattr(viz_model, "store_attention"):
                viz_model = viz_model.clone(store_attention=True)
            mkw = dict(model_kwargs)
            if isinstance(viz_model, ProgressiveCascadeModel):
                mkw["return_intermediate"] = True  # all stage volumes

            def _fwd(params, batch_stats, x):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return viz_model.apply(
                    variables, x, train=False, mutable=["intermediates"],
                    capture_intermediates=lambda mdl, _: "xray_encoder" in (mdl.name or ""),
                    **mkw)

            fns[key] = jax.jit(_fwd)
        pred, inter = fns[key](params, batch_stats, xrays)

        files: Dict[str, str] = {}
        vols = pred if isinstance(pred, dict) else {phase: pred}
        vols = {k: np.asarray(jax.device_get(v), np.float32) for k, v in vols.items()}
        p = str(out_dir / f"{phase}_prediction_vs_gt.png")
        V.compare_stage_outputs(vols, gt, p)
        files[f"viz/{phase}/prediction_vs_gt"] = p

        feats = [leaf for path, leaf in
                 jax.tree_util.tree_flatten_with_path(inter.get("intermediates", {}))[0]
                 if any("xray_encoder" in str(getattr(k, "key", "")) for k in path)
                 and hasattr(leaf, "ndim") and leaf.ndim == 4]
        if feats:
            p = str(out_dir / f"{phase}_xray_features.png")
            V.plot_feature_maps(np.asarray(jax.device_get(feats[-1]), np.float32), p,
                                title=f"X-ray encoder features — {phase} epoch {epoch}")
            files[f"viz/{phase}/xray_features"] = p

        att = collect_attention_maps(inter.get("intermediates", {}))
        if att:
            p = str(out_dir / f"{phase}_attention_salience.png")
            V.plot_attention_salience(np.asarray(jax.device_get(att["cross_attention"]), np.float32),
                                      p, title=f"Cross-attention salience — {phase} epoch {epoch}")
            files[f"viz/{phase}/attention_salience"] = p

        self.jsonl.log({"epoch": epoch, "phase": phase, "viz_dir": str(out_dir),
                        "viz_files": sorted(Path(f).name for f in files.values())})
        if self.cfg.training.use_wandb:
            wandb_compat.log_images(files, step=epoch)

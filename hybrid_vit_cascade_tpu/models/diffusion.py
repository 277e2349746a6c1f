"""Diffusion model family (reference: models/unified_model.py).

v-parameterized conditional diffusion over CT volumes with a cosine noise
schedule, depth-lifting priors concatenated into the denoiser input, and a
multi-view Beer–Lambert DRR physics loss on the clamped predicted x₀.

TPU-first differences: the noise schedule is a plain pytree of jnp constants
(no buffers); timestep/noise sampling threads explicit PRNG keys (the
reference used global torch RNG — SURVEY.md §7 'non-determinism discipline').
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.drr import drr_beer_lambert
from ..ops.resize import resize_bilinear
from .depth_lifting import CascadedDepthLifting
from .encoders import XrayConditioningModule
from .layers import Dtype, torch_default_init
from .vit3d import HybridViT3D


@dataclass(frozen=True)
class NoiseSchedule:
    """Cosine (Improved-DDPM) or linear beta schedule
    (unified_model.py:220-242)."""

    num_timesteps: int = 1000
    schedule_type: str = "cosine"

    def tables(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(sqrt_alphas_cumprod, sqrt_one_minus_alphas_cumprod), fp32."""
        T = self.num_timesteps
        if self.schedule_type == "cosine":
            s = 0.008
            x = jnp.linspace(0.0, T, T + 1)
            ac = jnp.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
            betas = jnp.clip(1.0 - ac[1:] / ac[:-1], 0.0001, 0.9999)
        else:
            betas = jnp.linspace(0.0001, 0.02, T)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return jnp.sqrt(alphas_cumprod), jnp.sqrt(1.0 - alphas_cumprod)

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        sa, so = self.tables()
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return sa[t].reshape(shape) * x_start + so[t].reshape(shape) * noise

    def v_target(self, x_start: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        sa, so = self.tables()
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return sa[t].reshape(shape) * noise - so[t].reshape(shape) * x_start

    def pred_x_start_from_v(self, x_noisy: jnp.ndarray, v: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        sa, so = self.tables()
        shape = (-1,) + (1,) * (x_noisy.ndim - 1)
        return sa[t].reshape(shape) * x_noisy - so[t].reshape(shape) * v

    def pred_x_start_from_eps(self, x_noisy: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        sa, so = self.tables()
        shape = (-1,) + (1,) * (x_noisy.ndim - 1)
        sa_t = jnp.maximum(sa[t].reshape(shape), 1e-8)
        return (x_noisy - so[t].reshape(shape) * eps) / sa_t


class UnifiedCascadeStage(nn.Module):
    """One diffusion cascade stage: depth-lifting prior → 16ch projection →
    concat with the noisy volume → HybridViT3D denoiser
    (unified_model.py:20-130). Channels-last volumes."""

    volume_size: Tuple[int, int, int]
    voxel_dim: int = 384
    vit_depth: int = 6
    num_heads: int = 6
    xray_feature_dim: int = 512
    use_prev_stage: bool = False
    use_depth_lifting: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # jax.checkpoint per ViT block (the reference family has no grad-ckpt at
    # all — its diffusion was never trained; required here to fit the 128³+
    # ladder stages in 16 GB)
    remat: bool = False
    # >1: stream the depth lifter's fusion in this many depth slabs
    # (CascadedDepthLifting.lift_slabs) — unlocks batch ≥2 at the 128³ stage
    lift_slabs: int = 0

    @nn.compact
    def __call__(
        self,
        noisy_volume: jnp.ndarray,  # (B, D, H, W, 1)
        xray_features: jnp.ndarray,  # (B, H', W', C)
        time_xray_cond: jnp.ndarray,  # (B, 1024)
        prev_stage_volume: Optional[jnp.ndarray] = None,  # (B, D', H', W', 1)
        prev_stage_embed: Optional[jnp.ndarray] = None,  # (B, 256)
        train: bool = False,
    ) -> jnp.ndarray:
        B = noisy_volume.shape[0]
        D, H, W = self.volume_size
        x = noisy_volume

        if self.use_depth_lifting:
            # The 1-channel previous volume goes in as-is — the lifter resizes
            # it first and broadcasts to feature_dim lazily per slab (the old
            # up-front broadcast_to materialized a full C-channel volume).
            # remat the lifter too: its (B, D, H', W', C) fp32 GroupNorm
            # intermediates (several GB-scale tensors at the 128³ stage) are
            # the ladder's true memory hog, not the ViT blocks; lift_slabs
            # additionally depth-streams the fusion so they never materialize
            # at full depth at all.
            lifter_cls = (nn.remat(CascadedDepthLifting, static_argnums=(2,))
                          if self.remat else CascadedDepthLifting)
            prior = lifter_cls(
                feature_dim=self.xray_feature_dim,
                depth_sizes=(64, 128, 256),
                use_prev_stage=self.use_prev_stage,
                dtype=self.dtype,
                lift_slabs=self.lift_slabs,
                name="depth_lifter",
            )(xray_features, D, prev_stage_volume)
            prior = nn.Conv(
                16, (1, 1, 1), kernel_init=torch_default_init, dtype=self.dtype, name="depth_to_volume"
            )(prior)
            if prior.shape[1:4] != (D, H, W):
                p = jnp.moveaxis(prior, -1, 1)
                from ..ops.resize import resize_trilinear

                p = resize_trilinear(p, (D, H, W), align_corners=True)
                prior = jnp.moveaxis(p, 1, -1)
            x = jnp.concatenate([x, prior.astype(x.dtype)], axis=-1)  # (B, D, H, W, 17)

        context = xray_features.reshape(B, -1, self.xray_feature_dim)
        return HybridViT3D(
            volume_size=self.volume_size,
            in_channels=x.shape[-1],
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            use_prev_stage=self.use_prev_stage,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            name="vit_backbone",
        )(x, context, time_xray_cond, prev_stage_embed, train=train)


class UnifiedHybridViTCascade(nn.Module):
    """Multi-stage diffusion cascade with physics loss
    (unified_model.py:133-392).

    `__call__(x_start (B,1,D,H,W), xrays (B,V,1,512,512), stage_name, rng, ...)`
    → dict(loss, diffusion_loss, physics_loss)."""

    stage_configs: Tuple[Dict, ...]
    num_views: int = 2
    xray_embed_dim: int = 512
    time_embed_dim: int = 256
    num_timesteps: int = 1000
    v_parameterization: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False  # per-block jax.checkpoint in every stage denoiser
    lift_slabs: int = 0  # >1: depth-stream every stage's lifter fusion

    @property
    def schedule(self) -> NoiseSchedule:
        return NoiseSchedule(self.num_timesteps, "cosine")

    @nn.compact
    def __call__(
        self,
        x_start: jnp.ndarray,
        xrays: jnp.ndarray,
        stage_name: str,
        rng: jax.Array,
        prev_stage_volume: Optional[jnp.ndarray] = None,
        train: bool = False,
        mode: str = "loss",
        t_override: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """mode='loss' (default): x_start + rng → sampled-t training losses.
        mode='denoise': x_start is x_noisy and t_override the (B,) timesteps;
        returns the raw v/ε prediction — the per-step call of ddim_sample
        (the reference ships no sampler at all; this exceeds parity so the
        family's reconstruction quality is measurable)."""
        B = x_start.shape[0]
        sched = self.schedule
        if mode == "denoise":
            assert t_override is not None
            t = t_override
            noise = jnp.zeros_like(x_start, dtype=jnp.float32)
            x_noisy = x_start.astype(jnp.float32)
        else:
            t_rng, noise_rng = jax.random.split(rng)
            t = jax.random.randint(t_rng, (B,), 0, self.num_timesteps)
            noise = jax.random.normal(noise_rng, x_start.shape, jnp.float32)
            x_noisy = sched.q_sample(x_start.astype(jnp.float32), t, noise)

        # time embedding MLP over normalized t (unified_model.py:162-166,291)
        tn = (t.astype(jnp.float32) / self.num_timesteps)[:, None]
        te = nn.Dense(self.time_embed_dim, kernel_init=torch_default_init, dtype=self.dtype)(tn)
        te = nn.silu(te)
        te = nn.Dense(self.time_embed_dim, kernel_init=torch_default_init, dtype=self.dtype)(te)

        _, time_xray_cond, feats = XrayConditioningModule(
            embed_dim=self.xray_embed_dim,
            num_views=self.num_views,
            time_embed_dim=self.time_embed_dim,
            cond_dim=1024,
            dtype=self.dtype,
            name="xray_encoder",
        )(xrays, te, train=train)

        cfg = next(c for c in self.stage_configs if c["name"] == stage_name)
        stage_idx = [c["name"] for c in self.stage_configs].index(stage_name)
        use_prev = stage_idx > 0

        prev_embed = None
        prev_vol_cl = None
        if prev_stage_volume is not None and use_prev:
            prev_vol_cl = jnp.moveaxis(prev_stage_volume, 1, -1)
            gap = prev_vol_cl.mean(axis=(1, 2, 3))  # (B, 1)
            prev_embed = nn.Dense(
                256, kernel_init=torch_default_init, dtype=self.dtype, name=f"prev_proj_{stage_name}"
            )(gap.astype(self.dtype))

        predicted = UnifiedCascadeStage(
            volume_size=tuple(cfg["volume_size"]),
            voxel_dim=cfg["voxel_dim"],
            vit_depth=cfg["vit_depth"],
            num_heads=cfg["num_heads"],
            xray_feature_dim=self.xray_embed_dim,
            use_prev_stage=use_prev,
            use_depth_lifting=cfg.get("use_depth_lifting", True),
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            lift_slabs=self.lift_slabs,
            name=f"stage_{stage_name}",
        )(
            jnp.moveaxis(x_noisy, 1, -1).astype(self.dtype),
            feats,
            time_xray_cond,
            prev_vol_cl,
            prev_embed,
            train=train,
        )
        predicted = jnp.moveaxis(predicted, -1, 1).astype(jnp.float32)  # (B, 1, D, H, W)
        if mode == "denoise":
            return predicted

        if self.v_parameterization:
            target = sched.v_target(x_start.astype(jnp.float32), noise, t)
            pred_x0 = sched.pred_x_start_from_v(x_noisy, predicted, t)
        else:
            target = noise
            pred_x0 = sched.pred_x_start_from_eps(x_noisy, predicted, t)
        diffusion_loss = jnp.mean((predicted - target) ** 2)

        # Multi-view DRR physics loss on clamped pred-x0 (unified_model.py:339-378)
        physics_loss = jnp.asarray(0.0, jnp.float32)
        if cfg.get("use_physics_loss", True):
            x0 = jnp.clip(pred_x0, -1.5, 1.5)[:, 0]  # (B, D, H, W)
            view_losses = []
            for view_idx in range(xrays.shape[1]):
                view = "lateral" if view_idx == 1 else "ap"
                drr = drr_beer_lambert(x0, view)
                tgt = xrays[:, view_idx, 0].astype(jnp.float32)
                if drr.shape[-2:] != tgt.shape[-2:]:
                    drr = resize_bilinear(drr, tgt.shape[-2:], align_corners=True)
                view_losses.append(jnp.mean((drr - tgt) ** 2))
            physics_loss = sum(view_losses) / len(view_losses)

        physics_weight = cfg.get("physics_weight", 0.3)
        total = diffusion_loss + physics_weight * physics_loss
        return {"loss": total, "diffusion_loss": diffusion_loss, "physics_loss": physics_loss}


def ddim_sample(
    model: UnifiedHybridViTCascade,
    variables,
    xrays: jnp.ndarray,
    stage_name: str,
    rng: jax.Array,
    volume_size: Tuple[int, int, int],
    num_steps: int = 20,
    prev_stage_volume: Optional[jnp.ndarray] = None,
    clip_x0: float = 1.5,
) -> jnp.ndarray:
    """Deterministic DDIM (η=0) sampler for the v-parameterized cascade.

    The reference has NO sampler (unified_model.py trains losses only, its
    diffusion family is unreachable from any script) — this makes the
    family's reconstructions measurable. Identities for v-param:
        x0 = √ᾱ·x_t − √(1−ᾱ)·v      ε = √(1−ᾱ)·x_t + √ᾱ·v
        x_{t'} = √ᾱ'·x0 + √(1−ᾱ')·ε
    jit/scan-friendly: static step count, gather-indexed schedule tables.
    """
    B = xrays.shape[0]
    sched = model.schedule
    sa, so = sched.tables()
    ts = jnp.linspace(model.num_timesteps - 1, 0, num_steps).round().astype(jnp.int32)

    x = jax.random.normal(rng, (B, 1, *volume_size), jnp.float32)

    def shape(c):
        return c.reshape((-1,) + (1,) * 4)

    def step(x, i):
        t = jnp.full((B,), ts[i], jnp.int32)
        v = model.apply(
            variables, x, xrays, stage_name, jax.random.PRNGKey(0),
            prev_stage_volume=prev_stage_volume, train=False,
            mode="denoise", t_override=t,
        )
        x0 = jnp.clip(sched.pred_x_start_from_v(x, v, t), -clip_x0, clip_x0)
        eps = shape(so[t]) * x + shape(sa[t]) * v
        t_next = jnp.where(i + 1 < num_steps, ts[jnp.minimum(i + 1, num_steps - 1)], 0)
        tn = jnp.full((B,), t_next, jnp.int32)
        x_next = shape(sa[tn]) * x0 + shape(so[tn]) * eps
        # at the final step return the clean estimate
        x_next = jnp.where(i + 1 < num_steps, x_next, x0)
        return x_next, None

    x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
    return x


def cascaded_ddim_sample(
    model: UnifiedHybridViTCascade,
    variables,
    xrays: jnp.ndarray,
    rng: jax.Array,
    num_steps: int = 20,
    stage_names: Optional[Tuple[str, ...]] = None,
) -> Dict[str, jnp.ndarray]:
    """Full progressive diffusion inference (64³→128³→256³): DDIM-sample each
    stage in order, conditioning every refiner on the PREVIOUS stage's
    generated volume (the chaining the reference models but never drives —
    unified_model.py:261-392 accepts prev_stage_volume yet no script feeds
    it, and it has no sampler). `variables` must hold every sampled stage's
    params (Trainer.fit_diffusion_cascade trains them into one tree).

    Returns {stage_name: (B, 1, D, H, W)} for every sampled stage."""
    names = list(stage_names) if stage_names is not None else [
        c["name"] for c in model.stage_configs]
    out: Dict[str, jnp.ndarray] = {}
    prev = None
    for cfg in model.stage_configs:
        if cfg["name"] not in names:
            continue
        rng, k = jax.random.split(rng)
        vol = ddim_sample(model, variables, xrays, cfg["name"], k,
                          tuple(cfg["volume_size"]), num_steps,
                          prev_stage_volume=prev)
        out[cfg["name"]] = vol
        prev = vol
    return out

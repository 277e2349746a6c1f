"""Hybrid 3D-ViT backbone (reference: models/hybrid_vit_backbone.py).

Per-stage token budget (hybrid_vit_backbone.py:174-187, corrected — see
_stem_plan): volumes are conv-downsampled to ≤128³→16³=4096, else
32³=32,768 tokens, run through AdaLN-modulated self-attn + cross-attn
blocks, projected to one channel and trilinearly upsampled back
(align_corners=True, :272).

Reference defect fixed (verified by running the reference under torch-CPU):
at 128³ the reference sizes its pos-embed from `128 // 5 = 25³` but its conv
stem realizes stride 4 → 32³ tokens, so `x + pos_embed` raises at runtime
(hybrid_vit_backbone.py:184-187,213). Here the token grid is derived from the
*realized* stem stride, consistent by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_trilinear
from .attention import MultiHeadCrossAttention, MultiHeadSelfAttention
from .layers import AdaLNModulation, Dtype, Mlp, group_norm, layer_norm, torch_default_init

PREV_STAGE_EMBED_DIM = 256


class HybridViTBlock3D(nn.Module):
    """Pre-norm block: AdaLN-modulated self-attn → un-modulated cross-attn to
    X-ray tokens → AdaLN-modulated MLP (hybrid_vit_backbone.py:21-143)."""

    voxel_dim: int
    num_heads: int = 8
    context_dim: int = 512
    cond_dim: int = 1024
    mlp_ratio: int = 4
    dropout: float = 0.1
    use_prev_stage: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    store_attention: bool = False  # sow cross-attn probs (vit_components.py:63-108)
    # remat ONLY the MLP (its 4×-wide hidden is the block's fattest residual);
    # attention runs un-rematted, so its flash fwd kernel is NOT re-run in the
    # backward — use via HybridViT3D(remat_mode='mlp') when HBM affords the
    # saved attention residuals (~200 MB/block at stage-3 sizes)
    remat_mlp: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, voxel_dim)
        context: jnp.ndarray,  # (B, M, context_dim)
        cond: jnp.ndarray,  # (B, cond_dim)
        prev_stage_embed: Optional[jnp.ndarray] = None,  # (B, 256)
        train: bool = False,
    ) -> jnp.ndarray:
        if self.use_prev_stage:
            if prev_stage_embed is None:
                prev_stage_embed = jnp.zeros((x.shape[0], PREV_STAGE_EMBED_DIM), x.dtype)
            cond = jnp.concatenate([cond, prev_stage_embed.astype(cond.dtype)], axis=-1)

        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = AdaLNModulation(
            self.voxel_dim, dtype=self.dtype
        )(cond)

        h = layer_norm(self.dtype)(x)
        h = (1.0 + scale_sa) * h + shift_sa
        h = MultiHeadSelfAttention(
            self.voxel_dim, self.num_heads, self.dropout, dtype=self.dtype, attn_impl=self.attn_impl
        )(h, train=train)
        x = x + gate_sa * h

        h = layer_norm(self.dtype)(x)
        h = MultiHeadCrossAttention(
            self.voxel_dim,
            self.context_dim,
            self.num_heads,
            self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            store_attention=self.store_attention,
        )(h, context, train=train)
        x = x + h

        h = layer_norm(self.dtype)(x)
        h = (1.0 + scale_mlp) * h + shift_mlp
        mlp_cls = nn.remat(Mlp, static_argnums=(2,)) if self.remat_mlp else Mlp
        # explicit name: nn.remat changes the class-derived auto-name, and the
        # param tree must be identical across remat modes (checkpoint compat)
        h = mlp_cls(self.voxel_dim * self.mlp_ratio, self.voxel_dim, self.dropout,
                    dtype=self.dtype, name="Mlp_0")(h, train)
        x = x + gate_mlp * h
        return x


def _stem_plan(volume_size: Tuple[int, int, int], in_channels: int, voxel_dim: int):
    """Greedy stride-2 plan + channel schedule (hybrid_vit_backbone.py:177-208).

    Token budget: ≤64³→16³ (4096 tokens), ≤128³→16³, >128³→32³ (32,768).
    The reference file targets 24³ at 128³ but that code *crashes* (pos-embed
    `128//5 = 25³` vs realized stem stride 4 → 32³ tokens); its Stage2
    comments and training-fix notes ('16³ tokens (4096) — memory safe',
    model_progressive.py:176, STAGE2_TRAINING_FIXES.md:22-27) describe the
    configuration that actually trained, which is also the only
    self-consistent power-of-two plan — so 128³ uses 16³ here.

    Channels walk in→vd/4→vd/2→vd (then stay at vd), matching the reference's
    `len(layers) < 4` bookkeeping (3 torch layers per block)."""
    d = max(volume_size)
    target = 16 if d <= 128 else 32
    factor = max(1, max(s // target for s in volume_size))
    blocks = []  # (out_channels,) per stride-2 conv block
    current = in_channels
    remaining = factor
    n = 0
    while remaining > 1:
        if current == in_channels:
            out = voxel_dim // 4
        elif n < 2:
            out = voxel_dim // 2
        else:
            out = voxel_dim
        blocks.append(out)
        current = out
        remaining //= 2
        n += 1
    realized = 2 ** len(blocks)
    down = tuple(s // realized for s in volume_size)
    return blocks, current, down


class HybridViT3D(nn.Module):
    """Complete backbone for one cascade stage (hybrid_vit_backbone.py:146-274).

    Input/output layout is channels-last: (B, D, H, W, C) → (B, D, H, W, 1).
    """

    volume_size: Tuple[int, int, int] = (64, 64, 64)
    in_channels: int = 1
    voxel_dim: int = 384
    depth: int = 6
    num_heads: int = 6
    context_dim: int = 512
    cond_dim: int = 1024
    use_prev_stage: bool = False
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False  # jax.checkpoint per block (ref: torch.utils.checkpoint)
    # 'block': remat whole blocks (minimum memory — the reference's scheme);
    # 'mlp': remat only each block's MLP, keeping attention un-rematted so
    # the flash kernels run once, not twice — ~0.3 s/step faster at stage 3
    # for ~1.5 GB of saved attention residuals (unpadded, see
    # ops/pallas/flash_attention.py)
    remat_mode: str = "block"
    # 'NDHWC' (channels-last) or 'NCDHW' (feature-first). NCDHW avoids the
    # 128-lane channel padding for small-C high-res stems (ops/conv3d.py) —
    # use it for the 128³/256³ refiner stages.
    layout: str = "NDHWC"
    # the caller already ran the token stem (e.g. slab-streamed with the
    # upsample conv, models/cascade.py Stage3ViTTrunk): input is the
    # (B, voxel_dim, Dd, Hd, Wd) feature map, the conv stem is skipped.
    external_stem: bool = False
    store_attention: bool = False  # sow cross-attn probs per block

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, D, H, W, C) for NDHWC / (B, C, D, H, W) for NCDHW
        context: jnp.ndarray,  # (B, M, context_dim)
        cond: jnp.ndarray,  # (B, cond_dim)
        prev_stage_embed: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B = x.shape[0]
        D, H, W = self.volume_size
        blocks_ch, last_ch, (Dd, Hd, Wd) = _stem_plan(self.volume_size, self.in_channels, self.voxel_dim)

        h = x.astype(self.dtype)
        if self.external_stem:
            assert self.layout == "NCDHW" and x.shape[1] == self.voxel_dim, x.shape
            Dd, Hd, Wd = x.shape[2:5]
            h = jnp.moveaxis(h, 1, -1)
        elif self.layout == "NCDHW":
            from ..ops.conv3d import ConvNCDHW, GroupNormNCDHW

            conv_cls = nn.remat(ConvNCDHW) if self.remat else ConvNCDHW
            for ci, out_ch in enumerate(blocks_ch):
                # explicit name: keeps remat/no-remat param paths identical
                # (nn.remat auto-names would be "CheckpointConvNCDHW_N")
                h = conv_cls(out_ch, 3, stride=2, padding=1, dtype=self.dtype,
                             name=f"ConvNCDHW_{ci}")(h)
                h = GroupNormNCDHW(min(8, out_ch), dtype=self.dtype)(h)
                h = nn.silu(h)
            if last_ch != self.voxel_dim:
                h = ConvNCDHW(self.voxel_dim, 3, padding=1, dtype=self.dtype,
                              name=f"ConvNCDHW_{len(blocks_ch)}")(h)
            # (B, C, Dd, Hd, Wd) → (B, N, C); small by now (≤32³ tokens)
            h = jnp.moveaxis(h, 1, -1)
        else:
            for out_ch in blocks_ch:
                h = nn.Conv(out_ch, (3, 3, 3), strides=2, padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
                h = group_norm(min(8, out_ch), dtype=self.dtype)(h)
                h = nn.silu(h)
            if last_ch != self.voxel_dim:
                h = nn.Conv(self.voxel_dim, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)

        tokens = h.reshape(B, Dd * Hd * Wd, self.voxel_dim)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, Dd * Hd * Wd, self.voxel_dim),
            jnp.float32,
        )
        tokens = tokens + pos_embed.astype(tokens.dtype)
        # Sequence-shard voxel tokens over the mesh's 'model' axis when one is
        # ambient (no-op otherwise): Q stays sharded through the blocks, K/V
        # are all-gathered by the partitioner. NOTE: requires the XLA
        # attention path for partitioning; pallas_call is not GSPMD-visible.
        from ..parallel import shard_tokens

        tokens = shard_tokens(tokens)

        block_cls = HybridViTBlock3D
        remat_mlp = False
        if self.remat and self.remat_mode == "mlp":
            remat_mlp = True
        elif self.remat:
            block_cls = nn.remat(HybridViTBlock3D, static_argnums=(5,))
        for i in range(self.depth):
            tokens = block_cls(
                voxel_dim=self.voxel_dim,
                num_heads=self.num_heads,
                context_dim=self.context_dim,
                cond_dim=self.cond_dim,
                dropout=self.dropout,
                use_prev_stage=self.use_prev_stage,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                store_attention=self.store_attention,
                remat_mlp=remat_mlp,
                # explicit name: nn.remat's auto-name is "Checkpoint<cls>_N",
                # which would make remat/no-remat param trees incompatible
                name=f"HybridViTBlock3D_{i}",
            )(tokens, context, cond, prev_stage_embed, train)
            tokens = shard_tokens(tokens)  # keep the layout pinned per block

        tokens = layer_norm(self.dtype)(tokens)
        out = nn.Dense(1, kernel_init=torch_default_init, dtype=self.dtype)(tokens)
        out = out.reshape(B, Dd, Hd, Wd, 1)
        # Trailing spatial-resize wants (..., D, H, W): move channel first.
        out = jnp.moveaxis(out, -1, 1)  # (B, 1, Dd, Hd, Wd)
        out = resize_trilinear(out, (D, H, W), align_corners=True)
        return jnp.moveaxis(out, 1, -1)  # (B, D, H, W, 1)

"""Full-model numerical parity of the FLAGSHIP progressive cascade vs a
PyTorch oracle.

Extends tests/test_parity_model.py (DirectCTRegression) to the complete
3-stage cascade (reference: model_progressive.py): a faithful torch
implementation of Stage1Base64 (own MultiScaleXrayEncoder — the preserved
reference quirk), Stage2Refiner128 (upsample-conv stem, NCDHW ViT, learned
residual), Stage3Refiner256 (fused upsample+token stem, external-stem ViT,
detail-enhancer CNN, learned residual+detail blend) and the shared
cascade-level encoder is initialized randomly, its weights are mapped into
the JAX tree, and the stage-3 forwards must agree. Identical weights →
identical reconstruction is the strongest parity evidence available without
the reference's training data.

Scaled-down config (8³→16³→32³ cubes, 64² X-rays, E=32, one block per
stage) keeps the torch CPU oracle fast while exercising every architectural
element, including both resize conventions (align_corners=False at stage
boundaries, align_corners=True inside the ViT head) and all three GroupNorm
group counts."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from the default tier

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from hybrid_vit_cascade_tpu.models import ProgressiveCascadeModel
from tests.test_parity_model import (
    E,
    HEADS,
    TorchBlock,
    TorchXrayCond,
    _conv2d,
    _conv3d,
    _dense,
    _lin,
    _norm,
    _np,
)

S1, S2, S3 = 8, 16, 32
XR = 64


class TorchMultiScaleEnc(tnn.Module):
    """Oracle for MultiScaleXrayEncoder (model_progressive.py:16-83): shared
    conditioning encoder + per-stage stride-2 GN/GELU pyramid branches."""

    def __init__(self, n_down):
        super().__init__()
        self.enc = TorchXrayCond()
        self.downs = tnn.ModuleList()
        self.gns = tnn.ModuleList()
        for _ in range(n_down):
            self.downs.append(tnn.Conv2d(E, E, 3, 2, 1))
            self.gns.append(tnn.GroupNorm(32, E))

    def forward(self, xrays):
        B = xrays.shape[0]
        _, cond, feats = self.enc(xrays, torch.zeros(B, 256))
        h = feats
        for conv, gn in zip(self.downs, self.gns):
            h = tF.gelu(gn(conv(h)))
        ctx = h.permute(0, 2, 3, 1).reshape(B, -1, E)
        return ctx, cond


class TorchStage1(tnn.Module):
    """Oracle for Stage1Base64 at 8³: stem plan has no stride-2 blocks, only
    the projection conv (1→E); 512 tokens."""

    def __init__(self):
        super().__init__()
        self.enc = TorchMultiScaleEnc(n_down=2)  # stage-1 branch: ÷4
        self.seed = tnn.Parameter(torch.randn(1, 1, S1, S1, S1))
        self.proj = tnn.Conv3d(1, E, 3, 1, 1)
        self.pos = tnn.Parameter(torch.randn(1, S1 ** 3, E) * 0.02)
        self.block = TorchBlock()
        self.ln = tnn.LayerNorm(E)
        self.head = tnn.Linear(E, 1)

    def forward(self, xrays):
        B = xrays.shape[0]
        ctx, cond = self.enc(xrays)
        x = self.seed.expand(B, -1, -1, -1, -1)
        tokens = self.proj(x).permute(0, 2, 3, 4, 1).reshape(B, -1, E) + self.pos
        tokens = self.block(tokens, ctx, cond)
        out = self.head(self.ln(tokens)).reshape(B, S1, S1, S1, 1).permute(0, 4, 1, 2, 3)
        return out  # (B, 1, 8, 8, 8); 8³→8³ trilinear resize is the identity


class TorchStage2(tnn.Module):
    """Oracle for Stage2Refiner128 at 16³: upsample-conv stem (GN 8), NCDHW
    ViT with an EMPTY stem plan (in_channels==voxel_dim → tokens directly),
    learned-weight residual on the upsampled base."""

    def __init__(self):
        super().__init__()
        self.up_conv = tnn.Conv3d(1, E, 3, 1, 1)
        self.up_gn = tnn.GroupNorm(8, E)
        self.pos = tnn.Parameter(torch.randn(1, S2 ** 3, E) * 0.02)
        self.block = TorchBlock()
        self.ln = tnn.LayerNorm(E)
        self.head = tnn.Linear(E, 1)
        self.residual_weight = tnn.Parameter(torch.tensor([0.7]))

    def forward(self, vol_nc, ctx, cond):  # vol_nc (B, 1, 8, 8, 8)
        B = vol_nc.shape[0]
        up = tF.interpolate(vol_nc, size=(S2,) * 3, mode="trilinear", align_corners=False)
        h = tF.gelu(self.up_gn(self.up_conv(up)))
        tokens = h.permute(0, 2, 3, 4, 1).reshape(B, -1, E) + self.pos
        tokens = self.block(tokens, ctx, cond)
        ref = self.head(self.ln(tokens)).reshape(B, S2, S2, S2, 1).permute(0, 4, 1, 2, 3)
        return up + self.residual_weight * ref  # (B, 1, 16³)


class TorchStage3(tnn.Module):
    """Oracle for Stage3Refiner256 at 32³: fused upsample+token stem chain
    (1→32 conv, GN8, GELU, 32→8 s2 stem conv, GN8, SiLU, 8→32 proj),
    external-stem ViT over 16³ tokens upsampled ×2 with align_corners=True,
    detail-enhancer CNN (1→64 GN16 GELU → 64→32 GN8 GELU → 32→1 1×1),
    base + w_r·refinement + w_d·details blend."""

    def __init__(self):
        super().__init__()
        self.up_conv = tnn.Conv3d(1, E, 3, 1, 1)
        self.up_gn = tnn.GroupNorm(8, E)
        self.stem0 = tnn.Conv3d(E, 8, 3, 2, 1)
        self.stem0_gn = tnn.GroupNorm(8, 8)
        self.proj = tnn.Conv3d(8, E, 3, 1, 1)
        self.pos = tnn.Parameter(torch.randn(1, (S3 // 2) ** 3, E) * 0.02)
        self.block = TorchBlock()
        self.ln = tnn.LayerNorm(E)
        self.head = tnn.Linear(E, 1)
        self.det0 = tnn.Conv3d(1, 64, 3, 1, 1)
        self.det0_gn = tnn.GroupNorm(16, 64)
        self.det1 = tnn.Conv3d(64, 32, 3, 1, 1)
        self.det1_gn = tnn.GroupNorm(8, 32)
        self.det_out = tnn.Conv3d(32, 1, 1)
        self.residual_weight = tnn.Parameter(torch.tensor([0.6]))
        self.detail_weight = tnn.Parameter(torch.tensor([0.4]))

    def forward(self, vol_nc, ctx, cond):  # vol_nc (B, 1, 16³)
        B = vol_nc.shape[0]
        up = tF.interpolate(vol_nc, size=(S3,) * 3, mode="trilinear", align_corners=False)
        h = tF.gelu(self.up_gn(self.up_conv(up)))
        h = tF.silu(self.stem0_gn(self.stem0(h)))
        h = self.proj(h)  # (B, E, 16, 16, 16)
        tokens = h.permute(0, 2, 3, 4, 1).reshape(B, -1, E) + self.pos
        tokens = self.block(tokens, ctx, cond)
        t = S3 // 2
        ref = self.head(self.ln(tokens)).reshape(B, t, t, t, 1).permute(0, 4, 1, 2, 3)
        ref = tF.interpolate(ref, size=(S3,) * 3, mode="trilinear", align_corners=True)

        base = up
        d = tF.gelu(self.det0_gn(self.det0(base)))
        d = tF.gelu(self.det1_gn(self.det1(d)))
        d = self.det_out(d)
        return base + self.residual_weight * ref + self.detail_weight * d


class TorchCascade(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stage1 = TorchStage1()
        self.enc = TorchMultiScaleEnc(n_down=1)  # cascade-level: stage2 ÷2 branch
        self.stage2 = TorchStage2()
        self.stage3 = TorchStage3()

    def forward(self, xrays):
        B = xrays.shape[0]
        vol1 = self.stage1(xrays)
        ctx2, cond = self.enc(xrays)
        vol2 = self.stage2(vol1, ctx2, cond)
        # stage-3 context: the FULL encoder map (no down blocks)
        _, cond3, feats = self.enc.enc(xrays, torch.zeros(B, 256))
        ctx3 = feats.permute(0, 2, 3, 1).reshape(B, -1, E)
        return self.stage3(vol2, ctx3, cond3)


def _block_params(blk: TorchBlock):
    return {
        "AdaLNModulation_0": {"Dense_0": _dense(blk.adaln)},
        "LayerNorm_0": _norm(blk.ln0),
        "LayerNorm_1": _norm(blk.ln1),
        "LayerNorm_2": _norm(blk.ln2),
        "MultiHeadSelfAttention_0": {
            "Dense_0": _dense(blk.qkv, bias=False),
            "Dense_1": _dense(blk.sa_out),
        },
        "MultiHeadCrossAttention_0": {
            "q": _dense(blk.q, bias=False),
            "kv": _dense(blk.kv, bias=False),
            "Dense_0": _dense(blk.ca_out),
        },
        "Mlp_0": {"Dense_0": _dense(blk.fc1), "Dense_1": _dense(blk.fc2)},
    }


def _cond_params(enc: TorchXrayCond):
    return {
        "Conv_0": {"kernel": _conv2d(enc.conv1.weight), "bias": _np(enc.conv1.bias)},
        "BatchNorm_0": _norm(enc.bn1),
        "Conv_1": {"kernel": _conv2d(enc.conv2.weight), "bias": _np(enc.conv2.bias)},
        "BatchNorm_1": _norm(enc.bn2),
        "Conv_2": {"kernel": _conv2d(enc.conv3.weight), "bias": _np(enc.conv3.bias)},
        "BatchNorm_2": _norm(enc.bn3),
        "to_cond": _dense(enc.to_cond),
        "Dense_0": _dense(enc.time1),
        "Dense_1": _dense(enc.time2),
    }


def _cond_stats(enc: TorchXrayCond):
    return {
        f"BatchNorm_{i}": {"mean": _np(bn.running_mean), "var": _np(bn.running_var)}
        for i, bn in enumerate([enc.bn1, enc.bn2, enc.bn3])
    }


def _ms_enc_params(ms: TorchMultiScaleEnc, branch_names):
    p = {"xray_encoder": _cond_params(ms.enc)}
    for name, conv, gn in zip(branch_names, ms.downs, ms.gns):
        p[f"{name}_conv"] = {"kernel": _conv2d(conv.weight), "bias": _np(conv.bias)}
    for i, gn in enumerate(ms.gns):
        p[f"GroupNorm_{i}"] = _norm(gn)
    return p


def _conv_chain(mod, ncdhw=True):
    """OIDHW torch Conv3d → the _ChainParams kernel layout (OIDHW verbatim)."""
    return _np(mod.weight), _np(mod.bias)


def torch_to_jax_variables(tm: TorchCascade):
    s1, s2, s3 = tm.stage1, tm.stage2, tm.stage3

    stage1 = {
        "initial_volume": np.transpose(_np(s1.seed), (0, 2, 3, 4, 1)),
        "xray_encoder": _ms_enc_params(s1.enc, ["to_stage1_a", "to_stage1_b"]),
        "vit_backbone": {
            "Conv_0": {"kernel": _conv3d(s1.proj.weight), "bias": _np(s1.proj.bias)},
            "pos_embed": _np(s1.pos),
            "HybridViTBlock3D_0": _block_params(s1.block),
            "LayerNorm_0": _norm(s1.ln),
            "Dense_0": _dense(s1.head),
        },
    }
    stage2 = {
        "residual_weight": _np(s2.residual_weight),
        "upsample_from_64": {
            "ConvNCDHW_0": {"kernel": _np(s2.up_conv.weight), "bias": _np(s2.up_conv.bias)},
            "GroupNormNCDHW_0": _norm(s2.up_gn),
        },
        "vit_refiner": {
            "pos_embed": _np(s2.pos),
            "HybridViTBlock3D_0": _block_params(s2.block),
            "LayerNorm_0": _norm(s2.ln),
            "Dense_0": _dense(s2.head),
        },
    }
    k_up, b_up = _conv_chain(s3.up_conv)
    k_st, b_st = _conv_chain(s3.stem0)
    k_pr, b_pr = _conv_chain(s3.proj)
    k_d0, b_d0 = _conv_chain(s3.det0)
    k_d1, b_d1 = _conv_chain(s3.det1)
    k_do, b_do = _conv_chain(s3.det_out)
    stage3 = {
        "residual_weight": _np(s3.residual_weight),
        "detail_weight": _np(s3.detail_weight),
        "vit_trunk": {
            "upsample_conv_kernel": k_up, "upsample_conv_bias": b_up,
            "upsample_gn_scale": _np(s3.up_gn.weight), "upsample_gn_bias": _np(s3.up_gn.bias),
            "stem_conv0_kernel": k_st, "stem_conv0_bias": b_st,
            "stem_gn0_scale": _np(s3.stem0_gn.weight), "stem_gn0_bias": _np(s3.stem0_gn.bias),
            "proj_conv_kernel": k_pr, "proj_conv_bias": b_pr,
            "vit_refiner": {
                "pos_embed": _np(s3.pos),
                "HybridViTBlock3D_0": _block_params(s3.block),
                "LayerNorm_0": _norm(s3.ln),
                "Dense_0": _dense(s3.head),
            },
        },
        "detail_enhancer": {
            "conv0_kernel": k_d0, "conv0_bias": b_d0,
            "gn0_scale": _np(s3.det0_gn.weight), "gn0_bias": _np(s3.det0_gn.bias),
            "conv1_kernel": k_d1, "conv1_bias": b_d1,
            "gn1_scale": _np(s3.det1_gn.weight), "gn1_bias": _np(s3.det1_gn.bias),
            "conv_out_kernel": k_do, "conv_out_bias": b_do,
        },
    }
    params = {
        "stage1": stage1,
        "stage2": stage2,
        "stage3": stage3,
        "xray_encoder": _ms_enc_params(tm.enc, ["to_stage2"]),
    }
    batch_stats = {
        "stage1": {"xray_encoder": {"xray_encoder": _cond_stats(s1.enc.enc)}},
        "xray_encoder": {"xray_encoder": _cond_stats(tm.enc.enc)},
    }
    to_jnp = lambda tree: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)
    return {"params": to_jnp(params), "batch_stats": to_jnp(batch_stats)}


class TestCascadeParity:
    def _build(self):
        torch.manual_seed(1)
        tm = TorchCascade().eval()
        with torch.no_grad():
            for enc in [tm.stage1.enc.enc, tm.enc.enc]:
                for bn in [enc.bn1, enc.bn2, enc.bn3]:
                    bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
                    bn.running_var.copy_(1.0 + 0.3 * torch.rand_like(bn.running_var))
        return tm

    def _jax_model(self, **kw):
        return ProgressiveCascadeModel(
            stage_sizes=(S1, S2, S3), voxel_dim=E, stage_depths=(1, 1, 1),
            stage_heads=(HEADS,) * 3, xray_feature_dim=E, attn_impl="xla", **kw)

    def test_cascade_matches_torch(self, rng):
        tm = self._build()
        jm = self._jax_model()
        variables = torch_to_jax_variables(tm)

        template = jax.eval_shape(
            lambda: jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, XR, XR)), max_stage=3))
        t_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_flatten_with_path(template)[0]}
        m_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
        assert t_paths == m_paths, set(t_paths.items()) ^ set(m_paths.items())

        xr = rng.normal(0, 1, (2, 2, 1, XR, XR)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(xr)).numpy()
        got = np.asarray(jm.apply(variables, jnp.asarray(xr), max_stage=3, train=False))
        assert got.shape == want.shape == (2, 1, S3, S3, S3)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_cascade_parity_slab_path(self, rng):
        """The slab-streamed stage-3 schedule must match the same torch
        oracle — parity holds for the memory-lean TRAINING path too.
        (eval_schedule='train' pins the train-tuned slab schedule at this
        train=False call; the default 'auto' eval schedule is what
        test_cascade_matches_torch exercises.)"""
        tm = self._build()
        jm = self._jax_model(stage3_slab_scan=True, slab_count=4,
                             stage3_eval_schedule="train")
        variables = torch_to_jax_variables(tm)
        xr = rng.normal(0, 1, (1, 2, 1, XR, XR)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(xr)).numpy()
        got = np.asarray(jm.apply(variables, jnp.asarray(xr), max_stage=3, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

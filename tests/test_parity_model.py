"""Full-model numerical parity vs a PyTorch oracle.

The ops are individually torch-golden-tested (tests/test_ops.py etc.); this
test closes the loop at the MODEL level: a faithful torch implementation of
the reference's DirectCTRegression (direct_regression/model_direct.py:15-85 —
XrayConditioningModule BN/ReLU/MaxPool encoder, learnable seed volume,
AdaLN-modulated ViT block with self+cross attention, trilinear upsample) is
initialized randomly, its weights are mapped into the JAX model's parameter
tree, and the two forwards must agree. This is the strongest quality-parity
evidence available without the reference's (unreleasable) training data:
identical weights → identical reconstruction.

Run at a scaled-down config (32³ volume, 64² X-rays, one ViT block) so the
torch CPU oracle stays fast; every architectural element of the full-size
model is exercised (stride-2 stem conv + GroupNorm + SiLU, projection conv,
pos-embed, AdaLN, both attentions, MLP, head, align_corners=True upsample).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from the default tier
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from hybrid_vit_cascade_tpu.models import DirectCTRegression

E = 32          # voxel_dim == xray_feature_dim == context_dim
HEADS = 4
VOL = (32, 32, 32)
XR = 64


class TorchXrayCond(tnn.Module):
    """Oracle for XrayConditioningModule (diagnostic_losses.py:68-138)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 64, 7, 2, 3)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 128, 3, 1, 1)
        self.bn2 = tnn.BatchNorm2d(128)
        self.conv3 = tnn.Conv2d(128, E, 3, 1, 1)
        self.bn3 = tnn.BatchNorm2d(E)
        self.to_cond = tnn.Linear(E, 1024)
        self.time1 = tnn.Linear(256, 512)
        self.time2 = tnn.Linear(512, 1024)

    def forward(self, xrays, t_embed):  # xrays (B, V, 1, H, W)
        B, V = xrays.shape[:2]
        x = xrays.reshape(B * V, *xrays.shape[2:])
        x = tF.max_pool2d(tF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = tF.max_pool2d(tF.relu(self.bn2(self.conv2(x))), 2, 2)
        x = tF.relu(self.bn3(self.conv3(x)))
        feats = x.reshape(B, V, *x.shape[1:]).mean(1)          # view average
        ctx = self.to_cond(feats.mean((2, 3)))                 # GAP
        cond = self.time2(tF.silu(self.time1(t_embed))) + ctx
        return ctx, cond, feats


class TorchBlock(tnn.Module):
    """Oracle for HybridViTBlock3D (hybrid_vit_backbone.py:21-143)."""

    def __init__(self):
        super().__init__()
        self.adaln = tnn.Linear(1024, 6 * E)
        self.ln0 = tnn.LayerNorm(E)
        self.ln1 = tnn.LayerNorm(E)
        self.ln2 = tnn.LayerNorm(E)
        self.qkv = tnn.Linear(E, 3 * E, bias=False)
        self.sa_out = tnn.Linear(E, E)
        self.q = tnn.Linear(E, E, bias=False)
        self.kv = tnn.Linear(E, 2 * E, bias=False)
        self.ca_out = tnn.Linear(E, E)
        self.fc1 = tnn.Linear(E, 4 * E)
        self.fc2 = tnn.Linear(4 * E, E)

    @staticmethod
    def attn(q, k, v):
        s = (q @ k.transpose(-2, -1)) * (q.shape[-1] ** -0.5)
        return tF.softmax(s, -1) @ v

    def forward(self, x, ctx, cond):
        B, N, _ = x.shape
        Dh = E // HEADS
        mods = self.adaln(cond).unsqueeze(1).chunk(6, -1)
        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = mods

        h = (1 + scale_sa) * self.ln0(x) + shift_sa
        qkv = self.qkv(h).reshape(B, N, 3, HEADS, Dh).permute(2, 0, 3, 1, 4)
        h = self.attn(qkv[0], qkv[1], qkv[2]).permute(0, 2, 1, 3).reshape(B, N, E)
        x = x + gate_sa * self.sa_out(h)

        h = self.ln1(x)
        q = self.q(h).reshape(B, N, HEADS, Dh).permute(0, 2, 1, 3)
        M = ctx.shape[1]
        kv = self.kv(ctx).reshape(B, M, 2, HEADS, Dh).permute(2, 0, 3, 1, 4)
        h = self.attn(q, kv[0], kv[1]).permute(0, 2, 1, 3).reshape(B, N, E)
        x = x + self.ca_out(h)

        h = (1 + scale_mlp) * self.ln2(x) + shift_mlp
        x = x + gate_mlp * self.fc2(tF.gelu(self.fc1(h)))
        return x


class TorchDirect(tnn.Module):
    """Oracle for DirectCTRegression at the test config: stem plan for 32³ is
    one stride-2 conv (1→8) + GN(8) + SiLU + projection conv (8→32), 16³=4096
    tokens, one ViT block, LN + head, ×2 trilinear upsample
    (align_corners=True, hybrid_vit_backbone.py:272)."""

    def __init__(self):
        super().__init__()
        self.enc = TorchXrayCond()
        self.seed = tnn.Parameter(torch.randn(1, 1, *VOL) * 0.01)
        self.stem0 = tnn.Conv3d(1, 8, 3, 2, 1)
        self.gn0 = tnn.GroupNorm(8, 8)
        self.proj = tnn.Conv3d(8, E, 3, 1, 1)
        self.pos = tnn.Parameter(torch.randn(1, 16 ** 3, E) * 0.02)
        self.block = TorchBlock()
        self.ln = tnn.LayerNorm(E)
        self.head = tnn.Linear(E, 1)

    def forward(self, xrays):
        B = xrays.shape[0]
        _, cond, feats = self.enc(xrays, torch.zeros(B, 256))
        ctx = feats.permute(0, 2, 3, 1).reshape(B, -1, E)

        x = self.seed.expand(B, -1, -1, -1, -1)
        h = tF.silu(self.gn0(self.stem0(x)))
        h = self.proj(h)                                        # (B, E, 16, 16, 16)
        tokens = h.permute(0, 2, 3, 4, 1).reshape(B, -1, E) + self.pos
        tokens = self.block(tokens, ctx, cond)
        out = self.head(self.ln(tokens)).reshape(B, 16, 16, 16, 1).permute(0, 4, 1, 2, 3)
        return tF.interpolate(out, size=VOL, mode="trilinear", align_corners=True)


def _np(t):
    return t.detach().numpy()


def _conv2d(w):
    return np.transpose(_np(w), (2, 3, 1, 0))  # OIHW → HWIO


def _conv3d(w):
    return np.transpose(_np(w), (2, 3, 4, 1, 0))  # OIDHW → DHWIO


def _lin(w):
    return _np(w).T


def _dense(mod, bias=True):
    d = {"kernel": _lin(mod.weight)}
    if bias:
        d["bias"] = _np(mod.bias)
    return d


def _norm(mod):
    return {"scale": _np(mod.weight), "bias": _np(mod.bias)}


def torch_to_jax_variables(tm: TorchDirect):
    enc, blk = tm.enc, tm.block
    params = {
        "initial_volume": np.transpose(_np(tm.seed), (0, 2, 3, 4, 1)),
        "xray_encoder": {
            "Conv_0": {"kernel": _conv2d(enc.conv1.weight), "bias": _np(enc.conv1.bias)},
            "BatchNorm_0": _norm(enc.bn1),
            "Conv_1": {"kernel": _conv2d(enc.conv2.weight), "bias": _np(enc.conv2.bias)},
            "BatchNorm_1": _norm(enc.bn2),
            "Conv_2": {"kernel": _conv2d(enc.conv3.weight), "bias": _np(enc.conv3.bias)},
            "BatchNorm_2": _norm(enc.bn3),
            "to_cond": _dense(enc.to_cond),
            "Dense_0": _dense(enc.time1),
            "Dense_1": _dense(enc.time2),
        },
        "vit_backbone": {
            "Conv_0": {"kernel": _conv3d(tm.stem0.weight), "bias": _np(tm.stem0.bias)},
            "GroupNorm_0": _norm(tm.gn0),
            "Conv_1": {"kernel": _conv3d(tm.proj.weight), "bias": _np(tm.proj.bias)},
            "pos_embed": _np(tm.pos),
            "HybridViTBlock3D_0": {
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
            },
            "LayerNorm_0": _norm(tm.ln),
            "Dense_0": _dense(tm.head),
        },
    }
    batch_stats = {
        "xray_encoder": {
            f"BatchNorm_{i}": {"mean": _np(bn.running_mean), "var": _np(bn.running_var)}
            for i, bn in enumerate([enc.bn1, enc.bn2, enc.bn3])
        }
    }
    to_jnp = lambda tree: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)
    return {"params": to_jnp(params), "batch_stats": to_jnp(batch_stats)}


class TestFullModelParity:
    def test_direct_regression_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TorchDirect().eval()
        # randomize BN running stats so inference normalization is exercised
        with torch.no_grad():
            for bn in [tm.enc.bn1, tm.enc.bn2, tm.enc.bn3]:
                bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
                bn.running_var.copy_(1.0 + 0.3 * torch.rand_like(bn.running_var))
            # At the production init scale (N(0, 0.01)) the stem GroupNorm's
            # variance is ~eps-sized, a catastrophic-cancellation regime where
            # var = E[x²]−E[x]² legitimately differs ~1e-4 between frameworks
            # (init-only artifact: trained stems see non-constant input). Use
            # a unit-scale seed so the parity check measures the math, not
            # that degeneracy.
            tm.seed.copy_(torch.randn_like(tm.seed))

        jm = DirectCTRegression(volume_size=VOL, voxel_dim=E, vit_depth=1, num_heads=HEADS,
                                xray_feature_dim=E, attn_impl="xla")
        variables = torch_to_jax_variables(tm)

        # the mapped tree must be structurally identical to a fresh init
        template = jax.eval_shape(
            lambda: jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 1, XR, XR)))
        )
        t_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_flatten_with_path(template)[0]}
        m_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
        assert t_paths == m_paths, set(t_paths.items()) ^ set(m_paths.items())

        xr = rng.normal(0, 1, (2, 2, 1, XR, XR)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(xr)).numpy()
        got = np.asarray(jm.apply(variables, jnp.asarray(xr), train=False))

        assert got.shape == want.shape == (2, 1, *VOL)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

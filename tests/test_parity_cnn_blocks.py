"""CNN-family block parity vs PyTorch oracles.

Completes the torch-golden parity chain for the CNN decoder family
(model_direct128_h200.py / model_direct256_b200.py): the reference's
ResidualDenseBlock (model_direct128_h200.py:45-73) and CBAM
(model_direct256_b200.py:31-65) are re-implemented verbatim in torch,
their randomly-initialized weights are mapped into the flax modules, and
forwards must agree. Together with tests/test_parity_model.py (direct ViT
family) and tests/test_parity_cascade.py (3-stage cascade) this covers every
model family's building blocks at the weights-equal level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from hybrid_vit_cascade_tpu.models import CBAM, ResidualDenseBlock

torch.manual_seed(0)


def _np(t):
    return t.detach().numpy()


def _conv3d(w):
    return np.transpose(_np(w), (2, 3, 4, 1, 0))  # OIDHW → DHWIO


def _norm(mod):
    return {"scale": _np(mod.weight), "bias": _np(mod.bias)}


class TorchRDB(tnn.Module):
    """Oracle for ResidualDenseBlock (model_direct128_h200.py:45-73)."""

    def __init__(self, in_channels, growth_rate, num_layers):
        super().__init__()
        self.layers = tnn.ModuleList()
        for i in range(num_layers):
            layer_channels = in_channels + i * growth_rate
            g = min(8, growth_rate)
            while growth_rate % g != 0:
                g -= 1
            self.layers.append(tnn.Sequential(
                tnn.Conv3d(layer_channels, growth_rate, 3, padding=1),
                tnn.GroupNorm(g, growth_rate),
                tnn.GELU(),
            ))
        self.compress = tnn.Conv3d(in_channels + num_layers * growth_rate, in_channels, 1)

    def forward(self, x):
        feats = [x]
        for layer in self.layers:
            feats.append(layer(torch.cat(feats, dim=1)))
        return x + self.compress(torch.cat(feats, dim=1))


class TorchCBAM(tnn.Module):
    """Oracle for CBAM (model_direct256_b200.py:31-65)."""

    def __init__(self, channels, reduction):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Conv3d(channels, channels // reduction, 1, bias=False),
            tnn.ReLU(),
            tnn.Conv3d(channels // reduction, channels, 1, bias=False),
        )
        self.conv_spatial = tnn.Conv3d(2, 1, 7, padding=3, bias=False)

    def forward(self, x):
        avg = self.fc(x.mean(dim=(2, 3, 4), keepdim=True))
        mx = self.fc(x.amax(dim=(2, 3, 4), keepdim=True))
        x = x * torch.sigmoid(avg + mx)
        sp = torch.cat([x.mean(dim=1, keepdim=True),
                        x.max(dim=1, keepdim=True).values], dim=1)
        return x * torch.sigmoid(self.conv_spatial(sp))


class TestCNNBlockParity:
    def test_rdb_matches_torch(self, rng):
        C, G, L = 16, 8, 3
        tm = TorchRDB(C, G, L).eval()
        params = {}
        for i, layer in enumerate(tm.layers):
            params[f"Conv_{i}"] = {"kernel": _conv3d(layer[0].weight),
                                   "bias": _np(layer[0].bias)}
            params[f"GroupNorm_{i}"] = _norm(layer[1])
        params[f"Conv_{L}"] = {"kernel": _conv3d(tm.compress.weight),
                               "bias": _np(tm.compress.bias)}
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

        x = rng.standard_normal((2, C, 6, 6, 6)).astype(np.float32)
        want = _np(tm(torch.from_numpy(x)))
        jm = ResidualDenseBlock(growth_rate=G, num_layers=L)
        got = jm.apply({"params": params},
                       jnp.moveaxis(jnp.asarray(x), 1, -1))
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_cbam_matches_torch(self, rng):
        C, R = 16, 4
        tm = TorchCBAM(C, R).eval()
        params = {
            # torch 1×1 Conv3d (O, I, 1, 1, 1) → flax Dense kernel (I, O)
            "Dense_0": {"kernel": _np(tm.fc[0].weight)[:, :, 0, 0, 0].T},
            "Dense_1": {"kernel": _np(tm.fc[2].weight)[:, :, 0, 0, 0].T},
            "Conv_0": {"kernel": _conv3d(tm.conv_spatial.weight)},
        }
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

        x = rng.standard_normal((2, C, 8, 8, 8)).astype(np.float32)
        want = _np(tm(torch.from_numpy(x)))
        got = CBAM(reduction=R).apply({"params": params},
                                      jnp.moveaxis(jnp.asarray(x), 1, -1))
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

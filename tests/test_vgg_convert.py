"""VGG16 weight-conversion parity: torchvision layout → flax pytree.

ImageNet weights are unobtainable offline, so these tests build a SYNTHETIC
randomly-initialized torch VGG16 conv prefix with the exact torchvision module
layout (`features.N.*` keys, loss_multiscale.py:63-77) and prove the converter
+ the flax _VGG16Features stack reproduce torch's tap activations bit-close.
With that plumbing green, exact reference parity is a weight-file drop away
(VERDICT round-2 item 5)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from hybrid_vit_cascade_tpu.losses.multiscale import (TriPlanarPerceptualLoss,
                                                      _VGG16Features)
from hybrid_vit_cascade_tpu.losses.vgg_weights import (convert_torch_state_dict,
                                                       load_vgg16_variables,
                                                       save_vgg16_variables)


class _TorchVGGPrefix(nn.Module):
    """torchvision vgg16().features[:16] layout (conv indices 0,2,5,7,10,12,14)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(inplace=False),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(inplace=False),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(inplace=False),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(inplace=False),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(inplace=False),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=False),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=False),
        )

    def taps(self, x):
        """relu1_2 / relu2_2 / relu3_3 — the reference's features[:4]/[:9]/[:16]."""
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (3, 8, 15):
                out.append(x)
        return out


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = _TorchVGGPrefix().eval()
    return net


def test_converted_shapes_match_flax_init(torch_net):
    variables = convert_torch_state_dict(torch_net.state_dict())
    import jax

    ref = _VGG16Features().init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    got_shapes = jax.tree.map(lambda a: a.shape, variables)
    want_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == want_shapes


def test_tap_activations_match_torch(torch_net):
    """Converted flax stack == torch stack on the same input (fp32, CPU)."""
    variables = convert_torch_state_dict(torch_net.state_dict())
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_net.taps(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = _VGG16Features().apply(variables, jnp.asarray(x))
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        w = w.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-4)


def test_npz_round_trip_and_loss_plumbing(torch_net, tmp_path):
    """save → load → TriPlanarPerceptualLoss(variables=...) produces the same
    loss as the in-memory conversion, and a different value from the
    random-filter default (i.e. the weights actually take effect)."""
    variables = convert_torch_state_dict(torch_net.state_dict())
    path = str(tmp_path / "vgg16.npz")
    save_vgg16_variables(variables, path)
    loaded = load_vgg16_variables(path)

    rng = np.random.default_rng(5)
    pred = jnp.asarray(rng.standard_normal((1, 1, 16, 16, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 1, 16, 16, 16)), jnp.float32)

    l_mem = float(TriPlanarPerceptualLoss(variables=variables)(pred, tgt))
    l_npz = float(TriPlanarPerceptualLoss(variables=loaded)(pred, tgt))
    l_rand = float(TriPlanarPerceptualLoss()(pred, tgt))
    assert l_mem == pytest.approx(l_npz, rel=1e-6)
    assert l_npz != pytest.approx(l_rand, rel=1e-3)


def test_converter_rejects_non_vgg():
    with pytest.raises((KeyError, ValueError)):
        convert_torch_state_dict({"features.0.weight": np.zeros((4, 3, 3, 3))})

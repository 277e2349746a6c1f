"""Feature-first (NCDHW) conv/GroupNorm vs channels-last flax goldens."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from hybrid_vit_cascade_tpu.ops.conv3d import ConvNCDHW, GroupNormNCDHW

KEY = jax.random.PRNGKey(0)


class TestConvNCDHW:
    def test_matches_torch_conv3d(self, rng):
        x = rng.standard_normal((2, 3, 8, 9, 10)).astype(np.float32)  # (B, C, D, H, W)
        m = ConvNCDHW(features=5, kernel_size=3, stride=1, padding=1)
        v = m.init(KEY, jnp.asarray(x))
        out = m.apply(v, jnp.asarray(x))

        w = np.asarray(v["params"]["kernel"])  # (O, I, k, k, k) == torch layout
        b = np.asarray(v["params"]["bias"])
        want = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1).numpy()
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    def test_stride2_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 16)), jnp.float32)
        m = ConvNCDHW(features=8, kernel_size=3, stride=2, padding=1)
        v = m.init(KEY, x)
        assert m.apply(v, x).shape == (1, 8, 8, 8, 8)


class TestGroupNormNCDHW:
    def test_matches_torch_groupnorm(self, rng):
        x = rng.standard_normal((2, 8, 5, 6, 7)).astype(np.float32)
        m = GroupNormNCDHW(num_groups=4)
        v = m.init(KEY, jnp.asarray(x))
        out = m.apply(v, jnp.asarray(x))
        want = F.group_norm(torch.from_numpy(x), 4).numpy()
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


class TestStage3NCDHWIntegration:
    def test_stage3_forward_and_grad_tiny(self, rng):
        from hybrid_vit_cascade_tpu.models import Stage3Refiner256

        s3 = Stage3Refiner256(volume_size=(32, 32, 32), voxel_dim=32, vit_depth=1, num_heads=4,
                              xray_feature_dim=32, remat=True)
        vol128 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)), jnp.float32)
        feats = jnp.ones((1, 4, 4, 32))
        cond = jnp.ones((1, 1024))
        v = s3.init(KEY, vol128, feats, cond)
        out = s3.apply(v, vol128, feats, cond)
        assert out.shape == (1, 32, 32, 32, 1)

        def loss(params):
            return (s3.apply({"params": params}, vol128, feats, cond, train=True,
                             rngs={"dropout": KEY}) ** 2).sum()

        g = jax.grad(loss)(v["params"])
        assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

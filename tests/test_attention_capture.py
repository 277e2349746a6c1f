"""Cross-attention weight capture (reference vit_components.py:63-108
store_attention/attention_weights) feeding DiagnosticLosses' entropy/sparsity
terms (diagnostic_losses.py:357-385) from a REAL forward pass."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_vit_cascade_tpu.losses.diagnostics import DiagnosticLosses
from hybrid_vit_cascade_tpu.models import DirectCTRegression, collect_attention_maps
from hybrid_vit_cascade_tpu.models.cascade import Stage1Base64


class TestAttentionCapture:
    def test_capture_shapes_and_diagnostics(self, rng):
        model = Stage1Base64(volume_size=(8, 8, 8), voxel_dim=32, vit_depth=2, num_heads=4,
                             xray_feature_dim=32, attn_impl="xla", store_attention=True)
        xr = jnp.asarray(rng.normal(0, 1, (2, 2, 1, 64, 64)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), xr)

        out, st = model.apply(variables, xr, mutable=["intermediates"])
        maps = collect_attention_maps(st["intermediates"])
        assert "cross_attention" in maps
        attn = maps["cross_attention"]
        # stage-1 at 8³: 8³ voxel tokens (stem stride 1); ctx = 64²/8/4-downsampled²
        assert attn.shape[0] == 2 and attn.shape[1] == 4 and attn.shape[2] == 512
        # rows are probability distributions
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-4, atol=1e-4)

        # the previously-unreachable diagnostics branch now gets real maps
        diag = DiagnosticLosses(use_perceptual=False, use_feature_metrics=False)
        vol = jnp.moveaxis(out, -1, 1)
        target = jnp.asarray(rng.normal(0, 0.3, vol.shape), jnp.float32)
        losses = diag(vol, target, vol, target, xr, attention_maps=maps)
        assert float(losses["cross_attention_align"]) > 0.0
        assert np.isfinite(float(losses["cross_attention_align"]))
        assert float(losses["cross_attention_sparsity"]) < 0.0

    def test_no_capture_by_default(self, rng):
        model = DirectCTRegression(volume_size=(8, 8, 8), voxel_dim=32, vit_depth=1,
                                   num_heads=4, xray_feature_dim=32, attn_impl="xla")
        xr = jnp.asarray(rng.normal(0, 1, (1, 2, 1, 64, 64)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), xr)
        _, st = model.apply(variables, xr, mutable=["intermediates"])
        assert collect_attention_maps(st.get("intermediates", {})) == {}

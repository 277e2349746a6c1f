"""Shape/behavior tests for the model families (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_vit_cascade_tpu import models


KEY = jax.random.PRNGKey(0)


def _xrays(b=1, size=64):
    return jnp.asarray(np.random.default_rng(0).standard_normal((b, 2, 1, size, size)), jnp.float32)


class TestViTBackbone:
    @pytest.mark.parametrize("size,expect_tokens", [(16, 16 ** 3), (32, (32 // 2) ** 3)])
    def test_backbone_shapes(self, size, expect_tokens):
        m = models.HybridViT3D(
            volume_size=(size,) * 3, in_channels=1, voxel_dim=32, depth=1, num_heads=4,
            context_dim=16, cond_dim=32,
        )
        x = jnp.ones((1, size, size, size, 1))
        ctx = jnp.ones((1, 8, 16))
        cond = jnp.ones((1, 32))
        variables = m.init(KEY, x, ctx, cond)
        out = m.apply(variables, x, ctx, cond)
        assert out.shape == (1, size, size, size, 1)

    def test_token_budget_consistent_at_all_reference_sizes(self):
        # The reference crashes at 128³ (pos-embed 25³ vs stem 32³); ours must not.
        from hybrid_vit_cascade_tpu.models.vit3d import _stem_plan

        for size, want_tokens in [(64, 16), (128, 16), (256, 32)]:
            _, _, down = _stem_plan((size,) * 3, 1, 64)
            assert down == (want_tokens,) * 3, (size, down)

    def test_remat_backbone_grads(self):
        # remat path (stage-3 / torch checkpoint equivalent) must be differentiable
        m = models.HybridViT3D(volume_size=(16,) * 3, in_channels=1, voxel_dim=32, depth=1,
                               num_heads=4, context_dim=16, cond_dim=32, remat=True)
        x = jnp.ones((1, 16, 16, 16, 1))
        ctx = jnp.ones((1, 8, 16))
        cond = jnp.ones((1, 32))
        v = m.init(KEY, x, ctx, cond)

        def loss(params):
            out = m.apply({"params": params}, x, ctx, cond)
            return (out ** 2).sum()

        g = jax.grad(loss)(v["params"])
        assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

    def test_remat_modes_checkpoint_compatible(self, rng):
        """remat off / per-block / mlp-only must produce IDENTICAL param
        trees (checkpoints interchange) and matching outputs+grads —
        nn.remat's auto-name would otherwise prefix 'Checkpoint' and break
        cross-mode restore."""
        kw = dict(volume_size=(16,) * 3, in_channels=1, voxel_dim=32, depth=2,
                  num_heads=4, context_dim=16, cond_dim=32, attn_impl="xla")
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 16, 1)), jnp.float32)
        ctx = jnp.asarray(rng.normal(0, 1, (1, 8, 16)), jnp.float32)
        cond = jnp.asarray(rng.normal(0, 1, (1, 32)), jnp.float32)
        m0 = models.HybridViT3D(**kw, remat=False)
        v = m0.init(KEY, x, ctx, cond)
        base = np.asarray(m0.apply(v, x, ctx, cond))
        g0 = jax.grad(lambda p: (m0.apply({"params": p}, x, ctx, cond) ** 2).sum())(v["params"])
        for mode in ("block", "mlp"):
            m = models.HybridViT3D(**kw, remat=True, remat_mode=mode)
            v2 = m.init(KEY, x, ctx, cond)
            assert jax.tree.structure(v) == jax.tree.structure(v2), mode
            np.testing.assert_allclose(np.asarray(m.apply(v, x, ctx, cond)), base,
                                       rtol=1e-6, atol=1e-6)
            g = jax.grad(lambda p, m=m: (m.apply({"params": p}, x, ctx, cond) ** 2).sum())(v["params"])
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def test_prev_stage_embedding(self):
        m = models.HybridViTBlock3D(voxel_dim=32, num_heads=4, context_dim=16, cond_dim=32, use_prev_stage=True)
        x = jnp.ones((2, 10, 32))
        ctx = jnp.ones((2, 4, 16))
        cond = jnp.ones((2, 32))
        prev = jnp.ones((2, 256))
        v = m.init(KEY, x, ctx, cond, prev)
        out = m.apply(v, x, ctx, cond, prev)
        assert out.shape == x.shape
        out_no_prev = m.apply(v, x, ctx, cond, None)
        assert out_no_prev.shape == x.shape


class TestDirect:
    def test_direct_forward(self):
        m = models.DirectCTRegression(volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                                      xray_feature_dim=32)
        xr = _xrays(2, 64)
        variables = m.init(KEY, xr)
        out = m.apply(variables, xr)
        assert out.shape == (2, 1, 16, 16, 16)
        assert "batch_stats" in variables

    def test_direct_train_mode_mutates_batch_stats(self):
        m = models.DirectCTRegression(volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                                      xray_feature_dim=32)
        xr = _xrays(2, 64)
        variables = m.init(KEY, xr)
        out, updates = m.apply(
            variables, xr, train=True, mutable=["batch_stats"], rngs={"dropout": KEY}
        )
        assert out.shape == (2, 1, 16, 16, 16)
        assert "batch_stats" in updates


class TestCascade:
    def _model(self):
        return models.ProgressiveCascadeModel(xray_feature_dim=32, voxel_dim=32)

    def test_full_cascade_tiny(self):
        # Tiny spatial config by monkey-free means: full-size stages are too big
        # for CPU tests, so we exercise stage classes directly at small sizes.
        s1 = models.Stage1Base64(volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                                 xray_feature_dim=32)
        xr = _xrays(1, 64)
        v1 = s1.init(KEY, xr)
        vol64 = s1.apply(v1, xr)
        assert vol64.shape == (1, 16, 16, 16, 1)

        s2 = models.Stage2Refiner128(volume_size=(32, 32, 32), voxel_dim=32, vit_depth=1, num_heads=4,
                                     xray_feature_dim=32)
        feats = jnp.ones((1, 4, 4, 32))
        cond = jnp.ones((1, 1024))
        v2 = s2.init(KEY, vol64, feats, cond)
        vol128 = s2.apply(v2, vol64, feats, cond)
        assert vol128.shape == (1, 32, 32, 32, 1)

        s3 = models.Stage3Refiner256(volume_size=(64, 64, 64), voxel_dim=32, vit_depth=1, num_heads=4,
                                     xray_feature_dim=32, remat=False)
        v3 = s3.init(KEY, vol128, feats, cond)
        vol256 = s3.apply(v3, vol128, feats, cond)
        assert vol256.shape == (1, 64, 64, 64, 1)


class TestCNNFamily:
    def test_rdb_residual_dense_block(self, rng):
        m = models.ResidualDenseBlock(growth_rate=8, num_layers=2)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 16)), jnp.float32)
        v = m.init(KEY, x)
        out = m.apply(v, x)
        assert out.shape == x.shape

    def test_cbam(self, rng):
        m = models.CBAM(reduction=4)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 16)), jnp.float32)
        v = m.init(KEY, x)
        out = m.apply(v, x)
        assert out.shape == x.shape
        assert float(jnp.abs(out).max()) <= float(jnp.abs(x).max()) + 1e-5  # attention only damps

    def test_depth_modulated_broadcast(self, rng):
        from hybrid_vit_cascade_tpu.models.cnn_models import depth_modulated_broadcast

        f = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
        out = depth_modulated_broadcast(f, 8, modulate=True)
        assert out.shape == (1, 8, 8, 8, 8)
        flat = depth_modulated_broadcast(f, 8, modulate=False)
        # unmodulated: identical across depth
        np.testing.assert_allclose(np.asarray(flat[:, 0]), np.asarray(flat[:, 5]))

    # full 128³/256³ CNN forwards are too slow for CPU CI: verify the whole
    # graph at shape level (still builds/checks every layer's shapes)
    def test_direct128_h200_shapes(self):
        m = models.Direct128ModelH200(xray_feature_dim=32, num_rdb=1, remat=False)
        xr = jax.ShapeDtypeStruct((1, 2, 1, 64, 64), jnp.float32)
        v = jax.eval_shape(lambda x: m.init(KEY, x), xr)
        out = jax.eval_shape(lambda p, x: m.apply(p, x), v, xr)
        assert out.shape == (1, 1, 128, 128, 128)

    def test_direct256_h200_shapes(self):
        m = models.Direct256ModelH200(xray_feature_dim=32, num_rdb=1, remat=False)
        xr = jax.ShapeDtypeStruct((1, 2, 1, 64, 64), jnp.float32)
        v = jax.eval_shape(lambda x: m.init(KEY, x), xr)
        out = jax.eval_shape(lambda p, x: m.apply(p, x), v, xr)
        assert out.shape == (1, 1, 256, 256, 256)

    def test_direct256_b200_shapes(self):
        m = models.Direct256ModelB200(remat=False)
        xr = jax.ShapeDtypeStruct((1, 2, 1, 64, 64), jnp.float32)
        v = jax.eval_shape(lambda x: m.init(KEY, x), xr)
        out = jax.eval_shape(lambda p, x: m.apply(p, x), v, xr)
        assert out.shape == (1, 1, 256, 256, 256)


class TestDiffusion:
    def test_schedule_tables(self):
        sched = models.NoiseSchedule(num_timesteps=100)
        sa, so = sched.tables()
        assert sa.shape == (100,)
        np.testing.assert_allclose(np.asarray(sa) ** 2 + np.asarray(so) ** 2, 1.0, rtol=1e-5)
        assert float(sa[0]) > 0.99 and float(sa[-1]) < 0.2

    def test_unified_forward_loss(self):
        cfgs = (
            dict(name="stage1_low", volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                 use_depth_lifting=True, use_physics_loss=True),
        )
        m = models.UnifiedHybridViTCascade(stage_configs=cfgs, xray_embed_dim=32, num_timesteps=10)
        x0 = jnp.zeros((1, 1, 16, 16, 16))
        xr = _xrays(1, 64)
        v = m.init(KEY, x0, xr, "stage1_low", KEY)
        out = m.apply(v, x0, xr, "stage1_low", jax.random.PRNGKey(1))
        assert set(out) == {"loss", "diffusion_loss", "physics_loss"}
        assert np.isfinite(float(out["loss"]))

    def test_depth_lifter_streamed_matches_dense(self, rng):
        """lift_slabs depth-streaming: identical params, fwd within fp32
        noise of the dense fusion path, matching grads (the two-pass GN +
        halo scheme of depth_lifting._fused_streamed)."""
        from hybrid_vit_cascade_tpu.models.depth_lifting import CascadedDepthLifting

        D, H, W, C = 16, 8, 8, 32
        feats = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        prev = jnp.asarray(rng.standard_normal((2, 8, H, W, 1)), jnp.float32)
        dense = CascadedDepthLifting(feature_dim=C, depth_sizes=(8, 16), lift_slabs=0)
        streamed = CascadedDepthLifting(feature_dim=C, depth_sizes=(8, 16), lift_slabs=4)
        v = dense.init(KEY, feats, D, prev)
        assert jax.tree_util.tree_structure(
            streamed.init(KEY, feats, D, prev)) == jax.tree_util.tree_structure(v)
        want = dense.apply(v, feats, D, prev)
        got = streamed.apply(v, feats, D, prev)
        assert want.shape == got.shape == (2, D, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

        def loss(vs, mod):
            return jnp.sum(mod.apply(vs, feats, D, prev) ** 2)

        gd = jax.grad(lambda vs: loss(vs, dense))(v)
        gs = jax.grad(lambda vs: loss(vs, streamed))(v)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gd),
                                   jax.tree_util.tree_leaves_with_path(gs)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
                                       err_msg=str(pa))

    def test_depth_lifter_streamed_one_channel_prev_equals_broadcast(self, rng):
        """The lazily-broadcast 1-channel prev equals the pre-broadcast
        C-channel prev (trilinear resize is per-channel)."""
        from hybrid_vit_cascade_tpu.models.depth_lifting import CascadedDepthLifting

        D, H, W, C = 8, 4, 4, 32
        feats = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
        prev1 = jnp.asarray(rng.standard_normal((1, 4, H, W, 1)), jnp.float32)
        prevC = jnp.broadcast_to(prev1, prev1.shape[:-1] + (C,))
        mod = CascadedDepthLifting(feature_dim=C, depth_sizes=(4, 8))
        v = mod.init(KEY, feats, D, prev1)
        a = mod.apply(v, feats, D, prev1)
        b = mod.apply(v, feats, D, prevC)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_unified_refiner_lift_slabs_matches_dense(self, rng):
        """lift_slabs plumbing through the full ladder: a refiner stage's
        diffusion loss with the streamed lifter equals the dense one."""
        cfgs = (
            dict(name="s1", volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                 use_depth_lifting=True, use_physics_loss=False),
            dict(name="s2", volume_size=(32, 32, 32), voxel_dim=32, vit_depth=1, num_heads=4,
                 use_depth_lifting=True, use_physics_loss=False),
        )
        x0 = jnp.asarray(rng.standard_normal((1, 1, 32, 32, 32)) * 0.3, jnp.float32)
        prev = jnp.asarray(rng.standard_normal((1, 1, 16, 16, 16)) * 0.3, jnp.float32)
        xr = _xrays(1, 64)
        outs = {}
        for slabs in (0, 4):
            m = models.UnifiedHybridViTCascade(
                stage_configs=cfgs, xray_embed_dim=32, num_timesteps=10, lift_slabs=slabs)
            v = m.init(KEY, x0, xr, "s2", KEY, prev_stage_volume=prev)
            outs[slabs] = (v, m.apply(v, x0, xr, "s2", jax.random.PRNGKey(3),
                                      prev_stage_volume=prev))
        assert jax.tree_util.tree_structure(outs[0][0]) == jax.tree_util.tree_structure(outs[4][0])
        np.testing.assert_allclose(float(outs[4][1]["loss"]), float(outs[0][1]["loss"]),
                                   rtol=1e-4)

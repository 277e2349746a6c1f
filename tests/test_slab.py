"""D-slab streamed conv/GroupNorm chains (ops/slab.py) vs the dense path.

The slab scheduler must be numerically identical (same math, different
materialization) in both values and gradients — it is the memory story that
lets 256³ stage-3 training fit one 16 GB chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from the default tier

from hybrid_vit_cascade_tpu.ops.slab import (
    chain_apply_dense,
    chain_apply_slab,
    chain_apply_streamed,
)


def _make_chain(rng, spec):
    """spec: list of ('conv', out, in, k, stride) | ('gn', ch, groups) | ('act', name)."""
    chain = []
    for op in spec:
        if op[0] == "conv":
            _, out_ch, in_ch, k, stride = op
            kernel = jnp.asarray(rng.normal(0, 0.3, (out_ch, in_ch, k, k, k)), jnp.float32)
            bias = jnp.asarray(rng.normal(0, 0.1, (out_ch,)), jnp.float32)
            chain.append(("conv", kernel, bias, stride))
        elif op[0] == "gn":
            _, ch, groups = op
            scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(ch,)), jnp.float32)
            bias = jnp.asarray(0.1 * rng.normal(size=(ch,)), jnp.float32)
            chain.append(("gn", groups, scale, bias))
        else:
            chain.append(op)
    return chain


STEM_SPEC = [  # mirrors Stage3ViTTrunk: upsample conv + GN/GELU + 2 stride-2 stem blocks
    ("conv", 6, 1, 3, 1), ("gn", 6, 3), ("act", "gelu"),
    ("conv", 8, 6, 3, 2), ("gn", 8, 4), ("act", "silu"),
    ("conv", 12, 8, 3, 2), ("gn", 12, 4), ("act", "silu"),
]
DETAIL_SPEC = [  # mirrors DetailEnhancer incl. the 1×1 projection
    ("conv", 6, 1, 3, 1), ("gn", 6, 2), ("act", "gelu"),
    ("conv", 4, 6, 3, 1), ("gn", 4, 2), ("act", "gelu"),
    ("conv", 1, 4, 1, 1),
]


class TestChainEquality:
    @pytest.mark.parametrize("spec,shape,num_slabs", [
        (STEM_SPEC, (1, 1, 16, 8, 8), 4),
        (STEM_SPEC, (2, 1, 32, 8, 8), 8),
        (DETAIL_SPEC, (1, 1, 16, 8, 8), 4),
        (DETAIL_SPEC, (1, 1, 16, 8, 8), 16),  # clamps: 16 slabs over D=16
    ])
    def test_values_match_dense(self, rng, spec, shape, num_slabs):
        chain = _make_chain(rng, spec)
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        dense = chain_apply_dense(x, chain)
        slab = chain_apply_slab(x, chain, num_slabs)
        assert slab.shape == dense.shape
        np.testing.assert_allclose(np.asarray(slab), np.asarray(dense), rtol=2e-5, atol=2e-5)

    def test_gradients_match_dense(self, rng):
        chain = _make_chain(rng, STEM_SPEC)
        x = jnp.asarray(rng.normal(0, 1, (1, 1, 16, 8, 8)), jnp.float32)
        cot = jnp.asarray(rng.normal(0, 1, (1, 12, 4, 2, 2)), jnp.float32)

        # differentiate wrt the array leaves only (strides/group counts/act
        # names are static)
        arrays = [p for op in chain for p in op[1:] if isinstance(p, jnp.ndarray)]

        def rebuild(arrs):
            it = iter(arrs)
            out = []
            for op in chain:
                out.append(tuple(next(it) if isinstance(p, jnp.ndarray) else p for p in op))
            return out

        def loss(fn):
            def f(x, arrs):
                return jnp.sum(fn(x, rebuild(arrs)) * cot)
            return f

        gx_d, gc_d = jax.grad(loss(lambda x, c: chain_apply_dense(x, c)), argnums=(0, 1))(x, arrays)
        gx_s, gc_s = jax.grad(loss(lambda x, c: chain_apply_slab(x, c, 4)), argnums=(0, 1))(x, arrays)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d), rtol=5e-5, atol=5e-5)
        for got, want in zip(gc_s, gc_d):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-5, atol=5e-5)

    @pytest.mark.parametrize("spec,shape,num_slabs", [
        (STEM_SPEC, (1, 1, 16, 8, 8), 4),
        (STEM_SPEC, (2, 1, 32, 8, 8), 8),
        (DETAIL_SPEC, (1, 1, 16, 8, 8), 4),
        (DETAIL_SPEC, (1, 1, 12, 8, 8), 8),  # non-divisible: clamps to 4
    ])
    def test_streamed_values_match_dense(self, rng, spec, shape, num_slabs):
        chain = _make_chain(rng, spec)
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        dense = chain_apply_dense(x, chain)
        # exercise every storage/density decision: always-store, never-store
        # (pure recompute), and tiny dense-tail cutoffs
        for kw in (dict(store_min_flops=0.0, dense_max_voxels=0),
                   dict(store_min_flops=1e30, dense_max_voxels=0),
                   dict(store_min_flops=0.0, dense_max_voxels=8 * 8 * 8)):
            got = chain_apply_streamed(x, chain, num_slabs, **kw)
            assert got.shape == dense.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                       rtol=2e-5, atol=2e-5, err_msg=str(kw))

    def test_streamed_gradients_match_dense(self, rng):
        chain = _make_chain(rng, DETAIL_SPEC)
        x = jnp.asarray(rng.normal(0, 1, (1, 1, 16, 8, 8)), jnp.float32)
        cot = jnp.asarray(rng.normal(0, 1, (1, 1, 16, 8, 8)), jnp.float32)
        arrays = [p for op in chain for p in op[1:] if isinstance(p, jnp.ndarray)]

        def rebuild(arrs):
            it = iter(arrs)
            return [tuple(next(it) if isinstance(p, jnp.ndarray) else p for p in op)
                    for op in chain]

        def loss(fn):
            return lambda x, arrs: jnp.sum(fn(x, rebuild(arrs)) * cot)

        gx_d, gc_d = jax.grad(loss(chain_apply_dense), argnums=(0, 1))(x, arrays)
        gx_s, gc_s = jax.grad(
            loss(lambda x, c: chain_apply_streamed(x, c, 4, store_min_flops=0.0,
                                                   dense_max_voxels=0)),
            argnums=(0, 1))(x, arrays)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d), rtol=5e-5, atol=5e-5)
        for got, want in zip(gc_s, gc_d):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-5, atol=5e-5)

    def test_odd_slab_count_clamps(self, rng):
        chain = _make_chain(rng, DETAIL_SPEC)
        x = jnp.asarray(rng.normal(0, 1, (1, 1, 12, 8, 8)), jnp.float32)  # 12 % 8 != 0
        dense = chain_apply_dense(x, chain)
        slab = chain_apply_slab(x, chain, 8)  # clamps to 4 slabs
        np.testing.assert_allclose(np.asarray(slab), np.asarray(dense), rtol=2e-5, atol=2e-5)


FLAT_S1_SPEC = [  # every conv Pallas-eligible at W=128 → flat-layout body
    ("conv", 6, 1, 3, 1), ("gn", 6, 3), ("act", "gelu"),
    ("conv", 4, 6, 3, 1), ("gn", 4, 2), ("act", "gelu"),
    ("conv", 2, 4, 1, 1),
]
FLAT_S2_SPEC = [  # stride-2 requires W % 256 == 0
    ("conv", 6, 1, 3, 1), ("gn", 6, 3), ("act", "gelu"),
    ("conv", 8, 6, 3, 2),
]


class TestFlatStreamedBody:
    """The flat-layout streamed body (Pallas kernels + conv-gn folding) is
    TPU-only in production; HVC_PALLAS_INTERPRET=1 runs the same code path
    on CPU through the kernels' interpret mode."""

    @pytest.mark.parametrize("act_fuse", ["0", "1"])
    @pytest.mark.parametrize("spec,shape,num_slabs", [
        (FLAT_S1_SPEC, (1, 1, 8, 4, 128), 4),
        (FLAT_S1_SPEC, (2, 1, 8, 4, 128), 2),   # B=2: conv-gn fold disabled
        (FLAT_S2_SPEC, (1, 1, 8, 4, 256), 2),
    ])
    def test_flat_values_match_dense(self, rng, monkeypatch, spec, shape,
                                     num_slabs, act_fuse):
        chain = _make_chain(rng, spec)
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        dense = chain_apply_dense(x, chain)  # XLA path (env not yet set)
        monkeypatch.setenv("HVC_PALLAS_INTERPRET", "1")
        # act_fuse=1: the kernels' in-kernel activation prologue (off by
        # default on v5e — perf; the code path must stay correct)
        monkeypatch.setenv("HVC_ACT_FUSE", act_fuse)
        for kw in (dict(store_min_flops=0.0, dense_max_voxels=0),
                   dict(store_min_flops=1e30, dense_max_voxels=0)):
            got = chain_apply_streamed(x, chain, num_slabs, **kw)
            assert got.shape == dense.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                       rtol=2e-5, atol=2e-5, err_msg=str(kw))

    @pytest.mark.parametrize("act_fuse", ["0", "1"])
    def test_flat_gradients_match_dense(self, rng, monkeypatch, act_fuse):
        chain = _make_chain(rng, FLAT_S1_SPEC)
        x = jnp.asarray(rng.normal(0, 1, (1, 1, 8, 4, 128)), jnp.float32)
        cot = jnp.asarray(rng.normal(0, 1, (1, 2, 8, 4, 128)), jnp.float32)
        arrays = [p for op in chain for p in op[1:] if isinstance(p, jnp.ndarray)]

        def rebuild(arrs):
            it = iter(arrs)
            return [tuple(next(it) if isinstance(p, jnp.ndarray) else p for p in op)
                    for op in chain]

        def loss(fn):
            return lambda x, arrs: jnp.sum(fn(x, rebuild(arrs)) * cot)

        gx_d, gc_d = jax.grad(loss(chain_apply_dense), argnums=(0, 1))(x, arrays)
        monkeypatch.setenv("HVC_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("HVC_ACT_FUSE", act_fuse)
        # always-store exercises the endpoint-sums VJP branch; never-store
        # (pure recompute) exercises the plain chain-conv VJP branch
        for smf in (0.0, 1e30):
            gx_s, gc_s = jax.grad(
                loss(lambda x, c, smf=smf: chain_apply_streamed(
                    x, c, 4, store_min_flops=smf, dense_max_voxels=0)),
                argnums=(0, 1))(x, arrays)
            np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                                       rtol=5e-5, atol=5e-5)
            for got, want in zip(gc_s, gc_d):
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           rtol=5e-5, atol=5e-5)


class TestStage3SlabParity:
    def test_stage3_refiner_slab_vs_dense(self, rng):
        """Same params, same output: the slab flag is a pure scheduling
        choice, so checkpoints interchange between train (slab) and
        inference (dense)."""
        from hybrid_vit_cascade_tpu.models.cascade import Stage3Refiner256

        kw = dict(volume_size=(32, 32, 32), voxel_dim=32, vit_depth=1, num_heads=4,
                  xray_feature_dim=16, attn_impl="xla")
        # eval_schedule='train' pins the per-call schedule to the configured
        # flags (the default 'auto' would route BOTH models through the
        # eval-tuned streamed path, defeating the A/B)
        dense_m = Stage3Refiner256(**kw, remat=False, slab_scan=False, eval_schedule="train")
        slab_m = Stage3Refiner256(**kw, remat=False, slab_scan=True, slab_count=4,
                                  eval_schedule="train")
        auto_m = Stage3Refiner256(**kw, remat=False)  # production eval default

        vol = jnp.asarray(rng.normal(0, 0.5, (1, 16, 16, 16, 1)), jnp.float32)
        feats = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 16)), jnp.float32)
        cond = jnp.asarray(rng.normal(0, 1, (1, 1024)), jnp.float32)

        variables = dense_m.init(jax.random.PRNGKey(0), vol, feats, cond)
        v2 = slab_m.init(jax.random.PRNGKey(0), vol, feats, cond)
        assert jax.tree.structure(variables) == jax.tree.structure(v2), "param trees must match"

        out_d = dense_m.apply(variables, vol, feats, cond)
        out_s = slab_m.apply(variables, vol, feats, cond)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), rtol=3e-5, atol=3e-5)
        # the auto eval schedule (streamed, slabs=1, store-all) is a pure
        # scheduling choice too: same params, same output
        out_a = auto_m.apply(variables, vol, feats, cond)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d), rtol=3e-5, atol=3e-5)

    def test_stage3_slab_gradients_finite(self, rng):
        from hybrid_vit_cascade_tpu.models.cascade import Stage3Refiner256

        m = Stage3Refiner256(volume_size=(16, 16, 16), voxel_dim=32, vit_depth=1, num_heads=4,
                             xray_feature_dim=16, attn_impl="xla", remat=False,
                             slab_scan=True, slab_count=4)
        vol = jnp.asarray(rng.normal(0, 0.5, (1, 8, 8, 8, 1)), jnp.float32)
        feats = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 16)), jnp.float32)
        cond = jnp.asarray(rng.normal(0, 1, (1, 1024)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), vol, feats, cond)

        def loss(params):
            out = m.apply({"params": params}, vol, feats, cond)
            return jnp.mean(out ** 2)

        grads = jax.grad(loss)(variables["params"])
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

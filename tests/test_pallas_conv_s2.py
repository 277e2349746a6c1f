"""Goldens for the Pallas stride-2 implicit-GEMM conv
(ops/pallas/conv3d_k3s2.py) against XLA's conv_general_dilated, forward and
VJP, on CPU interpret mode — the same kernel code that compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from the default tier
from jax import lax

from hybrid_vit_cascade_tpu.ops.pallas.conv3d_k3s2 import (
    conv3d_k3s2_same,
    conv3d_k3s2_valid_d,
)


def _xla_s2_valid_d(x, w, bias):
    """XLA reference for the kernel's VALID-in-D contract: out plane z'
    consumes input planes 2z', 2z'+1, 2z'+2; SAME in H/W."""
    out = lax.conv_general_dilated(
        x, w, (2, 2, 2), [(0, 1), (1, 1), (1, 1)],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + bias[None, :, None, None, None]


CASES = [
    # (B, Cin, Cout, D'(out), H, W)
    (1, 32, 64, 3, 8, 256),
    (1, 16, 24, 2, 16, 256),
    (2, 8, 8, 2, 8, 512),
    (1, 1, 32, 3, 8, 256),
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_xla(case):
    B, cin, cout, dp, H, W = case
    key = jax.random.PRNGKey(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, cin, 2 * dp + 1, H, W), jnp.float32)
    w = jax.random.normal(kw, (cout, cin, 3, 3, 3), jnp.float32) * 0.1
    b = jax.random.normal(kb, (cout,), jnp.float32)

    got = conv3d_k3s2_valid_d(x, w, b)
    want = _xla_s2_valid_d(x, w, b)
    assert got.shape == want.shape == (B, cout, dp, H // 2, W // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_same_padding_wrapper_matches_xla_same():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 8, 256), jnp.float32)
    w = jax.random.normal(key, (16, 8, 3, 3, 3), jnp.float32) * 0.1
    got = conv3d_k3s2_same(x, w, None)
    want = lax.conv_general_dilated(
        x, w, (2, 2, 2), [(1, 0), (1, 1), (1, 1)],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    # torch/XLA SAME-s2 for even dims pads (1, 0): out[z'] = 2z'-1..2z'+1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("case", CASES[:2] + CASES[3:])
def test_vjp_matches_xla(case):
    B, cin, cout, dp, H, W = case
    key = jax.random.PRNGKey(2)
    kx, kw, kb, kc = jax.random.split(key, 4)
    x = jax.random.normal(kx, (B, cin, 2 * dp + 1, H, W), jnp.float32)
    w = jax.random.normal(kw, (cout, cin, 3, 3, 3), jnp.float32) * 0.1
    b = jax.random.normal(kb, (cout,), jnp.float32)
    ct = jax.random.normal(kc, (B, cout, dp, H // 2, W // 2), jnp.float32)

    def loss_p(x, w, b):
        return jnp.sum(conv3d_k3s2_valid_d(x, w, b) * ct)

    def loss_x(x, w, b):
        return jnp.sum(_xla_s2_valid_d(x, w, b) * ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for got, want, name in zip(gp, gx, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-3,
            err_msg=name)

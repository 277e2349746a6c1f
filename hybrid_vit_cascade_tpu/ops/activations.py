"""Exact-erf GELU with a bandwidth-bound half-precision fast path.

The reference uses torch ``nn.GELU()`` — the *erf* form, not the tanh
approximation (vit_components.py:93, hybrid_vit_backbone.py:205,
model_progressive.py:241/262). ``jax.nn.gelu(approximate=False)`` lowers
erf to XLA's fp32 rational approximation, whose VPU op chain makes a
whole-volume GELU pass run ~3× off the HBM roofline on v5e (measured
183 GB/s vs a 372 GB/s copy floor on the stage-3 detail-chain shape,
scripts/bench_gelu.py).

For half-precision tensors the extra precision is invisible: the
Abramowitz & Stegun 7.1.26 polynomial erf (|err| ≤ 1.5e-7 in fp32,
5 mul-adds + one exp) produces GELU outputs within ONE bf16 ulp of the
exact form (max |Δ| 2.4e-4 over [-6, 6], same script) while running at
the bandwidth floor (13.1 ms vs 23.6 ms on a 64ch × 258-plane 256² slab).
The custom JVP shares the single exp(-x²/2) between Φ(x) and φ(x), so the
backward is one poly + one exp instead of XLA's erf-grad chain.

fp32 inputs keep ``jax.nn.gelu(approximate=False)`` bit-for-bit — CPU
goldens and the torch parity oracles are untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327
# A&S 7.1.26 coefficients
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911


def _erf_parts(xf: jnp.ndarray):
    """(erf(x·√½), exp(-x²/2)) via the A&S 7.1.26 polynomial, fp32."""
    z = jnp.abs(xf) * _SQRT_HALF
    t = 1.0 / (1.0 + _P * z)
    poly = t * (_A[0] + t * (_A[1] + t * (_A[2] + t * (_A[3] + t * _A[4]))))
    e = jnp.exp(-z * z)  # = exp(-x²/2)
    return jnp.sign(xf) * (1.0 - poly * e), e


@jax.custom_jvp
def _gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    erf, _ = _erf_parts(xf)
    return (xf * (0.5 * (1.0 + erf))).astype(x.dtype)


@_gelu_poly.defjvp
def _gelu_poly_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    erf, e = _erf_parts(xf)
    cdf = 0.5 * (1.0 + erf)
    pdf = _INV_SQRT_2PI * e
    y = (xf * cdf).astype(x.dtype)
    dy = ((cdf + xf * pdf) * dx.astype(jnp.float32)).astype(x.dtype)
    return y, dy


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.GELU()`` (erf form). Half-precision inputs route to the
    polynomial fast path (1-bf16-ulp-identical, ~1.8× faster); fp32 stays on
    XLA's exact rational erf."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return _gelu_poly(x)
    return jax.nn.gelu(x, approximate=False)

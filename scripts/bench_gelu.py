"""Microbench: exact-erf GELU variants on a stage-3-sized flat bf16 slab.

fusion.116 in the eval device trace (the detail chain's standalone GELU
pass, 64ch x 258 planes, bf16) runs at 257 GB/s -- 3x off the ~819 GB/s
HBM roofline, suggesting the VPU erf chain (jax.nn.gelu approximate=False
-> fp32 rational erf) is the bottleneck, not bandwidth. Candidates:
  a) jax.nn.gelu(approximate=False)       -- current
  b) A&S 7.1.26 erf poly (t-poly * exp)   -- 1 exp, 5 mul-adds
  c) tanh-approx gelu                      -- NOT parity (different function)
  d) pure copy (x * 1.0002)                -- bandwidth floor
"""
import time
import jax, jax.numpy as jnp

N = (1, 64, 258 * 65536)

def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).ravel()[0])

def erf_as(x):
    # Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7 in fp32
    xf = x.astype(jnp.float32)
    s = jnp.sign(xf); a = jnp.abs(xf)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))

def gelu_as(x):
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + erf_as(xf * 0.7071067811865476))).astype(x.dtype)

def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)

def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)

def copyish(x):
    return x * jnp.bfloat16(1.0002)

x = jax.random.normal(jax.random.PRNGKey(0), N, jnp.bfloat16)
for name, fn in [("exact-erf", gelu_exact), ("A&S-7.1.26", gelu_as),
                 ("tanh", gelu_tanh), ("copy-floor", copyish)]:
    f = jax.jit(fn)
    sync(f(x))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        y = f(x)
    sync(y)
    dt = (time.perf_counter() - t0) / iters * 1e3
    gbs = (2 * x.size * 2) / (dt * 1e-3) / 1e9
    print(f"{name:12s} {dt:7.2f} ms   {gbs:6.0f} GB/s")
# numeric agreement on the bf16 range that matters
xs = jnp.linspace(-6, 6, 8193, dtype=jnp.float32)
ref = jax.nn.gelu(xs, approximate=False)
alt = xs * 0.5 * (1.0 + erf_as(xs * 0.70710678))
print("A&S max abs err fp32:", float(jnp.max(jnp.abs(ref - alt))))
print("A&S max err in bf16 ulps:",
      float(jnp.max(jnp.abs(ref.astype(jnp.bfloat16).astype(jnp.float32)
                            - alt.astype(jnp.bfloat16).astype(jnp.float32)))))

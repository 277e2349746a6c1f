"""On-chip benchmark: Pallas implicit-GEMM k3s1 conv vs XLA dense conv at the
stage-3 detail-enhancer shape (64→32 at 256³, the largest conv in the
cascade: 1.85 TFLOP fwd). Measures fwd and fwd+bwd (value_and_grad)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from hybrid_vit_cascade_tpu.ops.pallas.conv3d_k3 import conv3d_k3s1_valid_d


def _sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def _time(fn, *args):
    out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    cin, cout, D, H, W = 64, 32, 256, 256, 256
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        D = 32
    x = jax.random.normal(key, (1, cin, D + 2, H, W), jnp.bfloat16)
    w = jax.random.normal(key, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.1
    b = jnp.zeros((cout,), jnp.float32)
    fl = 2.0 * cout * cin * 27 * D * H * W

    @jax.jit
    def pallas_fwd(x, w, b):
        return conv3d_k3s1_valid_d(x, w, b)

    @jax.jit
    def xla_fwd(x, w, b):
        out = lax.conv_general_dilated(
            x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        return out + b.astype(out.dtype)[None, :, None, None, None]

    for name, fn in (("pallas fwd", pallas_fwd), ("xla fwd", xla_fwd)):
        dt = _time(fn, x, w, b)
        print(f"{name:16s} {dt*1e3:8.1f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)

    ct = jax.random.normal(key, (1, cout, D, H, W), jnp.bfloat16)

    def mk_loss(conv):
        # ct must be an ARGUMENT: a closed-over device array becomes an HLO
        # constant and the ~0.5 GB payload exceeds the axon remote-compile
        # service's request limit (HTTP 413).
        @jax.jit
        def loss(x, w, b, ct):
            return jax.value_and_grad(
                lambda xx, ww, bb: jnp.sum(
                    (conv(xx, ww, bb) * ct).astype(jnp.float32)),
                argnums=(0, 1, 2))(x, w, b)
        return loss

    for name, conv in (("pallas f+b", conv3d_k3s1_valid_d), ("xla f+b", xla_fwd)):
        dt = _time(mk_loss(conv), x, w, b, ct)
        print(f"{name:16s} {dt*1e3:8.1f} ms  {3*fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

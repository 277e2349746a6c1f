"""Mesh construction and canonical shardings.

Single-axis ('data') mesh for pure DP; a second 'model' axis is reserved for
activation/sequence sharding of the 256³ stages (SURVEY.md §7 hard parts).
Multi-host: call jax.distributed.initialize() before make_mesh — the train
step is unchanged (DCN handles the cross-host segment of the collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a (data × model) mesh over all devices (default: model=1)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if data is None or data < 0:
        data = len(devs) // model
    assert data * model == len(devs), (data, model, len(devs))
    return Mesh(devs.reshape(data, model), axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard an array's leading batch axis over the 'data' mesh axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_warned_no_mesh_probe = False


def ambient_mesh() -> Optional[Mesh]:
    """The mesh installed around the jitted call — visible during tracing,
    which is when the model's sharding constraints run.

    Two context mechanisms exist in jax 0.9: the supported
    `jax.sharding.set_mesh` / `use_mesh` (read back via `get_mesh()`, which
    returns an EMPTY Mesh when unset) and the legacy `with mesh:` context
    (visible only through the deprecated thread-resources env). Probe the
    supported API first; if the legacy probe disappears in a future JAX,
    warn LOUDLY once instead of silently disabling every model-axis
    sharding path."""
    import warnings

    try:  # supported context API (set_mesh / use_mesh)
        m = jax.sharding.get_mesh()
        if m is not None and not m.empty and isinstance(m, Mesh):
            return m
    except Exception:
        pass
    try:  # legacy `with mesh:` context
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            m = pxla.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        global _warned_no_mesh_probe
        if not _warned_no_mesh_probe:
            _warned_no_mesh_probe = True
            warnings.warn(
                "jax.interpreters.pxla.thread_resources is gone in this JAX "
                "version: `with mesh:` contexts are no longer detectable, so "
                "model-axis sharding paths will NOT engage. Install the mesh "
                "with jax.sharding.set_mesh/use_mesh instead.", stacklevel=2)
        return None


def model_axis_size() -> int:
    m = ambient_mesh()
    if m is None:
        return 1
    return int(dict(m.shape).get("model", 1))


def shard_tokens(x, token_axis: int = 1):
    """Sequence-shard a (B, N, C) token array over the mesh's 'model' axis
    (no-op without an ambient mesh or with model=1). The XLA partitioner
    all-gathers K/V for the sharded-Q attention and partitions everything
    elementwise — the TPU-native replacement for the sequence parallelism
    the reference lacks (SURVEY.md §5 long-context)."""
    if model_axis_size() <= 1:
        return x
    spec = [None] * x.ndim
    spec[token_axis] = "model"
    return jax.lax.with_sharding_constraint(x, P(*spec))


def gather_model_axis(x, batch_axis: int = 0):
    """Replicate an array over the 'model' axis while leaving the batch axis
    unconstrained (no-op without an ambient model axis). Use before ops the
    partitioner cannot split over spatial dims — XLA CPU's FFT thunk
    RET_CHECKs on a dim0-major layout, which a 'model'-sharded FFT operand
    violates (losses/multiscale.py frequency_loss)."""
    if model_axis_size() <= 1:
        return x
    spec = [None] * x.ndim
    spec[batch_axis] = P.UNCONSTRAINED
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_spatial_d(x):
    """Shard a (B, C, D, H, W) conv activation over depth on the 'model'
    axis; GSPMD inserts the conv halo exchanges (SURVEY.md §7:
    'activation-sharded shard_map over the spatial D axis')."""
    if model_axis_size() <= 1:
        return x
    return jax.lax.with_sharding_constraint(x, P(None, None, "model", None, None))

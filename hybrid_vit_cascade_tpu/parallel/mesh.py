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

"""Device mesh + sharding helpers.

The reference's only parallelism is single-host multi-GPU DataParallel with
uneven chunk sizes (reference: src/lib/models/data_parallel.py:10-128,
opts.py:301-310).  The TPU-native equivalent is GSPMD: one jitted train
step over a 1-D 'data' mesh — inputs sharded on batch, params replicated,
gradient reduction emitted by the compiler as psum over ICI.  Multi-host
scales the same program via jax.distributed (no code change).
"""
from __future__ import annotations

from typing import Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch dict on device, sharded along the leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis: str = "data") -> P:
    return P(axis)

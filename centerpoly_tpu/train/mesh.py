"""Device mesh + sharding helpers.

The reference's only parallelism is single-host multi-GPU DataParallel with
uneven chunk sizes (reference: src/lib/models/data_parallel.py:10-128,
opts.py:301-310).  The TPU-native equivalent is GSPMD: one jitted train
step over a 1-D 'data' mesh — inputs sharded on batch, params replicated,
gradient reduction emitted by the compiler as psum over ICI.  Multi-host
scales the same program: initialize_distributed() brings up
jax.distributed, the mesh then spans every global device, and
shard_batch assembles each process's local samples into one global
batch array (collectives ride ICI within a slice, DCN across).
"""
from __future__ import annotations

from typing import Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str = "",
                           num_processes: int = -1,
                           process_id: int = -1) -> bool:
    """Bring up the multi-host runtime (SURVEY §2.7).

    Call ONCE per process, before any backend use.  With no arguments
    everything is auto-detected (TPU pod metadata / env); explicit values
    support manual launches (`--distributed --coordinator_address
    host:port --num_processes N --process_id i`).  Returns True if a
    multi-process runtime is up, False when it no-ops (already
    initialized, or an explicit single-process launch).
    """
    if num_processes == 1:
        return False  # explicit single-process launch: nothing to do
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        # already initialized (idempotent callers) — keep going
        pass
    return jax.process_count() > 1


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over all (global, in multi-host runs) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch dict on device, sharded along the leading dim.

    Single-process: a plain sharded device_put.  Multi-process: each
    process contributes its local shard of the global batch (so the host
    loader yields batch_size/process_count samples per process) via
    make_array_from_process_local_data.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis: str = "data") -> P:
    return P(axis)

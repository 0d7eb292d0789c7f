"""Multi-host utilities: process-group initialization and global batch
assembly.

The reference has no distributed support at all (SURVEY.md §2.5).  This is
the TPU-native multi-host story: each host packs its own per-device
batches; ``global_batch_from_local`` stitches them into global jax.Arrays
sharded over the ('data',) mesh axis spanning all hosts (ICI within a
slice, DCN across slices — XLA routes the psums in parallel/dp.py
accordingly).  The same shard_map step functions run unchanged.

On a single host these helpers degrade to the local mesh, so the training
scripts are host-count agnostic.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dp import DATA_AXIS


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the JAX process group.  Arguments default from the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID); on TPU pods jax.distributed autodetects everything.
    No-op for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_data_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def global_batch_from_local(mesh: Mesh, local_stacked: Any) -> Any:
    """Assemble a global sharded batch from this process's stacked
    per-device batches (leading axis = this host's device count).

    Every process calls this with its own shard stack; the result is a
    pytree of global jax.Arrays with leading dimension
    ``total_devices``, sharded P(DATA_AXIS) over the mesh — ready for the
    shard_map step functions in parallel/dp.py."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(put, local_stacked)

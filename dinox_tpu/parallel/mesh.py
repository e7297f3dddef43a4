"""Device mesh and sharding layout.

The TPU-native replacement for the communication layer the reference never
had (SURVEY.md §2.5, §5): a 2-D ``(data, model)`` mesh where the batch
dimension is sharded over ``data`` and parameters are replicated (model=1
today; the ``model`` axis is reserved so tensor-parallel ViT-Giant is a
config change, not a rewrite). Gradients are allreduced implicitly by XLA
over ICI when the loss is computed from a data-sharded batch.

Multi-host: call :func:`init_distributed` before any other JAX call; each
host then feeds its own shard of the global batch (see
dinox_tpu.data.index.shard_rows) and `jax.make_array_from_process_local_data`
assembles the global array.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX over DCN. No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1
) -> Mesh:
    """(n_devices/model_parallel, model_parallel) mesh with (data, model) axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host-local pytree of arrays as batch-sharded global arrays.

    Single-process: device_put with the batch sharding. Multi-process: each
    host contributes its local shard of the global batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
    )

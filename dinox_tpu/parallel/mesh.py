"""Device mesh and sharding layout.

The TPU-native replacement for the communication layer the reference never
had (SURVEY.md §2.5, §5): a 2-D ``(data, model)`` mesh where the batch
dimension is sharded over ``data`` and parameters are replicated (model=1
today; the ``model`` axis is reserved so tensor-parallel ViT-Giant is a
config change, not a rewrite). Gradients are allreduced implicitly by XLA
over ICI when the loss is computed from a data-sharded batch.

Multi-host: call :func:`init_distributed` before any other JAX call; each
host then feeds its own shard of the global batch (TrainLoader's
host_id/num_hosts order sharding, which keeps the full row set so 2.5D
neighbor lookup is intact) and `jax.make_array_from_process_local_data`
assembles the global array.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"  # MoE expert parallelism (models/moe.py)


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
        # Align processes right after init, then run one real collective as a
        # fail-fast health check of the CPU-collectives (Gloo) transport.
        # NOTE: each newly compiled executable with collectives performs its
        # OWN Gloo rendezvous under a hard ~30 s deadline, so this warm-up
        # does NOT protect later programs — what protects them is (a) the
        # host-fingerprinted compilation cache (utils/platform.py), which
        # keeps the processes' compile times symmetric, and (b) host_barrier
        # calls at skew-prone points (trainer final save).
        host_barrier("dinox_tpu:init_distributed")
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dinox_tpu:init_distributed")


def host_barrier(name: str, timeout_s: int = 600) -> None:
    """Cross-process barrier over the coordination service (gRPC), NOT a
    device collective: no compile, no Gloo context, minutes-scale timeout.
    Use at points where processes may have drifted far apart (e.g. before
    the final checkpoint save) so that any *subsequent* freshly compiled
    collective program is dispatched by all processes within the Gloo
    rendezvous deadline. No-op when not distributed."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    expert_parallel: int = 1,
) -> Mesh:
    """(data, model[, expert]) mesh. The ``expert`` axis is only added when
    expert_parallel > 1 so dense-model meshes (and everything that inspects
    their shape) are unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % (model_parallel * expert_parallel):
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
            f" x expert_parallel={expert_parallel}")
    if expert_parallel > 1:
        grid = np.asarray(devices).reshape(
            n // (model_parallel * expert_parallel), model_parallel, expert_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS, EXPERT_AXIS))
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_param_spec(path: tuple, leaf) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one param leaf.

    Column-parallel: attn.qkv and mlp.fc1 kernels split on the output dim
    (each rank holds a head/hidden shard; biases follow). Row-parallel:
    attn.proj and mlp.fc2 kernels split on the input dim (XLA inserts the
    psum over `model` at their output). Everything else — embeddings, norms,
    scale_embed ("physics" layers), DINO head, LoRA factors — is replicated.
    Matching is by dict-key names, so the same rule shards params and the
    optimizer's mu/nu mirrors.
    """
    names = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
    if len(names) >= 2 and getattr(leaf, "ndim", 0) in (1, 2):
        last, parent = names[-1], names[-2]
        col = (parent == "qkv" and "attn" in names) or (parent == "fc1" and "mlp" in names)
        row = (parent == "proj" and "attn" in names) or (parent == "fc2" and "mlp" in names)
        if last == "kernel" and leaf.ndim == 2:
            if col:
                return P(None, MODEL_AXIS)
            if row:
                return P(MODEL_AXIS, None)
        if last == "bias" and leaf.ndim == 1 and col:
            return P(MODEL_AXIS)
    return P()


def ep_param_spec(path: tuple, leaf) -> Optional[P]:
    """Expert-parallel spec: MoeMlp's expert-stacked leaves (w1/w2/b1/b2
    under a `moe` module, leading axis = n_experts) shard on `expert`; the
    router stays replicated. None = not a MoE leaf."""
    names = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
    if "moe" in names and names[-1] in ("w1", "w2", "b1", "b2") \
            and getattr(leaf, "ndim", 0) >= 2:
        return P(EXPERT_AXIS)
    return None


def state_shardings(mesh: Mesh, state):
    """NamedShardings for a TrainState pytree: TP specs when the `model` axis
    is real, expert specs when the `expert` axis is real, full replication
    otherwise."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    ep = mesh.shape.get(EXPERT_AXIS, 1) > 1
    if not tp and not ep:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), state)

    def spec(p, x):
        if ep:
            s = ep_param_spec(p, x)
            if s is not None:
                return NamedSharding(mesh, s)
        return NamedSharding(mesh, tp_param_spec(p, x) if tp else P())

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_batch(mesh: Mesh, tree):
    """Place a host-local pytree of arrays as batch-sharded global arrays.

    Single-process: device_put with the batch sharding. Multi-process: each
    host contributes its local shard of the global batch.
    """
    return put_global_batch(mesh, tree, spec=P(DATA_AXIS))


def put_global_batch(mesh: Mesh, tree, spec: P = P(None, DATA_AXIS)):
    """Assemble host-local (accum, B_local, ...) arrays into the global
    batch-sharded array the jitted step consumes.

    Single-process this is a device_put; under ``jax.process_count() > 1``
    each host's arrays become its shard of the global batch
    (``jax.make_array_from_process_local_data``), so the per-host loaders'
    disjoint epoch-order shards (TrainLoader host_id/num_hosts) compose into
    one global batch instead of every host treating its local batch as the
    world.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
    )

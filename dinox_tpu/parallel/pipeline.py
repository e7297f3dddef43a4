"""Pipeline parallelism over a ``pipe`` mesh axis (GPipe schedule, SPMD).

The reference has no analog — it is a single-process, single-device torch
trainer (SURVEY.md §2.5); pipeline parallelism is part of this rebuild's
multi-chip design, alongside data parallelism and Megatron tensor parallelism
(`parallel/mesh.py`). The design is TPU-native rather than a torch-style
send/recv pipeline:

* The transformer depth is split into ``S = mesh.shape["pipe"]`` contiguous
  stages. Per-block parameters are STACKED along a leading stage axis and
  sharded over ``pipe`` — each device holds only its stage's blocks (the
  memory win that motivates PP at all).
* The schedule is a collective-permute rotation: every device runs the same
  jitted program; at each clock tick every stage applies its blocks to the
  microbatch it currently holds, then the activations hop stage→stage over
  ICI via ``lax.ppermute``. After ``M + S - 1`` ticks all ``M`` microbatches
  have flowed through all stages (the classic GPipe bubble of ``S - 1``
  ticks). No host involvement, no point-to-point runtime — one XLA program.
* Autodiff runs through the schedule (scan + ppermute + psum are all
  differentiable), so the backward pass is the same rotation reversed —
  jit-compiled 1F-then-1B, not hand-scheduled.

Composition: PP shares the mesh with data parallelism (batch microbatches
are additionally sharded over ``data``). Attention inside the manual region
routes through XLA's SDPA (the Pallas kernel is the tensor-parallel path;
``pipe`` and ``model`` are mutually exclusive axes for now — a ViT block is
small enough that one stage never needs intra-layer sharding).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinox_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pp_mesh(devices, pipeline_parallel: int) -> Mesh:
    """(data, pipe) mesh: batch over ``data``, stages over ``pipe``.

    ``pipe`` is the MINOR axis so stage neighbors are ICI neighbors on a real
    slice — the rotation's hop is one link, the gradient allreduce rides the
    ``data`` axis.
    """
    n = len(devices)
    if n % pipeline_parallel:
        raise ValueError(f"{n} devices not divisible by pp={pipeline_parallel}")
    arr = np.asarray(devices).reshape(n // pipeline_parallel, pipeline_parallel)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# -- parameter layout --------------------------------------------------------


def split_backbone_params(backbone: dict, n_stages: int) -> tuple[dict, Any]:
    """Backbone param tree -> (rest, stacked_blocks).

    ``rest`` is the tree with every ``blocks_i`` subtree removed (embeddings,
    scale MLP, final norm). ``stacked_blocks`` has the structure of ONE block
    whose leaves carry a leading (n_stages, blocks_per_stage) pair of axes —
    leaf ``[s, j]`` is block ``s * blocks_per_stage + j``, the layout
    ``pipeline_run_blocks`` consumes (stage axis sharded over ``pipe``).
    """
    block_keys = sorted(
        (k for k in backbone if k.startswith("blocks_")),
        key=lambda k: int(k.split("_")[1]),
    )
    depth = len(block_keys)
    if depth % n_stages:
        raise ValueError(f"depth={depth} not divisible by {n_stages} stages")
    bps = depth // n_stages
    rest = {k: v for k, v in backbone.items() if not k.startswith("blocks_")}
    per_block = [backbone[k] for k in block_keys]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (n_stages, bps) + leaves[0].shape),
        *per_block,
    )
    return rest, stacked


def merge_backbone_params(rest: dict, stacked: Any) -> dict:
    """Inverse of :func:`split_backbone_params` (for checkpoint interop)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    n_stages, bps = leaves[0].shape[:2]
    out = dict(rest)
    for s in range(n_stages):
        for j in range(bps):
            out[f"blocks_{s * bps + j}"] = jax.tree_util.tree_map(
                lambda a: a[s, j], stacked
            )
    return out


def split_model_params(params: dict, n_stages: int) -> dict:
    """DinoStudentTeacher tree -> {"rest": ..., "blocks": stacked}."""
    rest_bb, blocks = split_backbone_params(params["backbone"], n_stages)
    rest = {k: v for k, v in params.items() if k != "backbone"}
    rest["backbone"] = rest_bb
    return {"rest": rest, "blocks": blocks}


def merge_model_params(pp_params: dict) -> dict:
    rest = dict(pp_params["rest"])
    rest["backbone"] = merge_backbone_params(
        rest["backbone"], pp_params["blocks"])
    return rest


# -- the schedule -------------------------------------------------------------


def pipeline_run_blocks(
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Run ``x`` (B, N, D) through the pipelined block stack.

    ``block_fn(one_block_params, tokens) -> tokens`` applies a single
    transformer block (wrap it in ``jax.checkpoint`` outside for remat).
    ``stacked_params`` leaves are (S, blocks_per_stage, ...), stage axis
    sharded over ``pipe``. Microbatches (default ``S``; more shrinks the
    (S-1)/(M+S-1) bubble) must divide B, and B/M must divide the ``data``
    axis size.
    """
    S = mesh.shape[PIPE_AXIS]
    B = x.shape[0]
    M = n_microbatches or S
    if M < S:
        raise ValueError(f"need >= {S} microbatches for {S} stages, got {M}")
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    dp = mesh.shape.get(DATA_AXIS, 1)
    if (B // M) % dp:
        raise ValueError(
            f"microbatch size {B // M} not divisible by data axis size {dp}")
    xm = x.reshape((M, B // M) + x.shape[1:])
    fwd = [(i, (i + 1) % S) for i in range(S)]

    def shard_fn(params_local, xm_local):
        # params_local leaves: (1, bps, ...) — this device's stage.
        # xm_local: (M, mb_local, N, D) — replicated over pipe, split on data.
        my = jax.lax.axis_index(PIPE_AXIS)
        bps = jax.tree_util.tree_leaves(params_local)[0].shape[1]

        def apply_stage(y):
            for j in range(bps):
                y = block_fn(
                    jax.tree_util.tree_map(lambda a: a[0, j], params_local), y
                )
            return y

        def tick(carry, t):
            recv, outs = carry
            feed = xm_local[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(my == 0, feed, recv)
            y = apply_stage(cur)
            # stage S-1's output at tick t finalizes microbatch t-(S-1)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, oidx, 0, keepdims=False)
            upd = jnp.where((my == S - 1) & (t >= S - 1), y, prev)
            outs = jax.lax.dynamic_update_index_in_dim(outs, upd, oidx, 0)
            return (jax.lax.ppermute(y, PIPE_AXIS, fwd), outs), None

        # the carry is device-varying (each stage holds different data); mark
        # the zero-init so the scan's carry type matches across iterations
        init = jax.lax.pcast(
            (jnp.zeros_like(xm_local[0]), jnp.zeros_like(xm_local)),
            (PIPE_AXIS,), to="varying",
        )
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # Only the last stage wrote non-zeros; the psum replicates the result
        # across ``pipe`` (and marks it axis-invariant for the vma checker).
        return jax.lax.psum(outs, PIPE_AXIS)

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )(stacked_params, xm)
    return out.reshape((B,) + x.shape[1:])


# -- shardings ----------------------------------------------------------------


def pp_state_shardings(mesh: Mesh, state):
    """NamedShardings for a PP TrainState: every leaf under a ``blocks``
    subtree is stage-sharded over ``pipe`` on axis 0; everything else
    (embeddings, head, center, scalars) is replicated."""

    def shard(path, leaf):
        in_blocks = any(getattr(k, "key", None) == "blocks" for k in path)
        if in_blocks and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(PIPE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard, state)

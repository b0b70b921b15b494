"""Mesh + sharding substrate.

Replaces the reference's two distribution mechanisms — Lightning DDP/NCCL
(LRW/video/src/train.py:28) and jax.pmap/lax.pmean (LRW/landmark/src/training.py:98-124)
— with one modern SPMD design: a `jax.sharding.Mesh` with a ``data`` axis (and
an optional ``model`` axis for tensor-sharded larger configs), batches sharded
with `NamedSharding(P("data", ...))`, parameters replicated (or sharded over
``model``), and gradient all-reduce inserted by XLA over ICI/DCN.

Multi-host: each host feeds only its local shard via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-local pytree of np/jnp arrays onto the mesh, sharded on the
    leading axis. Single-process: a plain device_put. Multi-process: assemble a
    global array from each process's local shard."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def host_local_batch(global_batch_size: int) -> int:
    """Per-host batch slice size (reference per-rank samplers equivalent)."""
    assert global_batch_size % jax.process_count() == 0
    return global_batch_size // jax.process_count()


def state_shardings(mesh: Mesh, state, min_dim: int = 512):
    """Tensor-parallel sharding rules for a TrainState pytree.

    Any array whose trailing dim is >= min_dim and divisible by the mesh's
    ``model`` axis is sharded on that dim (big FFN/head matmuls); everything
    else is replicated. Adam moments share their parameter's sharding because
    the rule is shape-based. With model=1 this degenerates to pure DP.
    """
    model = mesh.shape["model"]

    def rule(leaf):
        if (model > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] >= min_dim and leaf.shape[-1] % model == 0):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, state)


def shard_state(mesh: Mesh, state, min_dim: int = 512):
    """Place a TrainState according to state_shardings."""
    return jax.device_put(state, state_shardings(mesh, state, min_dim))

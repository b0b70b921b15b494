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


def create_mesh(data: int = -1, model: int = 1, seq: int = 1,
                devices: Optional[list] = None) -> Mesh:
    """(data, seq, model) device mesh. ``model`` is innermost (its per-matmul
    collectives are the most frequent, so they ride nearest-neighbor ICI),
    ``seq`` next (activation/sequence parallelism for long clips), ``data``
    outermost (gradient all-reduce once per step, DCN-tolerant)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, \
            f"{n} devices not divisible by model={model} x seq={seq}"
        data = n // (model * seq)
    assert data * model * seq == n, \
        f"mesh {data}x{seq}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, ("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


# Batch keys whose axis 1 is (video/waveform) time — candidates for the
# ``seq`` mesh axis. audio_tokens is deliberately absent: its length is
# T*alignment+4 (config.py CodecConfig), which the +4 pad makes indivisible;
# it stays data-sharded and GSPMD reshards it where the sync head needs it.
_SEQ_KEYS = ("videos", "inputs")


def batch_shardings(mesh: Mesh, batch: Any,
                    seq_keys=_SEQ_KEYS) -> Any:
    """Per-leaf NamedShardings for a batch dict: leading axis over ``data``;
    for dict batches, time-like leaves (``seq_keys``) additionally shard
    axis 1 over ``seq`` when the mesh has one and the length divides it
    (indivisible leaves — e.g. LRW's T=29 — fall back to data-only)."""
    seq = mesh.shape.get("seq", 1)
    data_only = batch_sharding(mesh)
    if seq <= 1 or not isinstance(batch, dict):
        return jax.tree_util.tree_map(lambda _: data_only, batch)
    seq_sh = NamedSharding(mesh, P("data", "seq"))

    def spec(key, x):
        if (key in seq_keys and getattr(x, "ndim", 0) >= 2
                and x.shape[1] % seq == 0):
            return seq_sh
        return data_only

    return {k: jax.tree_util.tree_map(lambda x, k=k: spec(k, x), v)
            for k, v in batch.items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-local pytree of np/jnp arrays onto the mesh: leading axis
    over ``data``, time axis of video/waveform leaves over ``seq`` when the
    mesh has one (batch_shardings). Single-process: a plain device_put.
    Multi-process: assemble a global array from each process's local shard
    (each host owns full-length clips, so a ``seq`` axis must lie within a
    host's devices — the create_mesh layout puts it there)."""
    shardings = batch_shardings(mesh, batch)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, batch, shardings)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch, shardings)


def host_local_batch(global_batch_size: int) -> int:
    """Per-host batch slice size (reference per-rank samplers equivalent)."""
    assert global_batch_size % jax.process_count() == 0
    return global_batch_size // jax.process_count()


def state_shardings(mesh: Mesh, state, min_dim: int = 512,
                    fsdp: bool = False, fsdp_min_size: int = 2 ** 15):
    """Sharding rules for a TrainState pytree.

    Tensor parallel: any array whose trailing dim is >= min_dim and divisible
    by the mesh's ``model`` axis is sharded on that dim (big FFN/head
    matmuls). With ``fsdp`` additionally ZeRO-shard: every array of
    >= fsdp_min_size elements is sharded over the ``data`` axis on its
    largest divisible dim (excluding a dim already taken by ``model``), so
    parameters AND Adam moments live scattered across data-parallel chips —
    XLA all-gathers each weight where it is used and reduce-scatters its
    gradient (the reference has no analogue; Lightning DDP replicates
    optimizer state per rank, LRW/video/src/train.py:28).

    Adam moments share their parameter's sharding because every rule is
    shape-based. Small leaves (BN stats, biases, norm scales, step counters)
    stay replicated. With model=1 and fsdp=False this degenerates to pure DP.
    """
    model = mesh.shape["model"]
    data = mesh.shape["data"]

    def rule(leaf):
        if not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        if (model > 1 and leaf.ndim >= 2
                and leaf.shape[-1] >= min_dim and leaf.shape[-1] % model == 0):
            spec[-1] = "model"
        if fsdp and data > 1 and leaf.ndim >= 1 and leaf.size >= fsdp_min_size:
            free = [(d, i) for i, d in enumerate(leaf.shape)
                    if spec[i] is None and d % data == 0 and d >= data]
            if free:
                # largest divisible dim; ties break to the earliest (usually
                # the fan-in dim of a kernel — any choice is correct, GSPMD
                # only needs it deterministic)
                _, i = max(free, key=lambda t: (t[0], -t[1]))
                spec[i] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, state)


def shard_state(mesh: Mesh, state, min_dim: int = 512, fsdp: bool = False,
                fsdp_min_size: int = 2 ** 15):
    """Place a TrainState according to state_shardings. Under ``fsdp``,
    big leaves with no data-divisible dim silently stay replicated — which
    defeats the memory goal the user asked for — so the total replicated
    bytes among fsdp-eligible leaves are reported once (process 0)."""
    shardings = state_shardings(mesh, state, min_dim, fsdp, fsdp_min_size)
    if fsdp and mesh.shape["data"] > 1 and jax.process_index() == 0:
        leftover = sum(
            leaf.size * np.dtype(leaf.dtype).itemsize
            for leaf, sh in zip(jax.tree_util.tree_leaves(state),
                                jax.tree_util.tree_leaves(shardings))
            if hasattr(leaf, "ndim") and leaf.size >= fsdp_min_size
            and "data" not in sh.spec)
        if leftover >= 2**20:  # below 1 MiB the replication is immaterial
            print(f"[fsdp] {leftover / 2**20:.1f} MiB of >= {fsdp_min_size}"
                  "-element leaves have no data-divisible dim and stay "
                  "REPLICATED on every chip (per-chip memory unchanged for "
                  "them); consider padding those dims to a multiple of "
                  f"data={mesh.shape['data']}")
    return jax.device_put(state, shardings)

"""Jitted train/eval step builders over a device mesh.

The reference's pmap steps (LRW/landmark/src/training.py:98-124) become single
jit programs: the batch is sharded over the mesh's ``data`` axis, parameters
are replicated, and the gradient all-reduce is inserted by XLA (no explicit
``lax.pmean``). The train-state input buffer is donated.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from syncvsr_tpu.engine.state import TrainState, current_lr


def build_train_step(mesh: Optional[Mesh] = None, donate: bool = True,
                     aug_fn: Optional[Callable] = None,
                     compiler_options: Optional[Dict[str, str]] = None,
                     fsdp: bool = False) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    ``aug_fn(rng, batch) -> batch`` runs on-device inside the compiled step
    (image augmentation for the video stacks). ``compiler_options`` are
    backend XLA flags forwarded per-compile (e.g.
    ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``) — per-workload tuning
    without touching process-global XLA_FLAGS. ``fsdp``: the caller placed
    the state via ``shard_state(..., fsdp=True)`` (params + Adam moments
    ZeRO-sharded over ``data``); keep the committed shardings instead of
    pinning the state replicated."""

    def train_step(state: TrainState, batch: Dict[str, Any]):
        mixup_rng, new_mixup_rng = jax.random.split(state.mixup_rng)
        dropout_rng, new_dropout_rng = jax.random.split(state.dropout_rng)
        if aug_fn is not None:
            aug_rng, mixup_rng = jax.random.split(mixup_rng)
            batch = aug_fn(aug_rng, batch)
        rngs = {"mixup": mixup_rng, "dropout": dropout_rng}
        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = state.apply_fn(variables, **batch, det=False, rngs=rngs,
                                 mutable=["batch_stats"] if has_bn else False)
            metrics, mutated = out if has_bn else (out, {})
            return metrics["loss"], (metrics, mutated)

        (_, (metrics, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        state = state.apply_gradients(
            grads=grads,
            mixup_rng=new_mixup_rng,
            dropout_rng=new_dropout_rng,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
        )
        metrics = dict(metrics, learning_rate=current_lr(state),
                       grad_norm=optax_global_norm(grads))
        return state, metrics

    donate_argnums = (0,) if donate else ()
    jit_kw = {}
    if compiler_options:
        jit_kw["compiler_options"] = dict(compiler_options)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums, **jit_kw)
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    if mesh.shape.get("seq", 1) > 1:
        # sequence parallel (long clips): shard_batch commits time-like
        # leaves as P("data", "seq") and the rest as P("data") — pass the
        # batch sharding through (None = infer from the committed arrays)
        # and keep the state replicated; GSPMD inserts the halo exchanges
        # (frontend convs), K/V all-gathers (attention) and cross-shard
        # statistics reductions (BN, CTC) along ``seq``.
        keep_state = fsdp or mesh.shape.get("model", 1) > 1
        return jax.jit(
            train_step,
            donate_argnums=donate_argnums,
            in_shardings=(None if keep_state else repl, None),
            **jit_kw,
        )
    if fsdp or mesh.shape.get("model", 1) > 1:
        # tensor-parallel and/or FSDP: big matmul params (and their Adam
        # moments) live sharded on the model axis; under fsdp every large
        # leaf is additionally ZeRO-scattered over data. State shardings
        # are shape-inferred per leaf (shard_state committed them), so pass
        # UNSPECIFIED for the state and pin only the batch.
        return jax.jit(
            train_step,
            donate_argnums=donate_argnums,
            in_shardings=(None, batch_sh),
            **jit_kw,
        )
    return jax.jit(
        train_step,
        donate_argnums=donate_argnums,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        **jit_kw,
    )


def build_eval_step(mesh: Optional[Mesh] = None, fsdp: bool = False) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        metrics = state.apply_fn(variables, **batch, det=True)
        if "sample_weight" in batch:
            # GLOBAL real-sample count (the metrics are weighted means over
            # the whole sharded batch): computed in-graph so every host sees
            # the same replicated value — weighting the meter by a host-local
            # count would bias and diverge multi-host eval
            metrics = dict(metrics, _weight=batch["sample_weight"]
                           .astype(jnp.float32).sum())
        return metrics

    if mesh is None:
        return jax.jit(eval_step)
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    state_in = None if fsdp else repl  # fsdp: keep the committed ZeRO layout
    if mesh.shape.get("seq", 1) > 1:
        # keep shard_batch's per-leaf (data, seq) placement (see train step)
        return jax.jit(eval_step, in_shardings=(state_in, None),
                       out_shardings=repl)
    return jax.jit(eval_step, in_shardings=(state_in, batch_sh),
                   out_shardings=repl)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))

"""TrainState and optimizer factory.

Carries the reference's RNG discipline (separate init/mixup/dropout streams,
LRW/landmark/src/main.py:115-117) and optimizer recipe (inject_hyperparams
AdamW with kernel-only weight decay, global-norm clipping, warmup-cosine
schedule — LRW/landmark/src/training.py:127-197), plus a ``batch_stats``
collection for the BatchNorm-bearing video/conformer models.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax
from flax.training import train_state

from syncvsr_tpu.config import Config, OptimConfig


class TrainState(train_state.TrainState):
    mixup_rng: jax.Array
    dropout_rng: jax.Array
    batch_stats: Any = None


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.total_steps <= 0:
        return optax.constant_schedule(cfg.lr)
    return optax.warmup_cosine_decay_schedule(
        init_value=cfg.init_lr,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=cfg.total_steps,
        end_value=cfg.end_lr,
    )


def _decay_mask(params) -> Any:
    """Weight decay on kernels only (reference training.py:178)."""
    from jax.tree_util import tree_map_with_path

    def is_kernel(path, _):
        return getattr(path[-1], "key", None) == "kernel"

    return tree_map_with_path(is_kernel, params)


def make_optimizer(cfg: OptimConfig,
                   schedule: Optional[optax.Schedule] = None) -> optax.GradientTransformation:
    schedule = schedule or make_schedule(cfg)

    @optax.inject_hyperparams
    def _make(lr):
        tx = optax.adamw(learning_rate=lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                         weight_decay=cfg.weight_decay, mask=_decay_mask)
        if cfg.clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
        return tx

    tx = _make(schedule)
    if cfg.skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.accum_steps)
    return tx


def current_lr(state: TrainState) -> jax.Array:
    """Learning rate surfaced from inject_hyperparams (training.py:116)."""
    opt_state = state.opt_state
    if isinstance(opt_state, optax.MultiStepsState):
        opt_state = opt_state.inner_opt_state
    if isinstance(opt_state, optax.ApplyIfFiniteState):
        opt_state = opt_state.inner_state
    return opt_state.hyperparams["lr"]


def create_train_state(config: Config, model, example_batch: Dict[str, Any],
                       rng: Optional[jax.Array] = None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(config.train.seed)
    init_rngs = {"params": rng,
                 "mixup": jax.random.PRNGKey(config.train.mixup_seed),
                 "dropout": jax.random.PRNGKey(config.train.dropout_seed)}
    variables = model.init(init_rngs, **example_batch, det=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(config.optim),
        mixup_rng=jax.random.PRNGKey(config.train.mixup_seed),
        dropout_rng=jax.random.PRNGKey(config.train.dropout_seed),
        batch_stats=batch_stats,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))

"""CTC loss for the hybrid sentence-level objective.

The reference uses torch builtin CTCLoss (sum over batch, divided by batch —
espnet ctc.py:64-73). Here: `optax.ctc_loss` (a lax.scan log-space
alpha-recursion, XLA-friendly) with blank_id=0 to match the reference's
token table (<blank>=0, spm/train.sh). A tiny O(B*T*S) dynamic-program
reference implementation lives in the tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from syncvsr_tpu.ops.masking import weighted_mean

Array = jax.Array


def ctc_loss(logits: Array, logit_lengths: Array, labels: Array,
             label_lengths: Array, blank_id: int = 0,
             sample_weight: Array = None) -> Array:
    """Batch-averaged CTC negative log-likelihood.

    logits: [B, T, V] raw (pre-softmax); labels: [B, N] padded with anything
    beyond label_lengths (sanitized here). ``sample_weight`` [B] excludes
    repeat-padded rows from the average (weighted mean over real samples).
    """
    b, t, _ = logits.shape
    n = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(n)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    safe_labels = jnp.where(label_pad > 0, 0, labels)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                             safe_labels, label_pad, blank_id=blank_id)
    return weighted_mean(per_seq, sample_weight)


def ctc_greedy_decode(logits: Array, logit_lengths: Array,
                      blank_id: int = 0) -> Tuple[Array, Array]:
    """Greedy CTC collapse: argmax per frame, merge repeats, drop blanks.

    Returns (tokens [B, T] padded with -1, lengths [B]). Static-shaped: the
    collapse is a masked scatter-free compaction via cumulative counts.
    """
    b, t, _ = logits.shape
    path = jnp.argmax(logits, axis=-1)                     # [B, T]
    in_range = jnp.arange(t)[None, :] < logit_lengths[:, None]
    prev = jnp.pad(path[:, :-1], ((0, 0), (1, 0)), constant_values=blank_id)
    keep = (path != blank_id) & (path != prev) & in_range  # new non-blank runs

    # stable compaction: position of each kept token in the output
    idx = jnp.cumsum(keep, axis=1) - 1                     # [B, T]
    out = jnp.full((b, t), -1, path.dtype)
    scatter_idx = jnp.where(keep, idx, t - 1)
    # scatter kept tokens; padding writes collide at t-1 then get overwritten
    out = out.at[jnp.arange(b)[:, None], scatter_idx].set(
        jnp.where(keep, path, -1), mode="drop")
    lengths = keep.sum(axis=1)
    # positions >= length must be -1 (collisions may have left junk at t-1)
    out = jnp.where(jnp.arange(t)[None, :] < lengths[:, None], out, -1)
    return out, lengths

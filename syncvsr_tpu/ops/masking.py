"""Mask/sequence utilities (espnet nets_utils.py / mask.py / add_sos_eos.py
equivalents, jnp-native with static shapes)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def length_mask(lengths: Array, max_len: int) -> Array:
    """[B] lengths -> [B, T] boolean keep-mask (make_non_pad_mask)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def weighted_mean(per_sample: Array, weight) -> Array:
    """Mean over the batch, or a sample-weighted mean when ``weight`` [B] is
    given (exact eval over repeat-padded tail batches). The single source of
    truth for the idiom — used by the word/sentence losses and CTC."""
    if weight is None:
        return per_sample.mean()
    w = weight.astype(jnp.float32)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)


def add_sos_eos(labels: Array, sos: int, eos: int,
                ignore_id: int = -1) -> Tuple[Array, Array, Array]:
    """Teacher-forcing io pair from padded labels.

    labels: [B, L] with ignore_id padding. Returns (ys_in [B, L+1] starting
    with sos, padded with eos; ys_out [B, L+1] ending with eos, padded with
    ignore_id; ys_in_lengths [B]) — semantics of espnet add_sos_eos.py:12-31
    without Python-level ragged lists.
    """
    b, l = labels.shape
    valid = labels != ignore_id
    lengths = valid.sum(axis=1)

    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, labels.dtype),
         jnp.where(valid, labels, eos)], axis=1)

    # ys_out: labels then eos at position `length`, ignore after
    ys_out = jnp.where(valid, labels, ignore_id)
    ys_out = jnp.concatenate([ys_out, jnp.full((b, 1), ignore_id, labels.dtype)], axis=1)
    pos = jnp.arange(l + 1)[None, :]
    ys_out = jnp.where(pos == lengths[:, None], eos, ys_out)
    return ys_in, ys_out, lengths + 1


def label_smoothing_kl(logits: Array, targets: Array, vocab: int,
                       smoothing: float, ignore_id: int = -1,
                       normalize_length: bool = False,
                       sample_weight: Array = None) -> Array:
    """espnet LabelSmoothingLoss (label_smoothing_loss.py:13-63): KL between
    log-softmax predictions and the smoothed target distribution, summed over
    tokens, divided by batch size (or token count when normalize_length).
    ``sample_weight`` [B] excludes repeat-padded rows from the average."""
    import os

    b = logits.shape[0]
    flat_logits = logits.reshape(-1, vocab).astype(jnp.float32)
    flat_t = targets.reshape(-1)
    ignore = flat_t == ignore_id
    safe_t = jnp.where(ignore, 0, flat_t)

    confidence = 1.0 - smoothing
    low = smoothing / (vocab - 1)
    logp_low = jnp.where(low > 0, jnp.log(jnp.maximum(low, 1e-30)), 0.0)
    logp_conf = jnp.log(jnp.maximum(confidence, 1e-30))

    if os.environ.get("SYNCVSR_LSM_V2"):
        # Reassociated form: never materializes log_softmax [N, V].
        # logq.sum(-1) == logits.sum(-1) - V*lse and logq[t] == logits[t]-lse,
        # so the fwd needs only lse/row-sum/gather of the raw logits and the
        # bwd is one softmax — a different XLA kernel mix from the logq form
        # (probe for the bs16 TPU codegen fault; also saves the [N, V] f32
        # residual).
        lse = jax.nn.logsumexp(flat_logits, axis=-1)
        logit_t = jnp.take_along_axis(
            flat_logits, safe_t[:, None], axis=-1)[:, 0]
        q_t = logit_t - lse
        logq_sum = flat_logits.sum(-1) - vocab * lse
    else:
        logq = jax.nn.log_softmax(flat_logits, axis=-1)
        q_t = jnp.take_along_axis(logq, safe_t[:, None], axis=-1)[:, 0]
        logq_sum = logq.sum(-1)

    # sum_c p_c (log p_c - log q_c) without materializing one-hots twice
    kl = (low * (logp_low * vocab - logq_sum)
          + confidence * logp_conf - low * logp_low
          - (confidence - low) * q_t)
    kl = jnp.where(ignore, 0.0, kl)
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32)
        per_sample = kl.reshape(b, -1).sum(axis=1)
        if normalize_length:
            tokens = (~ignore).reshape(b, -1).sum(axis=1) * w
            return (per_sample * w).sum() / jnp.maximum(tokens.sum(), 1)
        return weighted_mean(per_sample, sample_weight)
    denom = jnp.maximum((~ignore).sum(), 1) if normalize_length else b
    return kl.sum() / denom


def decoder_accuracy(logits: Array, targets: Array, ignore_id: int = -1,
                     sample_weight: Array = None) -> Array:
    """th_accuracy (nets_utils.py:303): token accuracy over non-ignored.
    ``sample_weight`` [B] excludes repeat-padded rows."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    if sample_weight is not None:
        valid = valid & (sample_weight[:, None] > 0)
    correct = (pred == targets) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1)

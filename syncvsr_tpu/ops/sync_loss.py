"""Frame-level audio-token synchronization loss — the core SyncVSR objective.

A linear head on the encoder's per-frame outputs predicts, for each video
frame, ``audio_alignment * vq_groups`` discrete audio-codec tokens over a
vocabulary of ``audio_vocab_size``; cross-entropy on those predictions is added
to the task loss with weight ``sync_lambda`` (reference README.md:25-58;
LRW/landmark/src/training.py:72-77; LRW/video/src/lightning.py:167-174).

The naive path materializes [B, T, A*G, V] logits in HBM. ``sync_cross_entropy``
instead runs a time-chunked custom-VJP: each chunk projects features onto the
vocab, reduces to (logsumexp, label-logit) per slot, and discards the logits;
the backward pass recomputes the chunk's softmax. Peak memory drops from
O(B*T*A*G*V) to O(B*chunk*A*G*V) at the cost of one extra matmul in backward
(cheap on the MXU, and HBM traffic is the real bottleneck here).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sync_logits(features: Array, kernel: Array, bias: Array,
                alignment: int, groups: int, vocab: int) -> Array:
    """[B, T, D] -> [B, T, A*G, V] audio logits (f32)."""
    b, t, _ = features.shape
    logits = jnp.einsum("btd,dv->btv", features, kernel.astype(features.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    return logits.reshape(b, t, alignment * groups, vocab)


def _ce_from_logits(logits: Array, tokens: Array) -> Tuple[Array, Array]:
    """logits [N, V] f32, tokens [N] int -> (sum CE, count)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    lab = jnp.take_along_axis(logits, tokens[:, None], axis=-1)[:, 0]
    return jnp.sum(lse - lab), jnp.asarray(logits.shape[0], jnp.float32)


def sync_cross_entropy_reference(features: Array, kernel: Array, bias: Array,
                                 tokens: Array, alignment: int, groups: int,
                                 vocab: int) -> Array:
    """Unfused reference implementation (tests compare the fused op to this)."""
    b, t, _ = features.shape
    logits = sync_logits(features, kernel, bias, alignment, groups, vocab)
    logits = logits.reshape(b * t * alignment * groups, vocab)
    tok = tokens.reshape(b, -1, groups)[:, : t * alignment]
    total, count = _ce_from_logits(logits, tok.reshape(-1))
    return total / count


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _chunked_sync_ce(features, kernel, bias, tokens, alignment, groups, vocab, chunk):
    loss, _ = _chunked_fwd(features, kernel, bias, tokens, alignment, groups, vocab, chunk)
    return loss


def _chunk_stats(feat_c, kernel, bias, tok_c, alignment, groups, vocab):
    """One time-chunk: project + reduce. feat_c [B, C, D], tok_c [B, C, A*G]."""
    b, c, _ = feat_c.shape
    logits = sync_logits(feat_c, kernel, bias, alignment, groups, vocab)
    logits = logits.reshape(b * c * alignment * groups, vocab)
    return _ce_from_logits(logits, tok_c.reshape(-1))


def make_chunk_residuals(features, kernel, bias, tokens, alignment, groups, chunk):
    """Pad/regroup inputs into the residual layout _chunked_bwd consumes
    (also used by the Pallas forward's custom VJP)."""
    b, t, d = features.shape
    slots = alignment * groups
    # tokens arrive as [B, T*A(+pad), G]; truncate and regroup per frame -> [B, T, A*G]
    tok = tokens.reshape(b, -1, groups)[:, : t * alignment]
    tok = tok.reshape(b, t, slots)

    n_chunks = max(1, (t + chunk - 1) // chunk)
    pad_t = n_chunks * chunk - t
    if pad_t:
        features = jnp.pad(features, ((0, 0), (0, pad_t), (0, 0)))
        tok = jnp.pad(tok, ((0, 0), (0, pad_t), (0, 0)), constant_values=-1)
    count = jnp.maximum((tok >= 0).sum(), 1)
    return (features, kernel, bias, tok, count, b, t, d, pad_t)


def _chunked_fwd(features, kernel, bias, tokens, alignment, groups, vocab, chunk):
    res = make_chunk_residuals(features, kernel, bias, tokens, alignment,
                               groups, chunk)
    features, kernel, bias, tok, _, b, t, d, pad_t = res
    slots = alignment * groups
    n_chunks = features.shape[1] // chunk
    feat_cs = features.reshape(b, n_chunks, chunk, d).swapaxes(0, 1)
    tok_cs = tok.reshape(b, n_chunks, chunk, slots).swapaxes(0, 1)

    def body(carry, xs):
        total, count = carry
        feat_c, tok_c = xs
        valid = tok_c >= 0
        safe_tok = jnp.where(valid, tok_c, 0)
        logits = sync_logits(feat_c, kernel, bias, alignment, groups, vocab)
        lse = jax.nn.logsumexp(logits, axis=-1)
        lab = jnp.take_along_axis(logits, safe_tok[..., None], axis=-1)[..., 0]
        ce = jnp.where(valid, lse - lab, 0.0)
        return (total + ce.sum(), count + valid.sum()), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (feat_cs, tok_cs))
    loss = total / jnp.maximum(count, 1).astype(jnp.float32)
    return loss, res


def _chunked_bwd(alignment, groups, vocab, chunk, res, g):
    features, kernel, bias, tok, count, b, t, d, pad_t = res
    slots = alignment * groups
    n_chunks = features.shape[1] // chunk
    feat_cs = features.reshape(b, n_chunks, chunk, d).swapaxes(0, 1)
    tok_cs = tok.reshape(b, n_chunks, chunk, slots).swapaxes(0, 1)
    scale = (g / count.astype(jnp.float32))

    def body(carry, xs):
        dk, db = carry
        feat_c, tok_c = xs
        valid = tok_c >= 0
        safe_tok = jnp.where(valid, tok_c, 0)
        logits = sync_logits(feat_c, kernel, bias, alignment, groups, vocab)
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(safe_tok, vocab, dtype=jnp.float32)
        dlogits = (probs - onehot) * valid[..., None] * scale      # [B,C,S,V]
        dlogits_flat = dlogits.reshape(feat_c.shape[0], feat_c.shape[1], slots * vocab)
        dfeat_c = jnp.einsum("bcv,dv->bcd", dlogits_flat,
                             kernel.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        dk = dk + jnp.einsum("bcd,bcv->dv", feat_c.astype(jnp.float32), dlogits_flat,
                             preferred_element_type=jnp.float32)
        db = db + dlogits_flat.sum((0, 1))
        return (dk, db), dfeat_c

    (dk, db), dfeat_cs = jax.lax.scan(
        body,
        (jnp.zeros((d, slots * vocab), jnp.float32), jnp.zeros((slots * vocab,), jnp.float32)),
        (feat_cs, tok_cs))
    dfeat = dfeat_cs.swapaxes(0, 1).reshape(b, n_chunks * chunk, d)
    if pad_t:
        dfeat = dfeat[:, :t]
    return (dfeat.astype(features.dtype), dk.astype(kernel.dtype),
            db.astype(bias.dtype), None)


_chunked_sync_ce.defvjp(_chunked_fwd_public := lambda *a: _chunked_fwd(*a),
                        _chunked_bwd)


def sync_cross_entropy(features: Array, kernel: Array, bias: Array, tokens: Array,
                       alignment: int, groups: int, vocab: int,
                       chunk: Optional[int] = None) -> Array:
    """Mean CE over every (frame, alignment, group) slot.

    features: [B, T, D] encoder outputs (sync head input)
    kernel:   [D, A*G*V] projection weight; bias: [A*G*V]
    tokens:   [B, >=T*A, G] int32 codec tokens (negative = ignore)
    """
    t = features.shape[1]
    if chunk is None or chunk >= t:
        # small sequences: let XLA fuse the whole thing
        b = features.shape[0]
        tok = tokens.reshape(b, -1, groups)[:, : t * alignment].reshape(b, t, alignment * groups)
        valid = tok >= 0
        safe_tok = jnp.where(valid, tok, 0)
        logits = sync_logits(features, kernel, bias, alignment, groups, vocab)
        lse = jax.nn.logsumexp(logits, axis=-1)
        lab = jnp.take_along_axis(logits, safe_tok[..., None], axis=-1)[..., 0]
        ce = jnp.where(valid, lse - lab, 0.0)
        return ce.sum() / jnp.maximum(valid.sum(), 1).astype(jnp.float32)
    return _chunked_sync_ce(features, kernel, bias, tokens, alignment, groups, vocab, chunk)

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


_NEG = -1e30  # log(0) stand-in that survives f32 additions over T frames


def ctc_forced_align(logits: Array, logit_lengths: Array, labels: Array,
                     label_lengths: Array, blank_id: int = 0) -> Array:
    """Batched CTC forced alignment (Viterbi over the blank-interleaved
    trellis): the most-likely frame-level token path consistent with the
    transcript.

    Replaces the reference's per-utterance python-loop implementation
    (espnet/nets/pytorch_backend/ctc.py:181-245 ``forced_align``): same
    lattice (states [blank, l1, blank, ..., lL, blank], transitions
    stay/advance1/advance2 with the repeated-label rule, terminal
    max(last blank, last label)) re-cast as two lax.scans — a forward
    max-DP over time emitting 2-bit backpointers and a reverse backtrace —
    fully batched and static-shaped for one XLA compile per bucket.

    logits: [B, T, V] raw (pre-softmax); labels: [B, N] padded arbitrarily
    beyond label_lengths. Returns [B, T] int32 token ids (blank_id between
    emissions, the reference's output convention), -1 beyond logit_lengths.
    Rows with label_length 0 align every frame to blank.
    """
    b, t, _ = logits.shape
    n = labels.shape[1]
    s = 2 * n + 1
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    label_pad = jnp.arange(n)[None, :] >= label_lengths[:, None]
    safe = jnp.where(label_pad, blank_id, labels)
    # y_int[b] = [blank, l1, blank, l2, ..., lN, blank]  (padded rows: blank)
    y_int = jnp.full((b, s), blank_id, labels.dtype)
    y_int = y_int.at[:, 1::2].set(safe)

    is_label = (jnp.arange(s)[None, :] % 2 == 1)
    prev2 = jnp.pad(y_int[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    allow2 = is_label & (y_int != prev2)                     # skip-blank legal
    # states beyond this sample's trellis (s >= 2*len+1) can never be
    # entered: emitting blank there would corrupt the terminal max when the
    # padded region's blanks score higher than the real path
    s_eff = 2 * label_lengths + 1                            # [B]
    in_trellis = jnp.arange(s)[None, :] < s_eff[:, None]

    emit = jnp.take_along_axis(                              # [B, T, S]
        lp, jnp.broadcast_to(y_int[:, None, :], (b, t, s)), axis=-1)
    emit = jnp.where(in_trellis[:, None, :], emit, _NEG)
    frame_live = jnp.arange(t)[None, :] < logit_lengths[:, None]  # [B, T]

    delta0 = jnp.full((b, s), _NEG)
    delta0 = delta0.at[:, 0].set(emit[:, 0, 0])
    delta0 = delta0.at[:, 1].set(emit[:, 0, 1])

    def shift(x, k):
        return jnp.pad(x[:, :-k], ((0, 0), (k, 0)), constant_values=_NEG)

    def fwd(delta, inp):
        e_t, live_t = inp                                    # [B,S], [B]
        c0 = delta
        c1 = shift(delta, 1)
        c2 = jnp.where(allow2, shift(delta, 2), _NEG)
        stacked = jnp.stack([c0, c1, c2])                    # [3, B, S]
        bp = jnp.argmax(stacked, axis=0).astype(jnp.uint8)   # [B, S]
        new = jnp.max(stacked, axis=0) + e_t
        # frames past the sample's length: freeze the lattice (stay, no
        # emission) so the terminal max reads the state at length-1
        new = jnp.where(live_t[:, None], new, delta)
        bp = jnp.where(live_t[:, None], bp, jnp.uint8(0))
        return new, bp

    # time-major scan; first frame is the init, so scan over t=1..T-1
    delta_f, bps = jax.lax.scan(
        fwd, delta0, (jnp.swapaxes(emit, 0, 1)[1:],
                      jnp.swapaxes(frame_live, 0, 1)[1:]))

    # terminal state: better of the last blank (2L) and last label (2L-1)
    last_blank = s_eff - 1
    last_label = jnp.maximum(s_eff - 2, 0)
    take = lambda d, i: jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
    s_end = jnp.where(take(delta_f, last_blank) >= take(delta_f, last_label),
                      last_blank, last_label).astype(jnp.int32)

    def bwd(state, bp_t):
        prev = state - jnp.take_along_axis(
            bp_t.astype(jnp.int32), state[:, None], axis=1)[:, 0]
        return prev, state

    # bps[i] holds the t=i+1 backpointers; reverse scan emits s_1..s_{T-1}
    # in forward order and carries out s_0
    s0, states = jax.lax.scan(bwd, s_end, bps, reverse=True)  # [T-1, B]
    states = jnp.concatenate([s0[:, None],
                              jnp.swapaxes(states, 0, 1)], axis=1)  # [B, T]
    align = jnp.take_along_axis(y_int, states, axis=1).astype(jnp.int32)
    return jnp.where(frame_live, align, -1)

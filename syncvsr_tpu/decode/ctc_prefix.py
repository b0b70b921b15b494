"""Vectorized, jittable CTC prefix scorer.

Reimplements the label-synchronous CTC prefix DP of the reference
(espnet/nets/ctc_prefix_score.py:11-270, after Watanabe et al. hybrid
CTC/attention and Seki et al. vectorized beam search) with static shapes:
the scan runs over all T frames with a start-index mask instead of Python
slicing, and candidate selection uses the same pre-beam "partial scoring"
contract (score only P candidate tokens per hypothesis; non-scored tokens
fall back to prefix-score logzero / state slot 0, matching
ctc_prefix_score.py:205-213).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

LOGZERO = -1.0e10


class CTCPrefixState(NamedTuple):
    r: Array  # [W, T, 2] forward probs (non-blank, blank) of each hyp's prefix
    s: Array  # [W] prefix score log psi


class CTCPrefixScorer:
    """Functional scorer over one utterance's CTC posteriors."""

    def __init__(self, log_probs: Array, length: Array, blank: int, eos: int):
        """log_probs: [T, V] log-softmax CTC outputs; length: valid frames."""
        t, v = log_probs.shape
        frames = jnp.arange(t)
        valid = frames < length
        # pad frames: all logzero except blank=0 (ctc_prefix_score.py:47-50)
        x = jnp.where(valid[:, None], log_probs, LOGZERO)
        x = x.at[:, blank].set(jnp.where(valid, log_probs[:, blank], 0.0))
        self.x = x
        self.xb = x[:, blank]                      # [T]
        self.T, self.V = t, v
        self.blank, self.eos = blank, eos
        self.length = length
        self.end_frame = length - 1

    def init_state(self, width: int) -> CTCPrefixState:
        r = jnp.full((width, self.T, 2), LOGZERO, jnp.float32)
        r = r.at[:, :, 1].set(jnp.cumsum(self.xb)[None, :])
        return CTCPrefixState(r=r, s=jnp.zeros((width,), jnp.float32))

    def score_partial(self, state: CTCPrefixState, last_tokens: Array,
                      part_ids: Array, out_len: Array
                      ) -> Tuple[Array, Array, Array]:
        """Score P candidate extensions for each of W hypotheses.

        last_tokens: [W] last emitted token (sos on the first call)
        part_ids:    [W, P] candidate token ids
        out_len:     scalar — tokens emitted so far (excluding sos)

        Returns (log_psi [W, P] — absolute prefix scores of the extended
        prefixes; r_new [W, T, 2, P]; r_sum [W, T] for eos handling).

        The label-synchronous DP over frames is a *first-order linear
        recurrence* in probability space — R_n[t] = X_n[t]*(R_n[t-1] +
        Phi[t-1]) and R_b[t] = X_b[t]*(R_b[t-1] + R_n[t-1]) with Phi an
        input — so instead of espnet's sequential frame loop
        (ctc_prefix_score.py:137-144, ~T tiny ops on the critical path per
        decode step) both recurrences run as log-depth
        ``jax.lax.associative_scan`` passes over [T, W, P] slabs, and the
        prefix score psi is a plain logsumexp reduction. Composition of the
        affine maps r -> a*r + b in log space: (la, lb) o (la', lb') =
        (la + la', logaddexp(la + lb', lb)).
        """
        w, p = part_ids.shape
        r_prev = state.r                                     # [W, T, 2]
        r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])  # [W, T]

        x_n = jnp.take(self.x, part_ids, axis=1)             # [T, W, P]
        # log_phi[t, w, p]: r_sum unless candidate repeats the last token
        same = part_ids == last_tokens[:, None]              # [W, P]
        log_phi = jnp.where(same[None], r_prev[..., 1].T[:, :, None],
                            r_sum.T[:, :, None])             # [T, W, P]

        start = jnp.maximum(out_len, 1)
        ts = jnp.arange(self.T)
        active = (ts >= start)[:, None, None]                # [T, 1, 1]

        # initial row t=0: r_n = x_n[0] iff out_len == 0 (ctc_prefix_score.py:129-130)
        r_n0 = jnp.where(out_len == 0, x_n[0], LOGZERO)      # [W, P]

        def compose(lhs, rhs):
            a1, b1 = lhs
            a2, b2 = rhs
            return a2 + a1, jnp.logaddexp(a2 + b1, b2)

        # r_n: elements t>=1 are (A=x_n[t], B=phi[t-1]+x_n[t]) when active,
        # (LOGZERO, LOGZERO) otherwise; t=0 is the seed (LOGZERO, r_n0).
        la_n = jnp.where(active, x_n, LOGZERO).at[0].set(LOGZERO)
        contrib = jnp.where(active[1:], log_phi[:-1] + x_n[1:], LOGZERO)
        lb_n = jnp.concatenate([r_n0[None], contrib], axis=0)
        _, r_n = jax.lax.associative_scan(compose, (la_n, lb_n))  # [T, W, P]

        # r_b: A=x_b[t], B=r_n[t-1]+x_b[t] when active; seed LOGZERO at t=0.
        xb = self.xb[:, None, None]                          # [T, 1, 1]
        la_b = jnp.where(active, jnp.broadcast_to(xb, (self.T, w, p)),
                         LOGZERO).at[0].set(LOGZERO)
        lb_b = jnp.concatenate(
            [jnp.full((1, w, p), LOGZERO, jnp.float32),
             jnp.where(active[1:], r_n[:-1] + xb[1:], LOGZERO)], axis=0)
        _, r_b = jax.lax.associative_scan(compose, (la_b, lb_b))  # [T, W, P]

        # psi = logaddexp(r_n0, sum_t active phi[t-1]+x_n[t]) — plain reduce
        psi = jnp.logaddexp(r_n0, jax.nn.logsumexp(contrib, axis=0))

        r_new = jnp.stack([r_n, r_b], axis=2)                # [T, W, 2, P]
        r_new = jnp.moveaxis(r_new, 0, 1)                    # [W, T, 2, P]

        # eos candidates score the whole-prefix probability (line 181-182)
        eos_psi = r_sum[:, self.end_frame]                   # [W]
        log_psi = jnp.where(part_ids == self.eos, eos_psi[:, None], psi)
        log_psi = jnp.where(part_ids == self.blank, LOGZERO, log_psi)
        return log_psi, r_new, r_sum

    def select_state(self, state: CTCPrefixState, r_new: Array, log_psi: Array,
                     part_ids: Array, hyp_idx: Array, tokens: Array
                     ) -> CTCPrefixState:
        """Gather the DP state for chosen (hypothesis, token) pairs.

        hyp_idx, tokens: [W'] winners. Tokens outside a hyp's part_ids fall
        back to slot 0 with prefix score LOGZERO (reference lines 205-213).
        """
        sel_part = part_ids[hyp_idx]                          # [W', P]
        match = sel_part == tokens[:, None]
        found = match.any(axis=1)
        pos = jnp.argmax(match, axis=1)                       # 0 fallback
        r = r_new[hyp_idx, :, :, :]                           # [W', T, 2, P]
        r = jnp.take_along_axis(r, pos[:, None, None, None], axis=3)[..., 0]
        s = jnp.where(found,
                      jnp.take_along_axis(log_psi[hyp_idx], pos[:, None], axis=1)[:, 0],
                      LOGZERO)
        # eos/kept hyps: keep previous prefix state irrelevant (they retire)
        return CTCPrefixState(r=r, s=s)

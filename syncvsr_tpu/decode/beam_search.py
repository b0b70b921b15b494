"""Jittable hybrid CTC/attention beam search.

Replaces the reference's Python-loop BatchBeamSearch
(espnet/nets/batch_beam_search.py:12-349, beam_search.py:330-400) with a single
compiled `lax.fori_loop`: static beam width W, pre-beam P candidates scored by
the CTC prefix DP, score composition
    total = w_dec * logp_dec + w_ctc * (psi - s_prev) + penalty + w_lm * logp_lm
(weights decoder=1-ctc_weight, ctc=ctc_weight, length_bonus=penalty — reference
LRS/video/lightning.py:237-279), an alive/finished split with 2W candidates per
step (subsumes espnet's shrink-the-running-set bookkeeping under static
shapes), and forced eos on the final step (beam_search.py's "add eos in the
final loop" with maxlenratio=0).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from syncvsr_tpu.decode.ctc_prefix import LOGZERO, CTCPrefixScorer, CTCPrefixState

Array = jax.Array


@dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 40
    pre_beam_ratio: float = 1.5
    ctc_weight: float = 0.1
    lm_weight: float = 0.0
    penalty: float = 0.0
    blank: int = 0
    # espnet BeamSearch length-ratio knobs (beam_search.py:330-360): when
    # maxlenratio > 0 the decode loop runs floor(maxlenratio * valid_frames)
    # steps instead of max_len; minlenratio blocks eos (except at the forced
    # final step) until floor(minlenratio * valid_frames) inner tokens are
    # emitted — upstream espnet's `i >= minlen` gate. NOTE the reference's
    # *vendored* espnet copy computes minlen but never enforces it
    # (beam_search.py:355 vs post_process:408 — a dead knob there); this
    # implements the documented upstream semantics instead. The published
    # configs use 0.0 / 0.0 — the defaults here.
    maxlenratio: float = 0.0
    minlenratio: float = 0.0
    # sos = eos = vocab - 1 set at call time

    @property
    def pre_beam_size(self) -> int:
        return int(self.pre_beam_ratio * self.beam_size)


class BeamState(NamedTuple):
    alive_seq: Array     # [W, L]
    alive_score: Array   # [W]
    alive_last: Array    # [W]
    cache: Any           # decoder KV cache pytree, leading dim W
    ctc: CTCPrefixState
    lm_state: Any
    fin_seq: Array       # [W, L]
    fin_score: Array     # [W]
    fin_len: Array       # [W]


def _stage_bounds(l_max: int, first: int = 64, factor: int = 4) -> list:
    """Geometric cache-capacity schedule for staged decoding."""
    bounds, b = [], first
    while b < l_max:
        bounds.append(b)
        b *= factor
    bounds.append(l_max)
    return bounds


def beam_search(
    decoder_step: Callable[[Array, Array, Any, Array, Optional[Array]], Tuple[Array, Any]],
    init_cache: Callable[[int, int], Any],
    memory: Array,            # [T, D] encoder output (single utterance)
    memory_length: Array,     # scalar — valid frames
    ctc_log_probs: Array,     # [T, V]
    vocab: int,
    config: BeamSearchConfig,
    max_len: Optional[int] = None,
    lm_step: Optional[Callable] = None,
    lm_init: Optional[Callable] = None,
    early_exit: bool = True,
    grow_cache: Optional[Callable[[Any, int], Any]] = None,
    grow_lm_state: Optional[Callable[[Any, int], Any]] = None,
) -> Tuple[Array, Array, Array]:
    """Returns (best_seq [L] without sos/eos padding -1, best_len, best_score).

    ``grow_cache(cache, new_len) -> cache`` (length axis padded, contents
    preserved) enables STAGED decoding: the sequential loop runs as a chain
    of while_loops whose decoder-cache capacity grows geometrically
    (64 -> 256 -> ... -> max_len). Every per-step cache read, write and
    beam-reorder gather then moves only the current stage's capacity instead
    of the full [W, layers, max_len, H, Dk] buffer — real transcripts are
    tens of tokens against max_len ~ T frames, so a trained model usually
    finishes inside the first stage and never touches the big buffers; even
    the no-early-exit worst case cuts ~30% of the cache traffic. Exact: the
    step math never reads positions > pos, so capacity is unobservable.
    ``grow_lm_state`` does the same for a length-axis LM cache (the
    TransformerLM's stacked K/V; RNN states have no length axis — pass
    None) — it also lets the LM cache follow max_len past its fixed init
    capacity."""
    w = config.beam_size
    p = min(config.pre_beam_size, vocab)
    t_enc = memory.shape[0]
    max_len = max_len or t_enc
    l_max = max_len + 2
    sos = eos = vocab - 1
    w_dec = 1.0 - config.ctc_weight
    w_ctc = config.ctc_weight

    # Effective length bounds (espnet beam_search.py:330-360). The loop bound
    # stays static at max_len; maxlenratio only tightens the *dynamic* stop
    # (floor(ratio * valid_frames), clamped to the compiled bound).
    if config.maxlenratio > 0.0:
        eff_maxlen = jnp.clip(
            (config.maxlenratio * memory_length).astype(jnp.int32),
            1, max_len)
    else:
        eff_maxlen = jnp.int32(max_len)
    eff_minlen = ((config.minlenratio * memory_length).astype(jnp.int32)
                  if config.minlenratio > 0.0 else jnp.int32(0))

    scorer = CTCPrefixScorer(ctc_log_probs, memory_length, config.blank, eos)

    mem = jnp.broadcast_to(memory[None], (w,) + memory.shape)
    mem_mask = (jnp.arange(t_enc)[None, :] < memory_length)
    mem_mask = jnp.broadcast_to(mem_mask, (w, t_enc))

    bounds = _stage_bounds(l_max) if grow_cache is not None else [l_max]

    lm0 = lm_init(w) if lm_init is not None else None
    if lm0 is not None and grow_lm_state is not None:
        # resize the (all-zeros) fresh LM cache to the first stage bound;
        # later stages grow it alongside the decoder cache
        lm0 = grow_lm_state(lm0, bounds[0])

    init = BeamState(
        alive_seq=jnp.full((w, l_max), -1, jnp.int32).at[:, 0].set(sos),
        alive_score=jnp.full((w,), LOGZERO, jnp.float32).at[0].set(0.0),
        alive_last=jnp.full((w,), sos, jnp.int32),
        cache=init_cache(w, bounds[0]),
        ctc=scorer.init_state(w),
        lm_state=lm0,
        fin_seq=jnp.full((w, l_max), -1, jnp.int32),
        fin_score=jnp.full((w,), LOGZERO, jnp.float32),
        fin_len=jnp.zeros((w,), jnp.int32),
    )

    def step(i, state: BeamState) -> BeamState:
        logp_dec, cache = decoder_step(state.alive_last, i, state.cache, mem, mem_mask)

        weighted = w_dec * logp_dec + config.penalty     # [W, V]
        if lm_step is not None and config.lm_weight != 0.0:
            logp_lm, lm_state = lm_step(state.alive_last, i, state.lm_state)
            weighted = weighted + config.lm_weight * logp_lm
        else:
            lm_state = state.lm_state

        # pre-beam on decoder scores (lightning.py:279 pre_beam_score_key="decoder")
        _, part_ids = jax.lax.top_k(logp_dec, p)          # [W, P]
        log_psi, r_new, _ = scorer.score_partial(state.ctc, state.alive_last,
                                                 part_ids, i)
        # dead prefixes (s == LOGZERO, e.g. a hyp that went through blank) must
        # not bounce back via psi - s telescoping; pin their extensions down
        valid_prefix = state.ctc.s > 0.5 * LOGZERO
        inc = jnp.where(valid_prefix[:, None],
                        w_ctc * (log_psi - state.ctc.s[:, None]), LOGZERO)
        weighted = weighted.at[jnp.arange(w)[:, None], part_ids].add(inc)

        total = weighted + state.alive_score[:, None]     # [W, V]
        # final step: only eos extensions allowed (>= so steps past a dynamic
        # eff_maxlen stay eos-only even on the static fori path)
        is_last = i >= eff_maxlen - 1
        eos_only = jnp.full((vocab,), LOGZERO).at[eos].set(0.0)
        total = jnp.where(is_last, total + eos_only[None, :], total)
        if config.minlenratio > 0.0:
            # eos at step i ends a hypothesis with i inner tokens; upstream
            # espnet allows it iff i >= minlen (forced final step wins)
            eos_ok = is_last | (i >= eff_minlen)
            total = total.at[:, eos].set(
                jnp.where(eos_ok, total[:, eos], LOGZERO))

        flat = total.reshape(-1)
        cand_score, cand_flat = jax.lax.top_k(flat, 2 * w)
        cand_hyp = cand_flat // vocab                     # [2W]
        cand_tok = cand_flat % vocab

        cand_seq = state.alive_seq[cand_hyp].at[:, i + 1].set(cand_tok)
        is_eos = cand_tok == eos

        # ---- finished pool: merge current finished with eos candidates ------
        fin_cand_score = jnp.where(is_eos, cand_score, LOGZERO)
        all_fin_score = jnp.concatenate([state.fin_score, fin_cand_score])
        all_fin_seq = jnp.concatenate([state.fin_seq, cand_seq], axis=0)
        all_fin_len = jnp.concatenate(
            [state.fin_len, jnp.full((2 * w,), i + 2, jnp.int32)])
        fin_score, fin_idx = jax.lax.top_k(all_fin_score, w)
        fin_seq = all_fin_seq[fin_idx]
        fin_len = all_fin_len[fin_idx]

        # ---- refill alive with the best non-eos candidates ------------------
        alive_cand_score = jnp.where(is_eos, LOGZERO, cand_score)
        alive_score, alive_idx = jax.lax.top_k(alive_cand_score, w)
        hyp_sel = cand_hyp[alive_idx]                     # [W] previous hyp row
        tok_sel = cand_tok[alive_idx]
        alive_seq = cand_seq[alive_idx]
        new_cache = jax.tree_util.tree_map(lambda c: c[hyp_sel], cache)
        new_lm_state = (jax.tree_util.tree_map(lambda c: c[hyp_sel], lm_state)
                        if lm_state is not None else None)
        new_ctc = scorer.select_state(state.ctc, r_new, log_psi, part_ids,
                                      hyp_sel, tok_sel)

        return BeamState(alive_seq=alive_seq, alive_score=alive_score,
                         alive_last=tok_sel, cache=new_cache, ctc=new_ctc,
                         lm_state=new_lm_state, fin_seq=fin_seq,
                         fin_score=fin_score, fin_len=fin_len)

    # Early termination (the role of espnet's end_detect, e2e_asr_common.py:19,
    # under static shapes): every score increment is <= 0 when penalty <= 0
    # and lm_weight >= 0 — decoder/LM emissions are log-probs and the CTC
    # prefix probability is monotone non-increasing under extension — so once
    # the best alive score cannot beat the best finished score, the returned
    # argmax can never change. Real transcripts are tens of tokens vs
    # max_len ~ T frames, so this usually cuts the sequential decode loop by
    # an order of magnitude. Positive length bonus breaks monotonicity; run
    # the full (bound-only) loop there.
    use_early = early_exit and config.penalty <= 0.0 and config.lm_weight >= 0.0

    def make_cond(bound: int):
        def cond(carry):
            i, state = carry
            go = i < jnp.minimum(eff_maxlen, bound)
            if use_early:
                go = go & (jnp.max(state.alive_score)
                           > jnp.max(state.fin_score))
            return go
        return cond

    def body(carry):
        i, state = carry
        return i + 1, step(i, state)

    carry = (jnp.int32(0), init)
    for k, bound in enumerate(bounds):
        if k:
            i_k, st = carry
            st = st._replace(cache=grow_cache(st.cache, bound))
            if st.lm_state is not None and grow_lm_state is not None:
                st = st._replace(lm_state=grow_lm_state(st.lm_state, bound))
            carry = (i_k, st)
        carry = jax.lax.while_loop(make_cond(bound), body, carry)
    final = carry[1]
    best = jnp.argmax(final.fin_score)
    best_len = final.fin_len[best]
    seq = final.fin_seq[best]
    # strip sos (pos 0) and eos (pos best_len-1); pad with -1
    inner = seq[1:]
    keep = jnp.arange(l_max - 1) < (best_len - 2)
    tokens = jnp.where(keep, inner, -1)
    return tokens, jnp.maximum(best_len - 2, 0), final.fin_score[best]

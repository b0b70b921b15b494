"""Beam search validation.

1. CTCPrefixScorer vs an independent per-candidate numpy DP (Algorithm 2 of
   the hybrid CTC/attention paper, written loop-wise from the math).
2. Full hybrid beam search vs exhaustive enumeration over all sequences on a
   toy vocab with a synthetic Markov decoder.
3. Integration: overfit a tiny sentence model on one sample, then beam-decode
   and recover the training transcript.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.decode import BeamSearchConfig, CTCPrefixScorer, beam_search
from syncvsr_tpu.decode.ctc_prefix import LOGZERO

logaddexp = np.logaddexp


def np_ctc_forward(log_probs, seq, blank=0):
    """Standard CTC forward: log P(seq | log_probs). Full-sequence score."""
    t_max, _ = log_probs.shape
    if len(seq) == 0:
        return log_probs[:, blank].sum()
    ext = [blank]
    for s in seq:
        ext += [s, blank]
    s_len = len(ext)
    alpha = np.full((t_max, s_len), -np.inf)
    alpha[0, 0] = log_probs[0, blank]
    alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, t_max):
        for s in range(s_len):
            a = alpha[t - 1, s]
            if s >= 1:
                a = logaddexp(a, alpha[t - 1, s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                a = logaddexp(a, alpha[t - 1, s - 2])
            alpha[t, s] = a + log_probs[t, ext[s]]
    return logaddexp(alpha[-1, -1], alpha[-1, -2])


def _np_extend_correct(log_probs, r_n, r_b, last, c, out_len, blank):
    t_max = log_probs.shape[0]
    phi = np.where(c == last, r_b, logaddexp(r_n, r_b)) if last is not None \
        else logaddexp(r_n, r_b)
    new_n = np.full(t_max, -np.inf)
    new_b = np.full(t_max, -np.inf)
    start = max(out_len, 1)
    if out_len == 0:
        new_n[0] = log_probs[0, c]
    for t in range(max(start, 1), t_max):
        new_n[t] = logaddexp(new_n[t - 1], phi[t - 1]) + log_probs[t, c]
        new_b[t] = logaddexp(new_n[t - 1], new_b[t - 1]) + log_probs[t, blank]
    return new_n, new_b


def np_prefix_scores_tracked(log_probs, prefix, blank, eos):
    """Like np_prefix_scores but with correct repeat handling along the prefix."""
    t_max, vocab = log_probs.shape
    r_n = np.full(t_max, -np.inf)
    r_b = np.cumsum(log_probs[:, blank])
    last = None
    for gi, g in enumerate(prefix):
        r_n, r_b = _np_extend_correct(log_probs, r_n, r_b, last, g, gi, blank)
        last = g
    psi = np.full(vocab, -np.inf)
    for c in range(vocab):
        if c == blank:
            continue
        if c == eos:
            psi[c] = logaddexp(r_n[-1], r_b[-1])
            continue
        phi = np.where(np.asarray(c == last), r_b, logaddexp(r_n, r_b)) \
            if last is not None else logaddexp(r_n, r_b)
        start = max(len(prefix), 1)
        acc = log_probs[0, c] if len(prefix) == 0 else -np.inf
        for t in range(start, t_max):
            acc = logaddexp(acc, phi[t - 1] + log_probs[t, c])
        psi[c] = acc
    return psi


def test_prefix_scorer_matches_numpy():
    rng = np.random.RandomState(0)
    t_max, vocab = 7, 5
    blank, eos = 0, vocab - 1
    logits = rng.randn(t_max, vocab).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

    scorer = CTCPrefixScorer(jnp.asarray(logp), jnp.asarray(t_max), blank, eos)
    w = 2
    prefixes = [[], [1], [1, 1], [2, 3], [1, 2, 1]]
    for prefix in prefixes:
        expected = np_prefix_scores_tracked(logp, prefix, blank, eos)
        # walk the jax scorer along the prefix
        state = scorer.init_state(w)
        last = jnp.full((w,), eos, jnp.int32)  # sos == eos id by convention
        part_ids = jnp.tile(jnp.arange(vocab)[None, :], (w, 1))
        for i, g in enumerate(prefix):
            psi, r_new, _ = scorer.score_partial(state, last, part_ids, i)
            state = scorer.select_state(state, r_new, psi, part_ids,
                                        jnp.zeros((w,), jnp.int32),
                                        jnp.full((w,), g, jnp.int32))
            last = jnp.full((w,), g, jnp.int32)
        psi, _, _ = scorer.score_partial(state, last, part_ids, len(prefix))
        got = np.asarray(psi)[0]
        exp = np.where(np.isinf(expected), LOGZERO, expected)
        mask = expected > -1e9  # compare non-logzero entries
        np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-4,
                                   err_msg=f"prefix={prefix}")


def test_beam_search_matches_exhaustive():
    """Exhaustive hybrid search on toy vocab == beam search best hypothesis."""
    rng = np.random.RandomState(3)
    vocab, t_max = 5, 6
    blank, eos = 0, vocab - 1
    ctc_weight, penalty = 0.3, 0.0
    max_len = 4

    ctc_logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(t_max, vocab).astype(np.float32) * 2), axis=-1))
    # Markov decoder: logp(next | last) from a fixed table
    table = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(vocab, vocab).astype(np.float32) * 2), axis=-1))

    def decoder_step(last, pos, cache, mem, mem_mask):
        return jnp.asarray(table)[last], cache

    def init_cache(w, l):
        return {"dummy": jnp.zeros((w, 1))}

    tokens, length, score = jax.jit(
        lambda m: beam_search(decoder_step, init_cache, m, jnp.asarray(t_max),
                              jnp.asarray(ctc_logp), vocab,
                              BeamSearchConfig(beam_size=25, ctc_weight=ctc_weight,
                                               penalty=penalty),
                              max_len=max_len))(jnp.zeros((t_max, 4)))

    # exhaustive: all sequences up to max_len-1 inner tokens
    def dec_score(seq):
        s, last = 0.0, eos  # sos == eos id
        for tok in seq:
            s += table[last, tok]
            last = tok
        return s + table[last, eos]

    best = (None, -np.inf)
    inner_vocab = [v for v in range(vocab) if v not in (blank, eos)]
    for n in range(0, max_len):
        for seq in itertools.product(inner_vocab, repeat=n):
            sc = ((1 - ctc_weight) * dec_score(seq)
                  + ctc_weight * np_ctc_forward(ctc_logp, list(seq), blank)
                  + penalty * (n + 1))
            if sc > best[1]:
                best = (list(seq), sc)

    got = [int(x) for x in np.asarray(tokens)[: int(length)]]
    assert got == best[0], f"beam={got} score={float(score):.4f} vs brute={best}"
    np.testing.assert_allclose(float(score), best[1], rtol=1e-4)


def test_overfit_and_decode():
    """Train a tiny sentence model on one batch, then beam-decode the
    transcript back (end-to-end: encoder -> ctc+att -> beam search)."""
    import numpy as np
    from syncvsr_tpu.data.synthetic import sentence_batch  # noqa
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from tests.test_sentence_model import tiny_batch, tiny_sentence_config
    from syncvsr_tpu.decode.api import make_beam_decoder, make_greedy_ctc_decoder

    config = tiny_sentence_config(**{"model.sync_lambda": 0.0,
                                     "model.encoder.msa_dropout": 0.0,
                                     "model.encoder.mlp_dropout": 0.0,
                                     "model.decoder.dropout": 0.0,
                                     "data.use_cutmix": False,
                                     "optim.lr": 3e-3, "optim.total_steps": 0})
    model = build_model(config)
    batch = tiny_batch(config, b=4, t=12, label_len=5, seed=7)
    batch["lengths"][:] = 12
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    step = build_train_step(donate=False)
    for _ in range(150):
        state, m = step(state, jb)
    assert float(m["decoder_acc"]) > 0.95, f"failed to overfit: {m}"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    decode = make_beam_decoder(model, variables,
                               BeamSearchConfig(beam_size=8, ctc_weight=0.1))
    target = [int(x) for x in batch["labels"][0] if x != -1]
    toks, n, score = decode(jb["videos"][:1], jb["lengths"][0])
    got = [int(x) for x in np.asarray(toks)[: int(n)]]
    assert got == target, f"beam decoded {got} != target {target}"

    greedy = make_greedy_ctc_decoder(model, variables)
    gtoks, glens = greedy(jb["videos"], jb["lengths"])
    ggot = [int(x) for x in np.asarray(gtoks)[0][: int(glens[0])]]
    assert ggot == target, f"greedy decoded {ggot} != target {target}"


def test_batched_beam_matches_single():
    """vmap'd batched beam decode == per-utterance decode."""
    import numpy as np
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model
    from tests.test_sentence_model import tiny_batch, tiny_sentence_config
    from syncvsr_tpu.decode.api import make_batched_beam_decoder, make_beam_decoder

    config = tiny_sentence_config()
    model = build_model(config)
    batch = tiny_batch(config, b=3, t=10, seed=11)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cfg = BeamSearchConfig(beam_size=5, ctc_weight=0.1)

    single = make_beam_decoder(model, variables, cfg, max_len=10)
    batched = make_batched_beam_decoder(model, variables, cfg, max_len=10)

    btoks, blens, bscores = batched(jb["videos"], jb["lengths"])
    for i in range(3):
        toks, n, score = single(jb["videos"][i:i + 1], jb["lengths"][i])
        got_b = [int(x) for x in np.asarray(btoks)[i][: int(blens[i])]]
        got_s = [int(x) for x in np.asarray(toks)[: int(n)]]
        assert got_b == got_s, f"utt {i}: batched {got_b} != single {got_s}"
        np.testing.assert_allclose(float(bscores[i]), float(score), rtol=1e-4)


def test_early_exit_matches_full_loop():
    """The while_loop early termination returns exactly the full fori_loop
    run's best hypothesis, length and score (monotone-score argument in
    beam_search.py)."""
    rng = np.random.RandomState(11)
    vocab, t_max = 6, 12
    ctc_logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(t_max, vocab).astype(np.float32) * 2), axis=-1))
    table = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(vocab, vocab).astype(np.float32) * 3), axis=-1))

    def decoder_step(last, pos, cache, mem, mem_mask):
        return jnp.asarray(table)[last], cache

    def init_cache(w, l):
        return {"dummy": jnp.zeros((w, 1))}

    def run(early):
        return jax.jit(lambda m: beam_search(
            decoder_step, init_cache, m, jnp.asarray(t_max),
            jnp.asarray(ctc_logp), vocab,
            BeamSearchConfig(beam_size=8, ctc_weight=0.3),
            max_len=t_max, early_exit=early))(jnp.zeros((t_max, 4)))

    toks_e, len_e, score_e = run(True)
    toks_f, len_f, score_f = run(False)
    assert int(len_e) == int(len_f)
    np.testing.assert_array_equal(np.asarray(toks_e), np.asarray(toks_f))
    np.testing.assert_allclose(float(score_e), float(score_f), rtol=1e-6)


def test_length_ratio_knobs_match_exhaustive():
    """maxlenratio/minlenratio (espnet beam_search.py:330-360) bound the
    hypothesis length exactly: the beam's best equals exhaustive search
    restricted to the same length window; ratio 0 (and a ratio that clips to
    the compiled bound) reproduce the unconstrained result."""
    rng = np.random.RandomState(3)
    vocab, t_max = 5, 6
    blank, eos = 0, vocab - 1
    ctc_weight = 0.3
    max_len = 4

    ctc_logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(t_max, vocab).astype(np.float32) * 2), axis=-1))
    table = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(vocab, vocab).astype(np.float32) * 2), axis=-1))

    def decoder_step(last, pos, cache, mem, mem_mask):
        return jnp.asarray(table)[last], cache

    def init_cache(w, l):
        return {"dummy": jnp.zeros((w, 1))}

    def run(maxlenratio=0.0, minlenratio=0.0):
        cfg = BeamSearchConfig(beam_size=25, ctc_weight=ctc_weight,
                               maxlenratio=maxlenratio,
                               minlenratio=minlenratio)
        toks, n, score = jax.jit(lambda m: beam_search(
            decoder_step, init_cache, m, jnp.asarray(t_max),
            jnp.asarray(ctc_logp), vocab, cfg,
            max_len=max_len))(jnp.zeros((t_max, 4)))
        return [int(x) for x in np.asarray(toks)[: int(n)]], float(score)

    def dec_score(seq):
        s, last = 0.0, eos
        for tok in seq:
            s += table[last, tok]
            last = tok
        return s + table[last, eos]

    def brute(n_lo, n_hi):
        best = (None, -np.inf)
        inner_vocab = [v for v in range(vocab) if v not in (blank, eos)]
        for n in range(n_lo, n_hi + 1):
            for seq in itertools.product(inner_vocab, repeat=n):
                sc = ((1 - ctc_weight) * dec_score(seq)
                      + ctc_weight * np_ctc_forward(ctc_logp, list(seq), blank))
                if sc > best[1]:
                    best = (list(seq), sc)
        return best

    base_toks, base_score = run()
    # floor(0.99 * 6) = 5 clips to the compiled bound (4) == unconstrained
    clip_toks, clip_score = run(maxlenratio=0.99)
    assert clip_toks == base_toks
    np.testing.assert_allclose(clip_score, base_score, rtol=1e-6)

    # maxlenratio 0.34: eff_maxlen = floor(.34*6) = 2 -> <= 1 inner token
    got, score = run(maxlenratio=0.34)
    want, want_score = brute(0, 1)
    assert got == want, f"maxlen: beam={got} vs brute={want}"
    np.testing.assert_allclose(score, want_score, rtol=1e-4)
    assert len(got) <= 1

    # minlenratio 0.5: eff_minlen = 3 -> eos allowed at step i >= 3 (upstream
    # espnet's i >= minlen gate) -> >= 3 inner tokens
    got, score = run(minlenratio=0.5)
    want, want_score = brute(3, max_len - 1)
    assert got == want, f"minlen: beam={got} vs brute={want}"
    np.testing.assert_allclose(score, want_score, rtol=1e-4)
    assert len(got) >= 3


def test_staged_cache_decode_matches_unstaged():
    """Staged cache growth (grow_cache, bounds 64 -> l_max) is exact: same
    hypothesis, length and score as the single full-capacity loop, with and
    without early exit (the no-early-exit run crosses the stage boundary)."""
    import numpy as np
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.models.decoder import grow_cache
    from syncvsr_tpu.decode.beam_search import _stage_bounds
    from tests.test_sentence_model import tiny_batch, tiny_sentence_config

    assert _stage_bounds(152) == [64, 152]
    assert _stage_bounds(40) == [40]
    assert _stage_bounds(2000) == [64, 256, 1024, 2000]

    config = tiny_sentence_config()
    model = build_model(config)
    t = 150  # l_max = 152 > 64 -> two stages
    batch = tiny_batch(config, b=1, t=t, seed=3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cfg = BeamSearchConfig(beam_size=4, ctc_weight=0.1)

    enc = model.apply(variables, jb["videos"], jb["lengths"], det=True,
                      method="encode")[0]
    flen = model.apply(variables, jb["videos"], jb["lengths"],
                       method="frame_lengths")[0]
    ctc_logp = model.apply(variables, enc[None], method="ctc_log_probs")[0]
    mem_kv = model.apply(variables, enc, method="decoder_precompute_memory")

    def decoder_step(y_prev, pos, cache, memory, memory_mask):
        return model.apply(variables, y_prev, pos, cache, memory,
                           memory_mask, mem_kv=mem_kv, method="decoder_step")

    def init_cache(w, l):
        return model.apply(variables, w, l, method="decoder_init_cache")

    for early in (True, False):
        run = jax.jit(lambda grow, early=early: beam_search(
            decoder_step, init_cache, enc, flen, ctc_logp,
            config.model.labels, cfg, early_exit=early,
            grow_cache=grow_cache if grow else None), static_argnums=0)
        toks_s, n_s, score_s = run(True)
        toks_u, n_u, score_u = run(False)
        assert int(n_s) == int(n_u), f"early={early}"
        np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_u))
        np.testing.assert_allclose(float(score_s), float(score_u), rtol=1e-5)


def test_staged_lm_fusion_matches_unstaged():
    """LM-fusion decode with the staged (grown) TransformerLM cache equals
    the fixed-capacity run, across the 64-slot stage boundary."""
    import numpy as np
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.models.decoder import grow_cache
    from syncvsr_tpu.models.lm import TransformerLM
    from tests.test_sentence_model import tiny_batch, tiny_sentence_config

    config = tiny_sentence_config()
    model = build_model(config)
    t = 150
    batch = tiny_batch(config, b=1, t=t, seed=13)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vocab = config.model.labels
    lm = TransformerLM(vocab=vocab, layers=2, dim=16, heads=2, hidden=32,
                       embed_dim=8, max_len=t + 2)
    lm_vars = {"params": lm.init(jax.random.PRNGKey(3),
                                 jnp.zeros((1, 4), jnp.int32))["params"]}
    cfg = BeamSearchConfig(beam_size=4, ctc_weight=0.1, lm_weight=0.4)

    enc = model.apply(variables, jb["videos"], jb["lengths"], det=True,
                      method="encode")[0]
    flen = model.apply(variables, jb["videos"], jb["lengths"],
                       method="frame_lengths")[0]
    ctc_logp = model.apply(variables, enc[None], method="ctc_log_probs")[0]
    mem_kv = model.apply(variables, enc, method="decoder_precompute_memory")

    def decoder_step(y_prev, pos, cache, memory, memory_mask):
        return model.apply(variables, y_prev, pos, cache, memory,
                           memory_mask, mem_kv=mem_kv, method="decoder_step")

    def init_cache(w, l):
        return model.apply(variables, w, l, method="decoder_init_cache")

    def lm_step(y_prev, pos, s):
        return lm.apply(lm_vars, y_prev, pos, s, method="step")

    def lm_init(w):
        return lm.apply(lm_vars, w, method="init_cache")

    def run(staged, early):
        return jax.jit(lambda: beam_search(
            decoder_step, init_cache, enc, flen, ctc_logp, vocab, cfg,
            lm_step=lm_step, lm_init=lm_init, early_exit=early,
            grow_cache=grow_cache if staged else None,
            grow_lm_state=grow_cache if staged else None))()

    for early in (True, False):
        toks_s, n_s, score_s = run(True, early)
        toks_u, n_u, score_u = run(False, early)
        assert int(n_s) == int(n_u), f"early={early}"
        np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_u))
        np.testing.assert_allclose(float(score_s), float(score_u), rtol=1e-5)

"""LM scorers: step/teacher-forced consistency and beam-search fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.models.lm import RNNLM, TransformerLM

VOCAB = 13


def test_transformer_lm_step_matches_forward():
    lm = TransformerLM(vocab=VOCAB, layers=2, dim=16, heads=2, hidden=32,
                       embed_dim=8)
    ys = jnp.asarray([[12, 3, 4, 5], [12, 6, 7, 8]])
    variables = lm.init(jax.random.PRNGKey(0), ys)
    tf_logp = jax.nn.log_softmax(lm.apply(variables, ys), axis=-1)

    cache = lm.apply(variables, 2, 8, method="init_cache")
    outs = []
    for pos in range(4):
        logp, cache = lm.apply(variables, ys[:, pos], jnp.asarray(pos), cache,
                               method="step")
        outs.append(logp)
    step_logp = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_logp), np.asarray(tf_logp),
                               rtol=1e-4, atol=1e-5)


def test_rnn_lm_step_matches_forward():
    lm = RNNLM(vocab=VOCAB, layers=2, dim=16, embed_dim=8)
    ys = jnp.asarray([[12, 3, 4, 5]])
    variables = lm.init(jax.random.PRNGKey(0), ys)
    tf_logp = lm.apply(variables, ys)  # already log-softmax per step
    state = lm.apply(variables, 1, method="init_cache")
    outs = []
    for pos in range(4):
        logp, state = lm.apply(variables, ys[:, pos], jnp.asarray(pos), state,
                               method="step")
        outs.append(logp)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(tf_logp), rtol=1e-5)


def test_beam_search_with_lm_fusion():
    """A strongly-biased LM changes the beam result vs lm_weight=0."""
    from syncvsr_tpu.decode import BeamSearchConfig, beam_search

    rng = np.random.RandomState(0)
    vocab, t_max = 6, 5
    ctc_logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(t_max, vocab).astype(np.float32)), axis=-1))
    table = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(vocab, vocab).astype(np.float32)), axis=-1))

    def decoder_step(last, pos, cache, mem, mem_mask):
        return jnp.asarray(table)[last], cache

    def init_cache(w, l):
        return {"d": jnp.zeros((w, 1))}

    # LM that strongly prefers token 2 everywhere
    # test-only scorer (not a normalized log-prob): rewards token 2 so longer
    # 2-sequences strictly beat early eos under fusion
    lm_bias = np.full((vocab,), -20.0, np.float32)
    lm_bias[2] = 3.0
    lm_bias[vocab - 1] = 0.0

    def lm_step(last, pos, state):
        return jnp.broadcast_to(jnp.asarray(lm_bias), (last.shape[0], vocab)), state

    def lm_init(w):
        return {"s": jnp.zeros((w, 1))}

    common = dict(max_len=3)
    mem = jnp.zeros((t_max, 4))
    res0 = beam_search(decoder_step, init_cache, mem, jnp.asarray(t_max),
                       jnp.asarray(ctc_logp), vocab,
                       BeamSearchConfig(beam_size=6, ctc_weight=0.2,
                                        lm_weight=0.0),
                       lm_step=lm_step, lm_init=lm_init, **common)
    res1 = beam_search(decoder_step, init_cache, mem, jnp.asarray(t_max),
                       jnp.asarray(ctc_logp), vocab,
                       BeamSearchConfig(beam_size=6, ctc_weight=0.2,
                                        lm_weight=5.0),
                       lm_step=lm_step, lm_init=lm_init, **common)
    seq0 = [int(x) for x in np.asarray(res0[0])[: int(res0[1])]]
    seq1 = [int(x) for x in np.asarray(res1[0])[: int(res1[1])]]
    assert seq1 == [2, 2], f"LM-fused beam should emit 2s, got {seq1}"
    assert seq0 != seq1

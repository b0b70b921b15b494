"""Per-component timing of the beam-search decode step at lrs3 scale.

The full hybrid search runs ~4 ms/sequential-step (beam 40, vocab 5049,
T=500 — tools/bench_decode beam). This tool times each component in its own
compiled loop (scan over N iterations to amortize dispatch) to show where
that budget goes: the CTC prefix scorer (associative-scan DP), the KV-cached
decoder step, the candidate top_k's, and the beam-state gathers.

Usage: python -m syncvsr_tpu.tools.bench_beam_parts [T] [beam]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from syncvsr_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np


def _timeit(fn, *args, iters=3):
    out = fn(*args)
    sync = lambda o: float(np.asarray(jax.tree_util.tree_leaves(o)[0]).reshape(-1)[0])
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(t_enc=500, beam=40, n_steps=50, vocab=5049):
    p = int(1.5 * beam)
    rng = np.random.RandomState(0)
    from syncvsr_tpu.decode.ctc_prefix import CTCPrefixScorer

    logp = jnp.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(t_enc, vocab), jnp.float32)))
    scorer = CTCPrefixScorer(logp, jnp.asarray(t_enc), 0, vocab - 1)

    @jax.jit
    def loop_scorer(r0):
        def body(i, state):
            last = jnp.full((beam,), 3, jnp.int32)
            ids = jnp.tile(jnp.arange(p)[None], (beam, 1)) + (i % 7)
            psi, r_new, _ = scorer.score_partial(state, last, ids, i)
            return scorer.select_state(state, r_new, psi, ids,
                                       jnp.arange(beam) % beam,
                                       ids[:, 0])
        return jax.lax.fori_loop(0, n_steps, body, r0)

    ms_scorer = _timeit(loop_scorer, scorer.init_state(beam)) / n_steps * 1e3

    # decoder step loop at lrs3 scale, precomputed mem_kv
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import create_train_state

    config = lrs3_config().override(**{"data.batch_size": 2})
    model = build_model(config)
    init = sentence_batch(config, 2, num_frames=32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init.items()})
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    dim = config.model.encoder.dim
    enc = jnp.asarray(rng.randn(t_enc, dim), jnp.float32)
    keep = jnp.ones((beam, t_enc), bool)
    l_max = t_enc + 2

    @jax.jit
    def loop_decoder(variables, cache0):
        mem_kv = model.apply(variables, enc,
                             method="decoder_precompute_memory")
        mem = jnp.broadcast_to(enc[None], (beam,) + enc.shape)

        def body(i, carry):
            cache, acc = carry
            y = jnp.full((beam,), 5, jnp.int32)
            logp_dec, cache = model.apply(variables, y, i, cache, mem, keep,
                                          mem_kv=mem_kv, method="decoder_step")
            return cache, acc + logp_dec[0, 0]

        return jax.lax.fori_loop(0, n_steps, body, (cache0, 0.0))[1]

    cache0 = model.apply(variables, beam, l_max, method="decoder_init_cache")
    ms_dec = _timeit(loop_decoder, variables, cache0) / n_steps * 1e3

    @jax.jit
    def loop_decoder_reproject(variables, cache0):
        mem = jnp.broadcast_to(enc[None], (beam,) + enc.shape)

        def body(i, carry):
            cache, acc = carry
            y = jnp.full((beam,), 5, jnp.int32)
            logp_dec, cache = model.apply(variables, y, i, cache, mem, keep,
                                          method="decoder_step")
            return cache, acc + logp_dec[0, 0]

        return jax.lax.fori_loop(0, n_steps, body, (cache0, 0.0))[1]

    ms_dec_re = _timeit(loop_decoder_reproject, variables, cache0) / n_steps * 1e3

    # cache gather (beam reorder) per step
    @jax.jit
    def loop_gather(cache0):
        def body(i, cache):
            sel = (jnp.arange(beam) + i) % beam
            return jax.tree_util.tree_map(lambda c: c[sel], cache)
        return jax.lax.fori_loop(0, n_steps, body, cache0)

    ms_gather = _timeit(loop_gather, cache0) / n_steps * 1e3

    # the two top_k's + flat candidate select
    total = jnp.asarray(rng.randn(beam, vocab), jnp.float32)

    @jax.jit
    def loop_topk(total):
        def body(i, acc):
            t = total + acc
            _, part = jax.lax.top_k(t, p)
            sc, _ = jax.lax.top_k(t.reshape(-1), 2 * beam)
            return acc + sc[0] * 1e-9 + part[0, 0] * 1e-12
        return jax.lax.fori_loop(0, n_steps, body, 0.0)

    ms_topk = _timeit(loop_topk, total) / n_steps * 1e3

    print(json.dumps({
        "t_enc": t_enc, "beam": beam, "pre_beam": p, "vocab": vocab,
        "ms_scorer": round(ms_scorer, 3),
        "ms_decoder_memkv": round(ms_dec, 3),
        "ms_decoder_reproject": round(ms_dec_re, 3),
        "ms_cache_gather": round(ms_gather, 3),
        "ms_topk": round(ms_topk, 3),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 40)

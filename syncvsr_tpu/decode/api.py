"""High-level decoding entry points over a trained SentenceVSRModel."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax

from syncvsr_tpu.decode.beam_search import BeamSearchConfig, beam_search
from syncvsr_tpu.ops.ctc import ctc_greedy_decode

Array = jax.Array


def _lm_grow(lm):
    """Staged-decode growth hook for the LM cache: the TransformerLM's
    stacked K/V shares the decoder cache layout ([W, layers, L, H, Dk]);
    RNN states carry no length axis -> None (left untouched by staging)."""
    from syncvsr_tpu.models.decoder import grow_cache
    from syncvsr_tpu.models.lm import TransformerLM

    return grow_cache if isinstance(lm, TransformerLM) else None


def make_beam_decoder(model, variables: Dict[str, Any],
                      config: BeamSearchConfig,
                      max_len: Optional[int] = None,
                      lm=None, lm_variables: Optional[Dict[str, Any]] = None,
                      early_exit: bool = True):
    """Builds a jitted single-utterance decoder.

    Returns fn(videos [1, T, ...], length) -> (tokens [L], n_tokens, score),
    mirroring the reference's per-utterance test loop
    (LRS/video/lightning.py:114-129) but fully compiled. Pass an LM module
    (models.lm) + its variables and set config.lm_weight for shallow fusion.
    ``early_exit=False`` forces the full sequential loop (worst-case
    benchmarking).
    """
    vocab = model.cfg.labels

    # `variables` (and lm weights) are jit *arguments*, not closure captures:
    # captured arrays get baked into the program as constants, which bloats
    # the serialized module by the full parameter size (hundreds of MB at
    # lrs3 scale — enough to wedge an AOT compile service) and forces a
    # recompile per checkpoint.
    @jax.jit
    def decode_impl(variables, lm_variables, videos: Array, length: Array
                    ) -> Tuple[Array, Array, Array]:
        enc = model.apply(variables, videos, length[None], det=True,
                          method="encode")[0]              # [T, D]
        flen = model.apply(variables, videos, length[None],
                           method="frame_lengths")[0]
        ctc_logp = model.apply(variables, enc[None], method="ctc_log_probs")[0]
        # cross-attention K/V over the memory: projected once, not per step
        mem_kv = model.apply(variables, enc,
                             method="decoder_precompute_memory")

        def decoder_step(y_prev, pos, cache, memory, memory_mask):
            return model.apply(variables, y_prev, pos, cache, memory,
                               memory_mask, mem_kv=mem_kv,
                               method="decoder_step")

        def init_cache(w, l):
            return model.apply(variables, w, l, method="decoder_init_cache")

        lm_step = lm_init = None
        if lm is not None and config.lm_weight != 0.0:
            def lm_step(y_prev, pos, state):
                return lm.apply(lm_variables, y_prev, pos, state,
                                method="step")

            def lm_init(w):
                return lm.apply(lm_variables, w, method="init_cache")

        from syncvsr_tpu.models.decoder import grow_cache

        return beam_search(decoder_step, init_cache, enc, flen, ctc_logp,
                           vocab, config, max_len=max_len,
                           lm_step=lm_step, lm_init=lm_init,
                           early_exit=early_exit, grow_cache=grow_cache,
                           grow_lm_state=_lm_grow(lm))

    def decode(videos: Array, length: Array):
        return decode_impl(variables, lm_variables, videos, length)

    return decode


def make_batched_beam_decoder(model, variables: Dict[str, Any],
                              config: BeamSearchConfig,
                              max_len: int,
                              lm=None,
                              lm_variables: Optional[Dict[str, Any]] = None,
                              mesh=None):
    """vmap the compiled beam search over a batch of utterances — every shape
    inside the search is static, so the whole batch decodes in one XLA program
    (the reference decodes one utterance at a time, data_module.py:104).
    ``max_len`` must be fixed (the padded/bucketed frame count). LM shallow
    fusion mirrors ``make_beam_decoder``.

    With ``mesh``, the batch is sharded over the mesh's ``data`` axis
    (weights replicated): each chip decodes its shard of the bucket in the
    same program — multi-chip eval for free under GSPMD, since the vmap'd
    search is embarrassingly parallel over utterances. Batch size must be a
    multiple of the data-axis size (the eval loader's fixed padded batches
    are)."""
    vocab = model.cfg.labels

    jit_kw = {}
    if mesh is not None:
        from syncvsr_tpu.parallel.mesh import batch_sharding, replicated

        repl, data = replicated(mesh), batch_sharding(mesh)
        jit_kw = {"in_shardings": (repl, repl, data, data)}

    @partial(jax.jit, **jit_kw)
    def decode_impl(variables, lm_variables, videos: Array, lengths: Array):
        def init_cache(w, l):
            return model.apply(variables, w, l, method="decoder_init_cache")

        lm_step = lm_init = None
        if lm is not None and config.lm_weight != 0.0:
            def lm_step(y_prev, pos, state):
                return lm.apply(lm_variables, y_prev, pos, state,
                                method="step")

            def lm_init(w):
                return lm.apply(lm_variables, w, method="init_cache")

        def one(enc, length, ctc_logp):
            mem_kv = model.apply(variables, enc,
                                 method="decoder_precompute_memory")

            def decoder_step(y_prev, pos, cache, memory, memory_mask):
                return model.apply(variables, y_prev, pos, cache, memory,
                                   memory_mask, mem_kv=mem_kv,
                                   method="decoder_step")

            from syncvsr_tpu.models.decoder import grow_cache

            return beam_search(decoder_step, init_cache, enc, length, ctc_logp,
                               vocab, config, max_len=max_len,
                               lm_step=lm_step, lm_init=lm_init,
                               grow_cache=grow_cache,
                               grow_lm_state=_lm_grow(lm))

        enc = model.apply(variables, videos, lengths, det=True, method="encode")
        flens = model.apply(variables, videos, lengths, method="frame_lengths")
        ctc_logp = model.apply(variables, enc, method="ctc_log_probs")
        return jax.vmap(one)(enc, flens, ctc_logp)

    def decode(videos: Array, lengths: Array):
        return decode_impl(variables, lm_variables, videos, lengths)

    return decode


def make_forced_aligner(model, variables: Dict[str, Any], mesh=None):
    """Batched CTC forced alignment of ground-truth transcripts: the
    most-likely frame-level token path (blank between emissions), -1 past
    each clip's frame length. Role of the reference CTC class's
    ``forced_align`` (espnet/nets/pytorch_backend/ctc.py:181-245), batched
    and compiled; with ``mesh``, the batch shards over the data axis.

    Returns fn(videos [B,T,...], lengths [B], labels [B,N] padded with -1)
    -> align [B, Tf] int32."""
    from syncvsr_tpu.ops.ctc import ctc_forced_align

    jit_kw = {}
    if mesh is not None:
        from syncvsr_tpu.parallel.mesh import batch_sharding, replicated

        b = batch_sharding(mesh)
        jit_kw = {"in_shardings": (replicated(mesh), b, b, b)}

    @partial(jax.jit, **jit_kw)
    def align_impl(variables, videos: Array, lengths: Array,
                   labels: Array) -> Array:
        import jax.numpy as jnp

        enc = model.apply(variables, videos, lengths, det=True,
                          method="encode")
        flens = model.apply(variables, videos, lengths,
                            method="frame_lengths")
        ctc_logp = model.apply(variables, enc, method="ctc_log_probs")
        label_lengths = (labels >= 0).sum(axis=1)
        # log_softmax is idempotent, so feeding log-probs is exact
        return ctc_forced_align(ctc_logp, flens, jnp.maximum(labels, 0),
                                label_lengths)

    def align(videos: Array, lengths: Array, labels: Array):
        return align_impl(variables, videos, lengths, labels)

    return align


def make_greedy_ctc_decoder(model, variables: Dict[str, Any], mesh=None):
    """Batched greedy CTC decoding (no decoder/LM) — the fast path. With
    ``mesh``, the batch is sharded over the data axis (see
    make_batched_beam_decoder)."""

    jit_kw = {}
    if mesh is not None:
        from syncvsr_tpu.parallel.mesh import batch_sharding, replicated

        jit_kw = {"in_shardings": (replicated(mesh), batch_sharding(mesh),
                                   batch_sharding(mesh))}

    @partial(jax.jit, **jit_kw)
    def decode_impl(variables, videos: Array, lengths: Array
                    ) -> Tuple[Array, Array]:
        enc = model.apply(variables, videos, lengths, det=True, method="encode")
        flens = model.apply(variables, videos, lengths, method="frame_lengths")
        ctc_logp = model.apply(variables, enc, method="ctc_log_probs")
        return ctc_greedy_decode(ctc_logp, flens)

    def decode(videos: Array, lengths: Array):
        return decode_impl(variables, videos, lengths)

    return decode

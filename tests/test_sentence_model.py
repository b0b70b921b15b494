"""Sentence-level E2E: rel-shift numerics, conformer shapes, loss algebra,
decoder cache consistency, sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.config import lrs3_config
from syncvsr_tpu.data.synthetic import sentence_batch
from syncvsr_tpu.engine import build_train_step, create_train_state
from syncvsr_tpu.models import build_model
from syncvsr_tpu.models.conformer import rel_shift, rel_sinusoid_table
from syncvsr_tpu.parallel import shard_batch


def tiny_sentence_config(**extra):
    c = lrs3_config()
    o = {
        "model.frontend.kind": "landmark", "model.frontend.input_features": 8,
        "model.encoder.layers": 2, "model.encoder.dim": 16, "model.encoder.heads": 2,
        "model.encoder.conv_kernel": 7,
        "model.decoder.layers": 2, "model.decoder.dim": 16, "model.decoder.heads": 2,
        "model.decoder.hidden": 32,
        "model.labels": 13, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32",
        "data.batch_size": 8, "optim.total_steps": 100, "optim.warmup_steps": 5,
    }
    o.update(extra)
    return c.override(**o)


def tiny_batch(config, b=8, t=12, label_len=6, seed=0):
    rng = np.random.RandomState(seed)
    codec = config.model.codec
    lengths = rng.randint(t // 2, t + 1, (b,)).astype(np.int32)
    lengths[0] = t
    labels = np.full((b, label_len), -1, np.int32)
    for i in range(b):
        n = rng.randint(1, label_len)
        labels[i, :n] = rng.randint(1, config.model.labels - 1, (n,))
    return {
        "videos": rng.randn(b, t, config.model.frontend.input_features).astype(np.float32),
        "lengths": lengths,
        "labels": labels,
        "audio_tokens": rng.randint(0, codec.audio_vocab_size,
                                    (b, t * codec.audio_alignment + 4,
                                     codec.vq_groups)).astype(np.int32),
    }


def test_rel_shift_semantics():
    """After rel_shift, out[..., i, j] == in[..., i, (T-1) + (j - i)] so column j
    holds the score for relative distance i-j (pos_emb index T-1-(i-j))."""
    b, h, t = 1, 1, 4
    x = jnp.arange(t * (2 * t - 1), dtype=jnp.float32).reshape(1, 1, t, 2 * t - 1)
    y = np.asarray(rel_shift(x))
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(y[0, 0, i, j], x[0, 0, i, (t - 1) + j - i])


def test_rel_sinusoid_table():
    pe = np.asarray(rel_sinusoid_table(3, 8))
    assert pe.shape == (5, 8)
    # center row is position 0: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[2, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(pe[2, 1::2], 1.0, atol=1e-6)


def test_e2e_forward_loss_algebra():
    config = tiny_sentence_config()
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(config).items()}
    state = create_train_state(config, model, batch)
    m = state.apply_fn({"params": state.params,
                        "batch_stats": state.batch_stats}, **batch, det=True)
    a = config.model.mtlalpha
    np.testing.assert_allclose(
        float(m["loss"]),
        a * float(m["loss_ctc"]) + (1 - a) * float(m["loss_att"])
        + config.model.sync_lambda * float(m["loss_audio"]),
        rtol=1e-5)
    assert np.isfinite(float(m["loss"]))


def test_e2e_padding_invariance():
    """Extending padding frames must not change any loss term."""
    config = tiny_sentence_config()
    model = build_model(config)
    batch = tiny_batch(config, b=4, t=8)
    batch["lengths"][:] = 6
    b1 = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, b1)
    m1 = state.apply_fn({"params": state.params,
                         "batch_stats": state.batch_stats}, **b1, det=True)

    # corrupt the padding region of videos and audio tokens
    batch2 = {k: np.array(v) for k, v in batch.items()}
    batch2["videos"][:, 6:] = 99.0
    batch2["audio_tokens"][:, 6 * 4:] = 3
    b2 = {k: jnp.asarray(v) for k, v in batch2.items()}
    m2 = state.apply_fn({"params": state.params,
                         "batch_stats": state.batch_stats}, **b2, det=True)
    np.testing.assert_allclose(float(m1["loss_ctc"]), float(m2["loss_ctc"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["loss_att"]), float(m2["loss_att"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["loss_audio"]), float(m2["loss_audio"]), rtol=1e-4)


def test_decoder_step_matches_teacher_forced():
    """KV-cached stepwise decoding must reproduce the teacher-forced logits."""
    config = tiny_sentence_config()
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(config, b=2, t=6).items()}
    state = create_train_state(config, model, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    enc = model.apply(variables, batch["videos"], batch["lengths"], det=True,
                      method="encode")
    from syncvsr_tpu.ops.masking import length_mask
    pad_mask = length_mask(batch["lengths"], enc.shape[1])

    ys = jnp.asarray([[12, 3, 4, 5], [12, 6, 7, 8]])  # sos + 3 tokens
    lens = jnp.asarray([4, 4])
    tf_logits = model.apply(variables, ys, lens, enc, pad_mask, det=True,
                            method=lambda m, *a, **k: m.decoder(*a, **k))
    tf_logp = jax.nn.log_softmax(tf_logits, axis=-1)

    cache = model.apply(variables, 2, 8, method="decoder_init_cache")
    step_logps = []
    for pos in range(4):
        logp, cache = model.apply(variables, ys[:, pos], jnp.asarray(pos), cache,
                                  enc, pad_mask, method="decoder_step")
        step_logps.append(logp)
    step_logp = jnp.stack(step_logps, axis=1)
    np.testing.assert_allclose(np.asarray(step_logp), np.asarray(tf_logp),
                               rtol=1e-4, atol=1e-5)


def test_decoder_step_mem_kv_matches_projected():
    """Precomputed cross-attention K/V (the beam-search fast path) must give
    the same step log-probs as per-step projection over broadcast memory."""
    config = tiny_sentence_config()
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(config, b=2, t=6).items()}
    state = create_train_state(config, model, batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    enc = model.apply(variables, batch["videos"], batch["lengths"], det=True,
                      method="encode")
    from syncvsr_tpu.ops.masking import length_mask
    enc0 = enc[0]                                      # [T, D] one utterance
    w = 3                                              # "beam" rows
    mem = jnp.broadcast_to(enc0[None], (w,) + enc0.shape)
    keep = length_mask(batch["lengths"][:1], enc.shape[1])[0]
    keep_w = jnp.broadcast_to(keep[None], (w, keep.shape[0]))

    mem_kv = model.apply(variables, enc0, method="decoder_precompute_memory")
    ys = jnp.asarray([[12, 3, 4], [12, 5, 6], [12, 7, 8]]).T  # [pos, w]
    cache_a = model.apply(variables, w, 8, method="decoder_init_cache")
    cache_b = model.apply(variables, w, 8, method="decoder_init_cache")
    for pos in range(3):
        logp_a, cache_a = model.apply(variables, ys[pos], jnp.asarray(pos),
                                      cache_a, mem, keep_w,
                                      method="decoder_step")
        logp_b, cache_b = model.apply(variables, ys[pos], jnp.asarray(pos),
                                      cache_b, mem, keep_w, mem_kv=mem_kv,
                                      method="decoder_step")
        np.testing.assert_allclose(np.asarray(logp_b), np.asarray(logp_a),
                                   rtol=1e-4, atol=1e-5)


def test_sentence_train_step(mesh8):
    config = tiny_sentence_config()
    model = build_model(config)
    batch = tiny_batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    step = build_train_step(mesh8)
    sb = shard_batch(mesh8, batch)
    losses = []
    for _ in range(4):
        state, m = step(state, sb)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_audio_backbone_path():
    """Raw-audio conv1d frontend: lengths in samples -> frames (//640)."""
    config = tiny_sentence_config(**{
        "model.frontend.kind": "conv1d_resnet", "model.frontend.resnet_width": 8})
    model = build_model(config)
    rng = np.random.RandomState(0)
    b, t = 4, 8
    s = t * 640
    lengths = np.full((b,), s, np.int32)
    lengths[1] = 5 * 640
    batch = {
        "videos": rng.randn(b, s).astype(np.float32) * 0.1,
        "lengths": jnp.asarray(lengths),
        "labels": jnp.asarray([[1, 2, -1]] * b),
        "audio_tokens": jnp.asarray(
            rng.randint(0, 11, (b, t * 4 + 4, 2)), jnp.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    from syncvsr_tpu.engine import create_train_state

    state = create_train_state(config, model, batch)
    m = state.apply_fn({"params": state.params, "batch_stats": state.batch_stats},
                       **batch, det=True)
    assert np.isfinite(float(m["loss"]))
    enc = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                      batch["videos"], batch["lengths"], det=True, method="encode")
    assert enc.shape[1] == t  # 640 samples -> 1 frame

"""Word-level model: shapes, loss algebra, CutMix, and a sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncvsr_tpu.config import lrw_landmark_config, lrw_video_config
from syncvsr_tpu.data.synthetic import word_batch
from syncvsr_tpu.engine import build_eval_step, build_train_step, create_train_state
from syncvsr_tpu.models import build_model
from syncvsr_tpu.ops.cutmix import temporal_cutmix
from syncvsr_tpu.parallel import shard_batch


def tiny_landmark_config():
    c = lrw_landmark_config()
    c = c.override(**{
        "model.encoder.layers": 2, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.frontend.input_features": 12,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32", "data.batch_size": 8, "data.num_frames": 6,
        "optim.total_steps": 100, "optim.warmup_steps": 10,
    })
    return c


def test_landmark_forward_and_loss():
    config = tiny_landmark_config()
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in word_batch(config).items()}
    state = create_train_state(config, model, batch)
    metrics = state.apply_fn({"params": state.params}, **batch, det=True)
    assert set(metrics) >= {"loss", "loss_word", "loss_audio", "acc1", "acc5"}
    # composite: loss = word + lambda * audio (training.py:79)
    np.testing.assert_allclose(
        float(metrics["loss"]),
        float(metrics["loss_word"]) + config.model.sync_lambda * float(metrics["loss_audio"]),
        rtol=1e-5)
    assert 0.0 <= float(metrics["acc1"]) <= float(metrics["acc5"]) <= 1.0


def test_cutmix_preserves_mass():
    rng = jax.random.PRNGKey(0)
    b, t, f = 4, 10, 3
    x = jnp.arange(b * t * f, dtype=jnp.float32).reshape(b, t, f)
    labels = jax.nn.one_hot(jnp.arange(b) % 2, 5)
    tokens = jnp.tile(jnp.arange(b)[:, None, None], (1, t * 4, 2)).astype(jnp.int32)
    xm, lm, tm, _ = temporal_cutmix(rng, x, labels, tokens, None, alpha=1.0)
    assert xm.shape == x.shape and lm.shape == labels.shape and tm.shape == tokens.shape
    # labels remain a distribution
    np.testing.assert_allclose(np.asarray(lm.sum(-1)), 1.0, rtol=1e-5)
    # every mixed frame comes from either self or the flipped partner
    flipped = jnp.flip(x, axis=0)
    ok = (xm == x) | (xm == flipped)
    assert bool(ok.all())


def test_train_step_runs_and_improves(mesh8):
    config = tiny_landmark_config()
    model = build_model(config)
    batch = word_batch(config)
    state = create_train_state(config, model, {k: jnp.asarray(v) for k, v in batch.items()})
    train_step = build_train_step(mesh8)
    eval_step = build_eval_step(mesh8)

    sharded = shard_batch(mesh8, batch)
    before = float(eval_step(state, sharded)["loss"])
    for _ in range(5):
        state, metrics = train_step(state, sharded)
    after = float(eval_step(state, sharded)["loss"])
    assert np.isfinite(after)
    assert after < before  # overfits a single batch
    assert "learning_rate" in metrics and float(metrics["learning_rate"]) > 0


def test_word_boundary_path():
    config = tiny_landmark_config().override(**{"model.use_word_boundary": True})
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in word_batch(config).items()}
    assert "word_mask" in batch
    state = create_train_state(config, model, batch)
    metrics = state.apply_fn({"params": state.params}, **batch, det=True)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_video_model_smoke():
    config = lrw_video_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 64, "model.encoder.heads": 2,
        "model.labels": 7, "model.codec.audio_vocab_size": 13,
        "model.dtype": "float32", "data.batch_size": 2, "data.num_frames": 4,
        "data.crop_size": 32, "optim.total_steps": 10, "optim.warmup_steps": 1,
    })
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in word_batch(config).items()}
    state = create_train_state(config, model, batch)
    assert state.batch_stats  # conv frontend has BN stats
    step = build_train_step(donate=False)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # BN running stats updated
    leaf0 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    leaf1 = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_skip_nonfinite_guard():
    """apply_if_finite drops a poisoned update instead of corrupting params."""
    config = tiny_landmark_config().override(**{"optim.skip_nonfinite": True})
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in word_batch(config).items()}
    state = create_train_state(config, model, batch)
    step = build_train_step(donate=False)
    state1, m1 = step(state, batch)
    assert "learning_rate" in m1 and float(m1["learning_rate"]) > 0
    # poison the inputs -> nan loss; params must stay finite and unchanged
    bad = dict(batch, inputs=batch["inputs"].at[0, 0, 0].set(jnp.nan))
    state2, m2 = step(state1, bad)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_video_model_overfits():
    """The full video path (s2d stem + ResNet + transformer) must overfit a
    tiny batch to high accuracy — learning dynamics, not just finite loss."""
    config = lrw_video_config().override(**{
        "model.encoder.layers": 2, "model.encoder.dim": 64, "model.encoder.heads": 2,
        "model.encoder.droppath": 0.0, "model.encoder.msa_dropout": 0.0,
        "model.encoder.mlp_dropout": 0.0, "model.encoder.emb_dropout": 0.0,
        "model.labels": 5, "model.codec.audio_vocab_size": 7,
        "model.sync_lambda": 1.0, "model.use_word_boundary": False,
        "model.dtype": "float32", "data.batch_size": 4, "data.num_frames": 4,
        "data.crop_size": 16, "data.use_cutmix": False,
        "optim.lr": 2e-3, "optim.total_steps": 0, "optim.clip_norm": 1.0})
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in word_batch(config).items()}
    state = create_train_state(config, model, batch)
    step = build_train_step(donate=False)
    for i in range(60):
        state, m = step(state, batch)
    eval_m = state.apply_fn({"params": state.params,
                             "batch_stats": state.batch_stats}, **batch, det=True)
    assert float(eval_m["acc1"]) == 1.0, f"failed to overfit: {eval_m}"

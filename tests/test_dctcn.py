"""DC-TCN family: forward/mixup path, dataset augs, TCN modules."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.config import lrw_dctcn_config
from syncvsr_tpu.data.lrw import dctcn_mask_frames, dctcn_trim_frames
from syncvsr_tpu.engine import build_train_step, create_train_state
from syncvsr_tpu.models import build_model
from syncvsr_tpu.models.tcn import MultibranchTemporalConvNet, TemporalConvNet


def tiny_dctcn_config():
    return lrw_dctcn_config().override(**{
        "model.frontend.kind": "landmark", "model.frontend.input_features": 12,
        "model.encoder.dim": 16,
        "model.encoder.tcn_growth_rates": [12, 12], "model.encoder.tcn_blocks": [2, 2],
        "model.encoder.tcn_kernel_sizes": [3, 5], "model.encoder.tcn_dilations": [1, 2],
        "model.encoder.tcn_reduced_size": 16,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32", "data.batch_size": 4, "data.num_frames": 6,
        "optim.total_steps": 50, "optim.warmup_steps": 2,
    })


def _batch(config, b=4, t=6, seed=0):
    from syncvsr_tpu.data.synthetic import word_batch

    batch = word_batch(config, b, seed=seed)
    batch["attention_mask"] = np.ones((b, t), np.float32)
    return batch


def test_dctcn_forward_and_mixup_step():
    config = tiny_dctcn_config()
    model = build_model(config)
    batch = {k: jnp.asarray(v) for k, v in _batch(config).items()}
    state = create_train_state(config, model, batch)
    m = state.apply_fn({"params": state.params, "batch_stats": state.batch_stats},
                       **batch, det=True)
    np.testing.assert_allclose(
        float(m["loss"]),
        float(m["loss_word"]) + config.model.sync_lambda * float(m["loss_audio"]),
        rtol=1e-5)
    # mixup training step runs and is finite
    step = build_train_step(donate=False)
    state2, tm = step(state, batch)
    assert np.isfinite(float(tm["loss"]))


def test_dctcn_attention_mask_pooling():
    """Zeroing masked frames' features must not change the logits when the
    attention mask excludes them."""
    config = tiny_dctcn_config()
    model = build_model(config)
    b = _batch(config)
    b["attention_mask"][:, 4:] = 0.0
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    state = create_train_state(config, model, jb)
    m1 = state.apply_fn({"params": state.params, "batch_stats": state.batch_stats},
                        **jb, det=True)
    # attention mask fully on -> different pooled logits
    b2 = dict(b)
    b2["attention_mask"] = np.ones_like(b["attention_mask"])
    jb2 = {k: jnp.asarray(v) for k, v in b2.items()}
    m2 = state.apply_fn({"params": state.params, "batch_stats": state.batch_stats},
                        **jb2, det=True)
    assert float(m1["loss_word"]) != float(m2["loss_word"])


def test_dctcn_dataset_augs():
    rng = np.random.RandomState(0)
    t = 29
    sample = {
        "inputs": rng.randn(t, 8, 8, 1).astype(np.float32),
        "audio_tokens": rng.randint(0, 17, (t * 4 + 4, 2)).astype(np.int32),
        "labels": np.int32(3),
        "word_mask": np.zeros(t, np.float32),
    }
    sample["word_mask"][9:20] = 1.0
    dctcn_mask_frames(rng, sample, max_time_masks=5)
    dctcn_trim_frames(rng, sample)
    assert sample["inputs"].shape == (t, 8, 8, 1)
    assert "attention_mask" in sample and sample["attention_mask"].shape == (t,)
    # word stays fully inside the attended window
    assert sample["word_mask"].sum() == 11
    assert (sample["attention_mask"] >= sample["word_mask"]).all()


def test_tcn_modules_shapes():
    x = jnp.zeros((2, 10, 24))
    for net in (TemporalConvNet(channels=(24, 36), kernel=3),
                MultibranchTemporalConvNet(channels=(24, 36), kernel_sizes=(3, 5)),
                TemporalConvNet(channels=(24,), dwpw=True)):
        v = net.init(jax.random.PRNGKey(0), x, False)
        y = net.apply(v, x, False)
        assert y.shape[:2] == (2, 10)


def test_tcn_and_mstcn_encoder_kinds_train():
    """encoder.kind = "tcn" / "mstcn" build the Lipreading wrapper's other
    TCN back ends (reference tcn/model.py tcn_options) end-to-end."""
    for kind in ("tcn", "mstcn"):
        config = tiny_dctcn_config().override(**{
            "model.encoder.kind": kind,
            "model.encoder.tcn_channels": [24, 24],
            "model.encoder.tcn_kernel": 3,
            "model.encoder.tcn_kernel_sizes": [3, 5],
        })
        model = build_model(config)
        batch = {k: jnp.asarray(v) for k, v in _batch(config).items()}
        state = create_train_state(config, model, batch)
        step = build_train_step(mesh=None)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"])), kind
        assert "encoder" in state.params, kind
        # multibranch has per-branch parameter trees
        if kind == "mstcn":
            assert any("branch" in k for k in state.params["encoder"]["block_0"])

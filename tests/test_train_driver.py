"""Train driver end-to-end on synthetic data + checkpoint save/resume +
landmark transform recipes."""

import os

import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.config import lrw_landmark_config
from syncvsr_tpu.data.landmark_transforms import create_transform
from syncvsr_tpu.train import load_config, train
from syncvsr_tpu.utils import checkpoint as ckpt


def driver_config(tmp_path, **extra):
    o = {
        "model.encoder.layers": 2, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.frontend.input_features": 12,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32",
        "data.dataset": "synthetic", "data.batch_size": 8, "data.num_frames": 6,
        "optim.total_steps": 0, "optim.lr": 1e-3,
        "train.epochs": 1, "train.log_every": 4, "train.eval_every": 8,
        "train.ckpt_every": 8, "train.ckpt_dir": str(tmp_path / "ckpt"),
    }
    o.update(extra)
    return lrw_landmark_config().override(**o)


def test_train_driver_end_to_end(tmp_path, mesh8):
    config = driver_config(tmp_path)
    final = train(config)
    assert "val/loss" in final and np.isfinite(final["val/loss"])
    # checkpoints + metrics written
    assert ckpt.latest_checkpoint(str(tmp_path / "ckpt")) is not None
    assert os.path.exists(tmp_path / "ckpt" / "metrics.jsonl")
    assert os.path.exists(tmp_path / "ckpt" / "best.msgpack")


def test_resume(tmp_path, mesh8):
    config = driver_config(tmp_path)
    train(config)
    path = ckpt.latest_checkpoint(str(tmp_path / "ckpt"))
    step0 = int(path.split("step_")[1].split(".")[0])

    config2 = driver_config(tmp_path, **{"train.resume": "auto"})
    train(config2)
    path2 = ckpt.latest_checkpoint(str(tmp_path / "ckpt"))
    step1 = int(path2.split("step_")[1].split(".")[0])
    assert step1 > step0  # continued from the restored step


def test_partial_load_and_rename():
    params = {"a": {"kernel": np.zeros((2, 2))}, "b": {"bias": np.zeros(3)}}
    pre = {"a_old": {"kernel": np.ones((2, 2))},
           "b": {"bias": np.ones(3)},
           "c": {"x": np.ones(1)}}
    merged, n = ckpt.partial_load(params, pre, rename={"a_old": "a"}, verbose=False)
    assert n == 2
    np.testing.assert_allclose(merged["a"]["kernel"], 1.0)
    np.testing.assert_allclose(merged["b"]["bias"], 1.0)


def test_load_config_cli():
    c = load_config(["preset=lrw_video", "optim.lr=0.5", "model.labels=7"])
    assert c.name == "lrw_video" and c.optim.lr == 0.5 and c.model.labels == 7


def test_landmark_transform_recipes():
    rng = np.random.RandomState(0)
    x = rng.randn(35, 478, 3).astype(np.float32)
    x[3, 5] = np.nan
    valid = create_transform(train=False, max_length=29,
                             rng=np.random.RandomState(0))(x)
    assert valid.shape == (29, 478, 3)
    for seed in range(3):
        out = create_transform(train=True, max_length=29,
                               rng=np.random.RandomState(seed))(x)
        assert out.shape == (29, 478, 3)
        # pad sentinel or finite or nan — no infs
        assert not np.isinf(out).any()
    short = rng.randn(10, 478, 3).astype(np.float32)
    padded = create_transform(train=False, max_length=29,
                              rng=np.random.RandomState(0))(short)
    assert padded.shape == (29, 478, 3)
    assert (padded[10:] == -100.0).all()


def test_grad_accum_equivalence(mesh8):
    """optim.accum_steps=2 over two half batches == one full-batch step
    (MultiSteps averages micro-grads; every loss is a mean)."""
    import jax

    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.parallel import shard_batch

    base = {
        "model.encoder.layers": 2, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.frontend.input_features": 12,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32",
        "model.encoder.emb_dropout": 0.0, "model.encoder.msa_dropout": 0.0,
        "model.encoder.mlp_dropout": 0.0, "model.encoder.droppath": 0.0,
        "data.use_cutmix": False, "data.batch_size": 16,
        "optim.total_steps": 100, "optim.warmup_steps": 1,
    }
    from syncvsr_tpu.config import lrw_landmark_config

    cfg1 = lrw_landmark_config().override(**base)
    cfg2 = lrw_landmark_config().override(**dict(base, **{"optim.accum_steps": 2}))

    full = word_batch(cfg1, 16, seed=0)
    halves = [{k: v[:8] for k, v in full.items()},
              {k: v[8:] for k, v in full.items()}]

    model1 = build_model(cfg1)
    s1 = create_train_state(cfg1, model1, {k: jnp.asarray(v) for k, v in full.items()})
    step1 = build_train_step(mesh8, donate=False)
    s1, m1 = step1(s1, shard_batch(mesh8, full))

    model2 = build_model(cfg2)
    s2 = create_train_state(cfg2, model2, {k: jnp.asarray(v)[:8] for k, v in full.items()})
    step2 = build_train_step(mesh8, donate=False)
    for h in halves:
        s2, m2 = step2(s2, shard_batch(mesh8, h))

    # one optimizer application happened in both runs
    p1 = jax.device_get(s1.params)
    p2 = jax.device_get(s2.params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_train_driver_lrw_video_data(tmp_path, mesh8):
    """Full data path: LRW pkl tree -> factory loaders -> train driver."""
    import cv2
    import torch

    root = tmp_path / "LRW"
    rng = np.random.RandomState(0)
    rows = []
    for word in ["ABOUT", "WORLD"]:
        for split in ("train", "val"):
            d = root / word / split
            d.mkdir(parents=True)
            for i in range(8):
                jpgs = []
                for _ in range(29):
                    ok, buf = cv2.imencode(
                        ".jpg", rng.randint(0, 256, (24, 28), np.uint8))
                    jpgs.append(buf.tobytes())
                torch.save({"video": jpgs,
                            "vq_tokens": torch.tensor(
                                rng.randint(0, 13, (1, 120, 2)))},
                           d / f"{word}_{i:05d}.pkl")
                rows.append((f"{split}/{word}_{i:05d}", 11))
    import pandas as pd

    pd.DataFrame(rows, columns=["id", "length"]).to_csv(
        root / "durations.csv", index=False)

    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.train import train

    config = lrw_video_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.labels": 2,
        "model.codec.audio_vocab_size": 13, "model.dtype": "float32",
        "model.use_word_boundary": True,
        "data.dataset": "lrw", "data.root": str(root), "data.batch_size": 8,
        "data.eval_batch_size": 8, "data.crop_size": 16,
        "optim.total_steps": 0, "train.epochs": 1, "train.log_every": 1,
        "train.eval_every": 2, "train.ckpt_every": 2,
        "train.ckpt_dir": str(tmp_path / "ckpt")})
    final = train(config)
    assert np.isfinite(final["val/loss"])
    assert "val/acc1" in final


def test_train_driver_lrw1000_wav2vec2(tmp_path, mesh8):
    """LRW-1000 recipe through the real data path: variable-length clips
    padded to 40 frames, wav2vec2 codec (alignment 2), no word boundary
    (reference data.py:64-66, e2e_asr_transformer.py:145-147)."""
    import cv2
    import torch

    root = tmp_path / "LRW1000"
    rng = np.random.RandomState(1)
    for word in ["W0", "W1", "W2"]:
        for split in ("train", "val"):
            d = root / word / split
            d.mkdir(parents=True)
            for i in range(4):
                t = int(rng.randint(20, 41))  # variable clip lengths
                jpgs = [cv2.imencode(
                    ".jpg", rng.randint(0, 256, (24, 28), np.uint8))[1].tobytes()
                    for _ in range(t)]
                torch.save({"video": jpgs,
                            "wav2vec2_tokens": torch.tensor(
                                rng.randint(0, 19, (1, t * 2 + 2, 2)))},
                           d / f"{word}_{i:05d}.pkl")

    from syncvsr_tpu.config import lrw1000_config
    from syncvsr_tpu.train import train

    config = lrw1000_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.labels": 3,
        "model.codec.audio_vocab_size": 19, "model.dtype": "float32",
        "data.root": str(root), "data.batch_size": 8,
        "data.eval_batch_size": 8, "data.crop_size": 16,
        "optim.total_steps": 0, "train.epochs": 1, "train.log_every": 1,
        "train.eval_every": 2, "train.ckpt_every": 2,
        "train.ckpt_dir": str(tmp_path / "ckpt")})
    assert config.model.codec.audio_alignment == 2
    assert not config.model.use_word_boundary
    final = train(config)
    assert np.isfinite(final["val/loss"])

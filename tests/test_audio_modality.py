"""Audio-modality data path: waveform loading, AddNoise/AudioTransform, and
end-to-end lrs3_audio training through the real factory (reference
av_dataset.py:112-120 loads the waveform; transforms.py:112-135 applies
AddNoise + layer norm; data_module.py:79-99 selects modality per config)."""

import numpy as np
import pytest

from tests.conftest import make_lrw_tree  # noqa: F401  (fixture import side)


def _make_audio_lrs_tree(tmp_path, lengths, seed=3,
                         splits=("train", "val")):
    import cv2
    import torch

    rng = np.random.RandomState(seed)
    words = ["HELLO", "WORLD", "QUICK", "BROWN", "FOX"]
    for split in splits:
        d = tmp_path / "data" / "LRS3" / split / "spk0"
        d.mkdir(parents=True)
        for i, t in enumerate(lengths):
            frames = []
            for _ in range(t):
                ok, buf = cv2.imencode(
                    ".jpg", rng.randint(0, 256, (12, 12), np.uint8))
                frames.append(buf.tobytes())
            wav = (np.sin(np.linspace(0, 80 * np.pi, t * 640))
                   * 12000).astype(np.int16)
            torch.save({"video": frames, "audio": wav,
                        "text": str(rng.choice(words)),
                        "vq_tokens": torch.tensor(
                            rng.randint(0, 11, (1, t * 4 + 4, 2)))},
                       d / f"clip{i:02d}.pkl")
    return str(tmp_path / "data")


def _audio_config(root, **extra):
    from syncvsr_tpu.config import lrs3_audio_config

    o = {
        "model.encoder.layers": 1, "model.encoder.dim": 16,
        "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
        "model.decoder.layers": 1, "model.decoder.dim": 16,
        "model.decoder.heads": 2, "model.decoder.hidden": 32,
        "model.labels": 5049, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32", "model.frontend.resnet_width": 8,
        "data.dataset": "lrs3", "data.root": root,
        "data.batch_size": 8, "data.eval_batch_size": 8,
        "data.length_buckets": [16, 32],
    }
    o.update(extra)
    return lrs3_audio_config().override(**o)


def test_audio_transform_pipeline():
    from syncvsr_tpu.data.audio import AudioTransform

    rng = np.random.RandomState(0)
    wav = rng.randn(6400).astype(np.float32)
    noise = rng.randn(120_000).astype(np.float32)

    clean = AudioTransform(train=False)(wav)
    # layer norm: zero mean, unit variance
    assert abs(clean.mean()) < 1e-5 and abs(clean.var() - 1.0) < 1e-4

    noisy = AudioTransform(train=True, noise=noise)(wav)
    assert noisy.shape == clean.shape
    # eval at clean target == no noise; at 0 dB the waveform changes
    at_clean = AudioTransform(train=False, noise=noise,
                              snr_target=999999.0)(wav)
    np.testing.assert_allclose(at_clean, clean, atol=1e-6)
    at_0db = AudioTransform(train=False, noise=noise, snr_target=0.0)(wav)
    assert np.abs(at_0db - clean).max() > 0.1


def test_lrs_dataset_audio_modality(tmp_path):
    from syncvsr_tpu.data.lrs import LRSDataset, glob_lrs_files
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [10, 14])
    files = glob_lrs_files(root, "LRS3", "train")
    ds = LRSDataset(files, TextTransform(), modality="audio")
    s = ds[0]
    assert s["videos"].ndim == 1  # waveform
    assert s["videos"].dtype == np.float32
    assert int(s["lengths"]) == s["videos"].shape[0] == 10 * 640
    assert s["audio_tokens"].shape == (10 * 4, 2)


def test_lrs3_audio_driver_end_to_end(tmp_path, mesh8):
    """lrs3_audio trains from a pkl tree with bundled waveforms through the
    real factory; AddNoise is observably active when noise_path is set."""
    from syncvsr_tpu.data.factory import build_loaders
    from syncvsr_tpu.train import train

    lengths = [np.random.RandomState(1).randint(10, 16) for _ in range(12)]
    root = _make_audio_lrs_tree(tmp_path, lengths)
    np.save(tmp_path / "data" / "babble.npy",
            np.random.RandomState(9).randn(200_000).astype(np.float32))

    # noise changes the train batches (same schedule, same clips)
    cfg_clean = _audio_config(root)
    cfg_noisy = _audio_config(root, **{"data.noise_path": "babble.npy"})
    b_clean = next(iter(build_loaders(cfg_clean)[0]))
    b_noisy = next(iter(build_loaders(cfg_noisy)[0]))
    assert b_clean["videos"].shape == b_noisy["videos"].shape
    assert np.abs(b_clean["videos"] - b_noisy["videos"]).max() > 1e-3

    cfg = _audio_config(root, **{
        "data.noise_path": "babble.npy",
        "optim.total_steps": 0, "train.epochs": 1, "train.log_every": 1,
        "train.eval_every": 100, "train.ckpt_every": 100,
        "train.ckpt_dir": str(tmp_path / "ckpt")})
    final = train(cfg)
    assert np.isfinite(final["val/loss"])

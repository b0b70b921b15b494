"""Offline audio tokenizer: wav2vec2 (tiny HF model) and fairseq-free
vq-wav2vec round trips, ending in a word-model train step through the real
factory path (VERDICT r1 item 3 done-criterion)."""

import argparse

import numpy as np
import pytest
import torch

from syncvsr_tpu.tools.tokenize_audio import (
    SAMPLE_RATE,
    VQWav2Vec,
    build_quantizer,
    to_waveform,
    tokenize_tree,
    tokenize_waveform,
)
from tests.conftest import make_lrw_tree


@pytest.fixture(scope="module")
def tiny_wav2vec2_dir(tmp_path_factory):
    from transformers import Wav2Vec2Config, Wav2Vec2ForPreTraining

    cfg = Wav2Vec2Config(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 8),
        conv_stride=(80, 4),  # hop 320 -> 50 Hz -> alignment 2 at 25 fps
        num_codevector_groups=2, num_codevectors_per_group=7,
        codevector_dim=8, proj_codevector_dim=8,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2)
    model = Wav2Vec2ForPreTraining(cfg)
    d = tmp_path_factory.mktemp("w2v2")
    model.save_pretrained(d)
    return str(d)


def test_wav2vec2_tokens_shape_and_range(tiny_wav2vec2_dir):
    quantize = build_quantizer("wav2vec2", tiny_wav2vec2_dir)
    wav = np.random.RandomState(0).randn(SAMPLE_RATE).astype(np.float32)
    tokens = tokenize_waveform(quantize, wav, num_frames=25, alignment=2)
    assert tokens.shape == (50, 2)
    assert tokens.dtype == np.int32
    valid = tokens[tokens >= 0]
    assert valid.size and (valid < 7).all()  # per-group indices, no G*V offset
    # deterministic
    tokens2 = tokenize_waveform(quantize, wav, num_frames=25, alignment=2)
    np.testing.assert_array_equal(tokens, tokens2)


def _fake_vq_checkpoint(path, dim=4, n_vars=5, groups=2):
    layers = [(dim, 10, 5), (dim, 8, 4), (dim, 4, 2), (dim, 4, 2), (dim, 4, 2)]
    rng = np.random.RandomState(0)
    sd = {}
    in_d = 1
    for i, (d, k, s) in enumerate(layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = torch.tensor(
            rng.randn(d, in_d, k), dtype=torch.float32) * 0.3
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = torch.ones(d)
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = torch.zeros(d)
        in_d = d
    sd["vector_quantizer.projection.0.weight"] = torch.tensor(
        rng.randn(dim, dim // groups, 1), dtype=torch.float32)
    sd["vector_quantizer.projection.1.weight"] = torch.ones(dim)
    sd["vector_quantizer.projection.1.bias"] = torch.zeros(dim)
    sd["vector_quantizer.embedding"] = torch.tensor(
        rng.randn(n_vars, groups, dim // groups), dtype=torch.float32)
    args = argparse.Namespace(
        conv_feature_layers=str(layers), activation="relu",
        log_compression=True, skip_connections_feat=True, residual_scale=0.5,
        non_affine_group_norm=False, vq_vars=n_vars, vq_groups=groups,
        vq_dim=dim)
    torch.save({"args": args, "model": sd}, path)


def test_vq_wav2vec_fairseq_free(tmp_path):
    ckpt = tmp_path / "vq.pt"
    _fake_vq_checkpoint(ckpt)
    model = VQWav2Vec(str(ckpt))
    assert np.prod(model.conv_strides) == 160  # 100 Hz -> alignment 4
    wav = torch.tensor(np.random.RandomState(1).randn(2, SAMPLE_RATE),
                       dtype=torch.float32)
    feats = model.feature_extractor(wav)
    assert feats.shape[1] == 4
    idx = model.forward_idx(feats)
    assert idx.shape[0] == 2 and idx.shape[2] == 2
    assert int(idx.min()) >= 0 and int(idx.max()) < 5
    # argmin matches a brute-force distance check on one frame
    ze = model.projection(feats)
    b, t = 0, 3
    z = ze[b, :, t].view(2, -1)
    for g in range(2):
        dists = ((model.embedding[:, g] - z[g]) ** 2).sum(-1)
        assert int(dists.argmin()) == int(idx[b, t, g])


def test_tokenize_tree_roundtrip_train(tmp_path, tiny_wav2vec2_dir, mesh8):
    """pkl tree with raw audio -> tokenize_tree -> audio_root loaders ->
    one real train epoch."""
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.train import train

    root = make_lrw_tree(tmp_path / "LRW", n=4, with_audio=True,
                         with_tokens=False)
    dst = tmp_path / "tokens"
    written = tokenize_tree(str(root), str(dst), "wav2vec2",
                            tiny_wav2vec2_dir)
    assert len(written) == 2 * 2 * 4  # words x splits x n
    sample = torch.load(written[0], weights_only=False)
    assert sample["wav2vec2_tokens"].shape == (29 * 2, 2)
    # resumable: second run writes nothing
    assert tokenize_tree(str(root), str(dst), "wav2vec2",
                         tiny_wav2vec2_dir) == []

    config = lrw_video_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.labels": 2,
        "model.codec.name": "wav2vec2", "model.codec.audio_alignment": 2,
        "model.codec.vq_groups": 2, "model.codec.audio_vocab_size": 7,
        "model.dtype": "float32", "model.use_word_boundary": True,
        "data.dataset": "lrw", "data.root": str(root),
        "data.audio_root": str(dst), "data.batch_size": 8,
        "data.eval_batch_size": 8, "data.crop_size": 16,
        "optim.total_steps": 0, "train.epochs": 1, "train.log_every": 1,
        "train.eval_every": 1, "train.ckpt_every": 100,
        "train.ckpt_dir": str(tmp_path / "ckpt")})
    final = train(config)
    assert np.isfinite(final["val/loss"])


def test_to_waveform_variants():
    w = to_waveform(np.array([16384, -16384], np.int16))
    np.testing.assert_allclose(w, [0.5, -0.5])
    w2 = to_waveform({"array": np.zeros(4, np.float32),
                      "sample_rate": 16000})
    assert w2.dtype == np.float32 and w2.shape == (4,)
    with pytest.raises(ValueError):
        to_waveform({"array": np.zeros(4), "sample_rate": 8000})


def test_to_waveform_stereo_int16_scaling():
    """int16 scaling must happen before the stereo downmix (the mean()
    promotes to float64 and would skip the 1/32768 normalization)."""
    from syncvsr_tpu.tools.tokenize_audio import to_waveform

    mono = (np.sin(np.linspace(0, 100, 1600)) * 20000).astype(np.int16)
    stereo = np.stack([mono, mono])           # [2, S]
    out_m = to_waveform(mono)
    out_s = to_waveform(stereo)
    np.testing.assert_allclose(out_s, out_m, atol=1e-6)
    assert np.abs(out_s).max() <= 1.0
    # [S, 2] orientation too
    np.testing.assert_allclose(to_waveform(stereo.T), out_m, atol=1e-6)

"""In-step vq-wav2vec tokenizer oracle: the JAX inference path
(ops/codec.py) must emit exactly the tokens of the torch reimplementation
(tools/tokenize_audio.VQWav2Vec — itself the reference's
wav2vec.feature_extractor + vector_quantizer.forward_idx math,
e2e_asr_transformer.py:167-174), from one synthetic fairseq checkpoint."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

DIM, GROUPS, VARS, VQ_DIM = 8, 2, 5, 8
CONV_SPEC = "[(8, 10, 5), (8, 8, 4), (8, 4, 2), (8, 4, 2), (8, 4, 2)," \
            " (8, 1, 1), (8, 1, 1), (8, 1, 1)]"


def _synthetic_fairseq_ckpt(rng, path):
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.4)
    sd = {}
    in_d = 1
    import ast

    for i, (dim, k, _) in enumerate(ast.literal_eval(CONV_SPEC)):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = t(dim, in_d, k)
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = t(dim)
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = t(dim)
        in_d = dim
    sd["vector_quantizer.projection.0.weight"] = t(DIM, DIM // GROUPS, 1)
    sd["vector_quantizer.projection.1.weight"] = t(DIM)
    sd["vector_quantizer.projection.1.bias"] = t(DIM)
    # well-separated codebook: argmin must not flip on f32 rounding between
    # the torch explicit-distance and the JAX dot-product formulations
    emb = rng.randn(VARS, GROUPS, VQ_DIM // GROUPS).astype(np.float32) * 3.0
    sd["vector_quantizer.embedding"] = torch.tensor(emb)
    args = argparse.Namespace(
        conv_feature_layers=CONV_SPEC, activation="relu",
        log_compression=True, skip_connections_feat=False,
        residual_scale=0.5, non_affine_group_norm=False,
        vq_groups=GROUPS, vq_vars=VARS, vq_dim=VQ_DIM)
    torch.save({"args": args, "model": sd}, path)
    return sd


def test_vq_tokens_match_torch_oracle(tmp_path):
    from syncvsr_tpu.ops.codec import load_vq_codec, vq_tokens
    from syncvsr_tpu.tools.tokenize_audio import VQWav2Vec, quantize_vq

    rng = np.random.RandomState(0)
    path = str(tmp_path / "vq.pt")
    _synthetic_fairseq_ckpt(rng, path)

    wav = (rng.randn(3, 16_000).astype(np.float32) * 0.1)
    ref = quantize_vq(VQWav2Vec(path), wav)              # [B, T', G] torch

    params, geom = load_vq_codec(path)
    got = np.asarray(vq_tokens(params, jnp.asarray(wav),
                               strides=geom["strides"]))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert (got == ref).mean() > 0.999, \
        f"token mismatch rate {(got != ref).mean():.4f}"
    np.testing.assert_array_equal(got, ref)


def test_instep_tokenizer_batch_hook(tmp_path):
    """The batch hook emits sync-loss-contract tokens: [B, T*alignment, G],
    -1 past each sample's frame length, raw audio dropped."""
    from syncvsr_tpu.ops.codec import load_vq_codec, make_instep_tokenizer

    rng = np.random.RandomState(1)
    path = str(tmp_path / "vq.pt")
    _synthetic_fairseq_ckpt(rng, path)
    params, geom = load_vq_codec(path)

    b, t_frames = 2, 6
    batch = {
        "videos": jnp.zeros((b, t_frames, 8, 8, 1), jnp.float32),
        "lengths": jnp.asarray([6, 3]),
        "labels": jnp.zeros((b, 4), jnp.int32),
        "audio": jnp.asarray(rng.randn(b, t_frames * 640).astype(np.float32)),
    }
    tokenize = make_instep_tokenizer(params, alignment=4,
                                     strides=geom["strides"])
    out = tokenize(batch)
    assert "audio" not in out
    toks = np.asarray(out["audio_tokens"])
    assert toks.shape == (b, t_frames * 4, GROUPS)
    assert (toks[0] >= 0).all()                      # full-length sample
    assert (toks[1, : 3 * 4] >= 0).all()             # real frames tokenized
    assert (toks[1, 3 * 4:] == -1).all()             # padding masked

    # jit-compatible (runs inside the train step)
    import jax

    out2 = jax.jit(tokenize)(batch)
    np.testing.assert_array_equal(np.asarray(out2["audio_tokens"]), toks)


def test_instep_end_to_end_loader_and_train_step(tmp_path):
    """Full in-step path: pkl tree with raw audio -> loader emits windowed
    waveforms alongside videos -> the composed aug+tokenize hook quantizes
    on-device inside the compiled train step -> finite loss. The hook's
    tokens equal the torch quantizer on the same bucket-padded batch
    (reference semantics: the quantizer sees padded batches,
    e2e_asr_transformer.py:195)."""
    import cv2

    import jax

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.factory import build_loaders
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.codec import load_vq_codec, make_instep_tokenizer
    from syncvsr_tpu.ops.image import build_sentence_aug
    from syncvsr_tpu.tools.tokenize_audio import VQWav2Vec, quantize_vq

    rng = np.random.RandomState(4)
    d = tmp_path / "data" / "LRS3" / "train" / "spk0"
    d.mkdir(parents=True)
    for i, t in enumerate([10, 13, 16, 12, 16, 11, 14, 16]):
        frames = []
        for _ in range(t):
            ok, buf = cv2.imencode(
                ".jpg", rng.randint(0, 256, (16, 16), np.uint8))
            frames.append(buf.tobytes())
        torch.save({"video": frames, "text": "HELLO WORLD",
                    "audio": torch.tensor(
                        rng.randn(t * 640).astype(np.float32) * 0.1)},
                   d / f"clip{i:02d}.pkl")

    ckpt_path = str(tmp_path / "vq.pt")
    _synthetic_fairseq_ckpt(rng, ckpt_path)

    cfg = lrs3_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 16,
        "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
        "model.decoder.layers": 1, "model.decoder.dim": 16,
        "model.decoder.heads": 2, "model.decoder.hidden": 32,
        "model.labels": 5049, "model.codec.audio_vocab_size": VARS,
        "model.codec.in_step": True, f'model.codec.ckpt': ckpt_path,
        "model.dtype": "float32",
        "model.frontend.stem_channels": 8, "model.frontend.resnet_width": 8,
        "model.frontend.out_dim": 16,
        "data.dataset": "lrs3", "data.root": str(tmp_path / "data"),
        "data.crop_size": 16, "data.batch_size": 4,
        "data.length_buckets": [16],
        "optim.total_steps": 100, "optim.warmup_steps": 2})

    train_loader, _ = build_loaders(cfg)
    batch = next(iter(train_loader))
    assert "audio" in batch and batch["audio"].ndim == 2

    params, geom = load_vq_codec(ckpt_path)
    tokenize = make_instep_tokenizer(
        params, alignment=cfg.model.codec.audio_alignment,
        strides=geom["strides"])

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    toks = np.asarray(tokenize(jb)["audio_tokens"])
    # torch oracle on the same padded rows (0.5 s pad + truncate, as the hook)
    oracle = VQWav2Vec(ckpt_path)
    wav = np.concatenate([np.asarray(batch["audio"]),
                          np.zeros((batch["audio"].shape[0], 8000),
                                   np.float32)], axis=1)
    want = quantize_vq(oracle, wav)[:, : toks.shape[1]]
    valid = toks >= 0  # hook masks past-length frames; oracle doesn't
    np.testing.assert_array_equal(toks[valid], want[valid])

    # composed hook inside the real compiled train step
    model = build_model(cfg)
    init = dict(jb)
    init.pop("audio")
    state = create_train_state(cfg, model, init)
    aug = build_sentence_aug(cfg.data)
    step = build_train_step(mesh=None, donate=False,
                            aug_fn=lambda r, b: aug(r, tokenize(b)))
    state, metrics = step(state, jb)
    assert np.isfinite(float(metrics["loss"]))

"""Exact eval metrics: no dropped tail clips, no double-counted padded rows.

The reference scores every sample exactly once (trainer.test,
LRW/video/src/inference.py:42-44; per-utterance WER accumulation,
LRS/video/lightning.py:114-129). These tests pin the rebuild's equivalents:
word accuracy and sentence WER must be invariant to eval_batch_size, and the
hypothesis dump must hold exactly one record per utterance.
"""

import json
import sys

import numpy as np
import pytest

from tests.conftest import make_lrw_tree


def test_average_meter_weighted():
    from syncvsr_tpu.utils.metrics import AverageMeter

    m = AverageMeter()
    m.update({"acc": 0.5}, weight=4)   # 2 correct of 4
    m.update({"acc": 1.0}, weight=2)   # 2 correct of 2
    assert m.summary()["acc"] == pytest.approx(4 / 6)
    # default weight keeps the old behavior
    m.update({"acc": 0.0})
    m.update({"acc": 1.0})
    assert m.summary()["acc"] == pytest.approx(0.5)


class _Toy:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32)}


def test_loader_pad_last_emits_sample_weight():
    from syncvsr_tpu.data.loader import DataLoader

    dl = DataLoader(_Toy(10), 4, shuffle=False, drop_last=False, pad_last=True,
                    process_index=0, process_count=1)
    batches = list(dl)
    assert len(batches) == 3
    for b in batches[:-1]:
        np.testing.assert_array_equal(b["sample_weight"], np.ones(4))
    tail = batches[-1]
    assert tail["x"].shape[0] == 4  # static shape kept
    np.testing.assert_array_equal(tail["sample_weight"], [1, 1, 0, 0])
    # padding repeats the last real sample
    np.testing.assert_array_equal(tail["x"][2], tail["x"][1])
    # every sample appears exactly once among weight-1 rows
    seen = sorted(int(b["x"][i, 0]) for b in batches
                  for i in range(4) if b["sample_weight"][i] > 0)
    assert seen == list(range(10))


def test_bucket_batcher_flush_sample_weight():
    from syncvsr_tpu.data.lrs import BucketBatcher

    def sample(t):
        return {"videos": np.zeros((t, 4, 4, 1), np.uint8),
                "labels": np.array([3, 4], np.int32),
                "audio_tokens": np.zeros((t * 4, 2), np.int32),
                "lengths": np.int32(t)}

    batcher = BucketBatcher(buckets=(16,), batch_size=4, max_label_len=8)
    for t in (10, 12, 9):
        assert batcher.add(sample(t)) is None
    out = batcher.flush()
    assert len(out) == 1
    np.testing.assert_array_equal(out[0]["sample_weight"], [1, 1, 1, 0])
    # full batches carry all-ones
    batcher2 = BucketBatcher(buckets=(16,), batch_size=2, max_label_len=8)
    b = None
    for t in (10, 12):
        b = batcher2.add(sample(t)) or b
    np.testing.assert_array_equal(b["sample_weight"], [1, 1])


def test_word_model_weighted_metrics_match_unpadded(mesh8):
    """Eval metrics on a repeat-padded batch with sample_weight equal the
    metrics on the raw unpadded batch."""
    import jax.numpy as jnp

    from syncvsr_tpu.config import lrw_landmark_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model

    config = lrw_landmark_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 16,
        "model.encoder.heads": 2, "model.frontend.input_features": 8,
        "model.labels": 9, "model.codec.audio_vocab_size": 7,
        "model.dtype": "float32", "data.batch_size": 6, "data.num_frames": 4})
    model = build_model(config)
    raw = word_batch(config, 6, seed=3)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in raw.items()})

    def run(batch):
        return {k: float(v) for k, v in model.apply(
            {"params": state.params}, det=True,
            **{k: jnp.asarray(v) for k, v in batch.items()}).items()}

    base = run({k: v[:4] for k, v in raw.items()})
    padded = {k: np.concatenate([v[:4], v[3:4], v[3:4]]) for k, v in raw.items()}
    padded["sample_weight"] = np.array([1, 1, 1, 1, 0, 0], np.float32)
    weighted = run(padded)
    for k in ("loss", "loss_word", "loss_audio", "acc1", "acc5"):
        assert weighted[k] == pytest.approx(base[k], rel=1e-5), k


def test_sentence_model_weighted_metrics_match_unpadded():
    import jax.numpy as jnp

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model

    config = lrs3_config().override(**{
        "model.frontend.kind": "landmark", "model.frontend.input_features": 8,
        "model.encoder.layers": 1, "model.encoder.dim": 16,
        "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
        "model.decoder.layers": 1, "model.decoder.dim": 16,
        "model.decoder.heads": 2, "model.decoder.hidden": 32,
        "model.labels": 13, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32", "data.batch_size": 4})
    model = build_model(config)
    raw = sentence_batch(config, 4, num_frames=8, seed=5)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in raw.items()})
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def run(batch):
        return {k: float(v) for k, v in model.apply(
            variables, det=True,
            **{k: jnp.asarray(v) for k, v in batch.items()}).items()}

    base = run({k: v[:3] for k, v in raw.items()})
    padded = {k: np.concatenate([v[:3], v[2:3]]) for k, v in raw.items()}
    padded["sample_weight"] = np.array([1, 1, 1, 0], np.float32)
    weighted = run(padded)
    for k in ("loss", "loss_ctc", "loss_att", "loss_audio", "decoder_acc"):
        assert weighted[k] == pytest.approx(base[k], rel=1e-5), k


def _run_main(monkeypatch, capsys, args):
    from syncvsr_tpu import evaluate

    monkeypatch.setattr(sys, "argv", ["evaluate"] + args)
    evaluate.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_word_eval_invariant_to_batch_size(monkeypatch, capsys, tmp_path, mesh8):
    """10 test clips, eval_batch_size 8 (tail of 2) vs 16 (6 pads) —
    identical accuracy (batch sizes divisible by the 8-device mesh)."""
    root = make_lrw_tree(tmp_path / "LRW", splits=("train", "val", "test"), n=5)
    monkeypatch.chdir(tmp_path)

    def run(bs):
        return _run_main(monkeypatch, capsys, [
            "preset=lrw_video", "model.encoder.layers=1",
            "model.encoder.dim=32", "model.encoder.heads=2", "model.labels=2",
            "model.codec.audio_vocab_size=13", 'model.dtype="float32"',
            "model.use_word_boundary=true",
            "model.frontend.stem_channels=8", "model.frontend.resnet_width=8",
            "model.frontend.out_dim=16",
            'data.dataset="lrw"', f'data.root="{root}"',
            "data.crop_size=16", f"data.eval_batch_size={bs}"])

    r8 = run(8)
    r16 = run(16)
    for k in ("test/acc1", "test/acc5", "test/loss"):
        assert r8[k] == pytest.approx(r16[k], rel=1e-5), k


@pytest.fixture()
def lrs_test_root(tmp_path):
    import cv2
    import torch

    rng = np.random.RandomState(7)
    d = tmp_path / "data" / "LRS3" / "test" / "spk0"
    d.mkdir(parents=True)
    texts = ["HELLO WORLD", "THE QUICK BROWN FOX JUMPS", "A DAY",
             "OVER THE LAZY DOG", "NICE"]
    for i, (t, text) in enumerate(zip((12, 30, 8, 20, 5), texts)):
        frames = []
        for _ in range(t):
            ok, buf = cv2.imencode(
                ".jpg", rng.randint(0, 256, (16, 16), np.uint8))
            frames.append(buf.tobytes())
        torch.save({"video": frames, "text": text,
                    "vq_tokens": torch.tensor(
                        rng.randint(0, 320, (1, t * 4 + 4, 2)))},
                   d / f"clip{i}.pkl")
    return str(tmp_path / "data")


def test_sentence_wer_invariant_to_batch_size(monkeypatch, capsys, tmp_path,
                                              lrs_test_root):
    """5 utterances across two buckets; WER and the hypothesis count must not
    depend on eval_batch_size (repeat-padded rows skipped)."""
    monkeypatch.chdir(tmp_path)

    def run(bs):
        res = _run_main(monkeypatch, capsys, [
            "preset=lrs3", "model.encoder.layers=1", "model.encoder.dim=16",
            "model.encoder.heads=2", "model.encoder.conv_kernel=7",
            "model.decoder.layers=1", "model.decoder.dim=16",
            "model.decoder.heads=2", "model.decoder.hidden=32",
            "model.labels=13", "model.codec.audio_vocab_size=11",
            'model.dtype="float32"',
            "model.frontend.stem_channels=8", "model.frontend.resnet_width=8",
            "model.frontend.out_dim=16",
            'data.dataset="lrs3"', f'data.root="{lrs_test_root}"',
            "data.crop_size=16", "data.length_buckets=[16,32]",
            f"data.eval_batch_size={bs}", 'decode="greedy"'])
        hyps = [json.loads(l) for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]
        return res, hyps

    r2, h2 = run(2)
    r3, h3 = run(3)
    assert len(h2) == 5 and len(h3) == 5  # one record per utterance
    assert sorted(h["ref"] for h in h2) == sorted(h["ref"] for h in h3)
    assert r2["test/wer"] == pytest.approx(r3["test/wer"])
    assert r2["test/words"] == r3["test/words"]

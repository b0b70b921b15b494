"""evaluate CLI main() on synthetic data (word accuracy + sentence WER)."""

import json
import sys

import numpy as np
import pytest


def _run_main(monkeypatch, capsys, args):
    from syncvsr_tpu import evaluate

    monkeypatch.setattr(sys, "argv", ["evaluate"] + args)
    evaluate.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_evaluate_word(monkeypatch, capsys, tmp_path, mesh8):
    monkeypatch.chdir(tmp_path)
    res = _run_main(monkeypatch, capsys, [
        "preset=lrw_landmark", "model.encoder.layers=1", "model.encoder.dim=16",
        "model.encoder.heads=2", "model.frontend.input_features=8",
        "model.labels=9", "model.codec.audio_vocab_size=7",
        'model.dtype="float32"', 'data.dataset="synthetic"',
        "data.batch_size=8", "data.num_frames=4"])
    assert "test/acc1" in res and np.isfinite(res["test/loss"])


SENT_ARGS = [
    "preset=lrs3", 'model.frontend.kind="landmark"',
    "model.frontend.input_features=8", "model.encoder.layers=1",
    "model.encoder.dim=16", "model.encoder.heads=2",
    "model.encoder.conv_kernel=7", "model.decoder.layers=1",
    "model.decoder.dim=16", "model.decoder.heads=2",
    "model.decoder.hidden=32", "model.labels=13",
    "model.codec.audio_vocab_size=11", 'model.dtype="float32"',
    'data.dataset="synthetic"', "data.batch_size=2"]


def test_evaluate_sentence_lm_fusion(monkeypatch, capsys, tmp_path):
    """lm_ckpt + lm_weight>0 deterministically changes the beam hypotheses
    (reference LM scorer wiring, LRS/video/lightning.py:243-279)."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.models.lm import TransformerLM
    from syncvsr_tpu.utils import checkpoint as ckpt

    monkeypatch.chdir(tmp_path)
    lm = TransformerLM(vocab=13, layers=1, dim=16, heads=2, hidden=32,
                       embed_dim=8)
    params = lm.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))["params"]
    ckpt.save_msgpack(str(tmp_path / "lm.msgpack"),
                      {"params": jax.device_get(params)})
    lm_args = [f'lm_ckpt="{tmp_path / "lm.msgpack"}"', "lm_weight=0.7",
               "lm_layers=1", "lm_dim=16", "lm_heads=2", "lm_hidden=32",
               "lm_embed_dim=8"]

    def hyps(args):
        _run_main(monkeypatch, capsys, args)
        return [json.loads(l) for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]

    base = hyps(SENT_ARGS + ["beam_size=4"])
    fused = hyps(SENT_ARGS + ["beam_size=4"] + lm_args)
    fused2 = hyps(SENT_ARGS + ["beam_size=4"] + lm_args)
    assert fused == fused2  # deterministic
    assert [h["score"] for h in base] != [h["score"] for h in fused]


def test_evaluate_sentence_greedy(monkeypatch, capsys, tmp_path):
    monkeypatch.chdir(tmp_path)
    res = _run_main(monkeypatch, capsys, [
        "preset=lrs3", 'model.frontend.kind="landmark"',
        "model.frontend.input_features=8", "model.encoder.layers=1",
        "model.encoder.dim=16", "model.encoder.heads=2",
        "model.encoder.conv_kernel=7", "model.decoder.layers=1",
        "model.decoder.dim=16", "model.decoder.heads=2",
        "model.decoder.hidden=32", "model.labels=13",
        "model.codec.audio_vocab_size=11", 'model.dtype="float32"',
        'data.dataset="synthetic"', "data.batch_size=4", 'decode="greedy"'])
    assert "test/wer" in res
    # hypothesis dump written
    assert (tmp_path / "hypotheses.jsonl").exists()


def test_evaluate_sentence_beam_batched(monkeypatch, capsys, tmp_path):
    """decode=beam_batched (vmap'd whole-bucket beam search) produces the
    same hypotheses as the per-utterance beam decoder."""
    monkeypatch.chdir(tmp_path)

    def hyps(args):
        _run_main(monkeypatch, capsys, args)
        return [json.loads(l)["hyp"] for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]

    per_utt = hyps(SENT_ARGS + ["beam_size=4"])
    batched = hyps(SENT_ARGS + ["beam_size=4", 'decode="beam_batched"'])
    assert batched == per_utt


def test_beam_batched_lm_fusion_matches_per_utt(monkeypatch, capsys, tmp_path):
    """LM shallow fusion is honored by decode=beam_batched (same hypotheses
    as the per-utterance decoder with the same LM)."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.models.lm import TransformerLM
    from syncvsr_tpu.utils import checkpoint as ckpt

    monkeypatch.chdir(tmp_path)
    lm = TransformerLM(vocab=13, layers=1, dim=16, heads=2, hidden=32,
                       embed_dim=8)
    params = lm.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))["params"]
    ckpt.save_msgpack(str(tmp_path / "lm.msgpack"),
                      {"params": jax.device_get(params)})
    lm_args = [f'lm_ckpt="{tmp_path / "lm.msgpack"}"', "lm_weight=0.7",
               "lm_layers=1", "lm_dim=16", "lm_heads=2", "lm_hidden=32",
               "lm_embed_dim=8", "beam_size=4"]

    def hyps(args):
        _run_main(monkeypatch, capsys, args)
        return [json.loads(l)["hyp"] for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]

    per_utt = hyps(SENT_ARGS + lm_args)
    batched = hyps(SENT_ARGS + lm_args + ['decode="beam_batched"'])
    assert batched == per_utt


def _mixed_size_eval_loader(monkeypatch, sizes):
    """Make the synthetic eval loader yield one batch per size in ``sizes``
    (the real LRS loader's buckets have different fixed batch sizes under
    data.max_batch_frames, and decode_pad=max funnels them to one tf)."""
    from syncvsr_tpu.data import factory, synthetic

    def mixed_iter(self):
        for i, b in enumerate(sizes):
            yield synthetic.sentence_batch(
                self.config, batch_size=b,
                num_frames=min(32, self.config.data.max_frames),
                seed=(10_000 + i) if not self.train else i)

    monkeypatch.setattr(factory.SyntheticLoader, "__iter__", mixed_iter)


def test_beam_batched_mixed_batch_sizes_on_mesh(monkeypatch, capsys, tmp_path,
                                                mesh8):
    """Regression: a data-axis-sharded beam_batched decoder built for a
    divisible batch (8 % 8 == 0) must not be reused for a later batch whose
    size doesn't divide the mesh (3 % 8 != 0) — sharding is decided per
    batch, so the second batch gets its own unsharded program instead of a
    GSPMD divisibility ValueError mid-eval."""
    _mixed_size_eval_loader(monkeypatch, sizes=(8, 3))
    monkeypatch.chdir(tmp_path)
    res = _run_main(monkeypatch, capsys,
                    SENT_ARGS + ["beam_size=4", 'decode="beam_batched"'])
    assert res["decode_compiles"] == 2  # one sharded + one unsharded program
    assert np.isfinite(res["test/wer"])
    assert len(open(tmp_path / "hypotheses.jsonl").read().splitlines()) == 11


def test_eval_mesh_config_mismatch_degrades_unsharded(monkeypatch, capsys,
                                                      tmp_path, mesh8):
    """Pod-training mesh overrides (mesh.data not matching the local device
    count) must not abort sentence-level eval: _eval_mesh falls back to
    unsharded decoding (greedy and beam_batched)."""
    monkeypatch.chdir(tmp_path)
    for extra in (['decode="greedy"'], ['decode="beam_batched"', "beam_size=2"]):
        res = _run_main(monkeypatch, capsys,
                        SENT_ARGS + ["mesh.data=3"] + extra)
        assert np.isfinite(res["test/wer"])


def test_evaluate_sentence_align(monkeypatch, capsys, tmp_path):
    """decode=align: CTC forced alignment of the ground-truth transcripts —
    every utterance gets a frame-level path whose collapse equals the ref
    tokens (the reference forced_align capability, espnet ctc.py:181-245)."""
    monkeypatch.chdir(tmp_path)
    res = _run_main(monkeypatch, capsys, SENT_ARGS + ['decode="align"'])
    assert res["test/aligned_utts"] > 0
    records = [json.loads(l) for l in open("hypotheses.jsonl")]
    assert len(records) == res["test/aligned_utts"]
    for r in records:
        assert "alignment" in r and "segments" in r
        # collapsing the alignment reproduces the transcript's text
        toks = [t for t, a, b in r["segments"]]
        assert " ".join(toks).split() == r["ref"].split() or \
            "".join(toks) == r["ref"].replace(" ", "")

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

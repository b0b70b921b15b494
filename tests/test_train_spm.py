"""Round-trip test for the pure-Python SPM unigram trainer (the reference's
LRS/video/spm/train.sh recipe): train on synthetic transcripts, load via
data.spm_vocab, tokenize, decode back."""

import subprocess
import sys

import numpy as np
import pytest

from syncvsr_tpu.data.tokenizer import build_text_transform
from syncvsr_tpu.tools.train_spm import (
    normalize,
    train_unigram,
    viterbi,
    write_model,
    write_units,
)

WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "speech", "recognition", "video", "model", "training", "words"]


def _corpus(n=50, seed=0):
    rng = np.random.RandomState(seed)
    return [" ".join(rng.choice(WORDS, size=rng.randint(3, 9)).tolist()).upper()
            for _ in range(n)]


def test_train_tokenize_decode_roundtrip(tmp_path):
    lines = _corpus()
    pieces = train_unigram(lines, vocab_size=120)
    assert len(pieces) <= 117          # 3 reserved slots
    assert any(len(p) > 1 for p, _ in pieces), "no multi-char pieces learned"
    # scores are normalized log-probs
    assert all(s < 0.0 for _, s in pieces)

    prefix = str(tmp_path / "uni")
    write_model(prefix + ".model", pieces)
    write_units(prefix + "_units.txt", lines, prefix + ".model")

    tt = build_text_transform(spm_vocab=prefix + ".model")
    assert tt.token_list[0] == "<blank>"
    assert tt.token_list[-1] == "<eos>"
    assert tt.hashmap["<unk>"] == 1
    for text in lines[:10]:
        ids = tt.tokenize(text)
        assert ids.dtype == np.int32 and ids.ndim == 1 and len(ids) > 0
        # ids live strictly inside (blank, eos)
        assert ids.min() >= 1 and ids.max() < tt.vocab_size - 1
        assert tt.post_process(ids) == text
    # frequent words should compress below character rate
    ids = tt.tokenize("THE QUICK BROWN FOX")
    assert len(ids) < len("THE QUICK BROWN FOX")


def test_trained_scores_drive_viterbi_like_the_runtime_encoder(tmp_path):
    """The training-side Viterbi and the runtime encoder must segment
    identically for in-vocabulary text (same DP, same scores)."""
    lines = _corpus(seed=1)
    pieces = train_unigram(lines, vocab_size=100)
    prefix = str(tmp_path / "uni")
    write_model(prefix + ".model", pieces)
    write_units(prefix + "_units.txt", lines, prefix + ".model")

    from syncvsr_tpu.data.tokenizer import SentencePieceUnigram

    sp = SentencePieceUnigram.from_file(prefix + ".model")
    scores = dict(pieces)
    for text in lines[:10]:
        s = normalize(text)
        assert sp.encode_as_pieces(text) == viterbi(s, scores, 8)


def test_unknown_chars_map_to_unk(tmp_path):
    lines = _corpus(seed=2)
    prefix = str(tmp_path / "uni")
    write_model(prefix + ".model", train_unigram(lines, vocab_size=100))
    write_units(prefix + "_units.txt", lines, prefix + ".model")
    tt = build_text_transform(spm_vocab=prefix + ".model")
    ids = tt.tokenize("THE Z7Q")        # chars absent from the corpus
    assert (np.asarray(ids) == tt.hashmap["<unk>"]).any()


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text("\n".join(_corpus(seed=3)) + "\n", encoding="utf8")
    prefix = tmp_path / "out" / "uni100"
    proc = subprocess.run(
        [sys.executable, "-m", "syncvsr_tpu.tools.train_spm", str(inp),
         "--model-prefix", str(prefix), "--vocab-size", "100"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (tmp_path / "out" / "uni100.model").exists()
    units = (tmp_path / "out" / "uni100_units.txt").read_text().splitlines()
    assert units[0] == "<unk> 1"
    assert all(int(u.split()[-1]) == i + 1 for i, u in enumerate(units))
    tt = build_text_transform(spm_vocab=str(prefix) + ".model")
    text = _corpus(seed=3)[0]
    assert tt.post_process(tt.tokenize(text)) == text

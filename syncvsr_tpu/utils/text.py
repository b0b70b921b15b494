"""Text metrics: edit distance / WER (replaces torchaudio.functional
edit_distance used at LRS/video/lightning.py:17-19, and editdistance in
espnet's ErrorCalculator)."""

from __future__ import annotations

from typing import List, Sequence


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    m, n = len(ref), len(hyp)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


class WordErrorRate:
    """Streaming WER accumulator (reference accumulates edit distance over the
    test epoch: LRS/video/lightning.py:127-128,233-234)."""

    def __init__(self):
        self.total_edit_distance = 0
        self.total_length = 0

    def update(self, ref_text: str, hyp_text: str):
        ref_words = ref_text.split()
        hyp_words = hyp_text.split()
        self.total_edit_distance += edit_distance(ref_words, hyp_words)
        self.total_length += len(ref_words)

    @property
    def wer(self) -> float:
        return self.total_edit_distance / max(self.total_length, 1)

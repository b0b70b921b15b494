"""Decoding: greedy CTC and jittable hybrid CTC/attention beam search."""

from syncvsr_tpu.decode.beam_search import BeamSearchConfig, beam_search  # noqa: F401
from syncvsr_tpu.decode.ctc_prefix import CTCPrefixScorer  # noqa: F401

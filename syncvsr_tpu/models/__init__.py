"""Flax model zoo: frontends, encoders, decoders, heads, task modules."""

from syncvsr_tpu.models.registry import build_model  # noqa: F401

"""Data pipelines: dataset readers, batching, synthetic fixtures, tokenizers."""

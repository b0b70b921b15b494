"""Compute-path ops: in-step augmentation, fused losses, CTC, image transforms."""

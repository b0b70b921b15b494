"""In-step temporal CutMix / mixup, fully inside the jitted train step.

Semantics follow the reference's TPU stack (LRW/landmark/src/utils.py:14-56):
a contiguous temporal span (beta-distributed length) is swapped with a partner
sample (the batch reversed along axis 0); soft labels and word-boundary masks
are lerped by the span mass; aligned audio tokens are swapped over the matching
(audio_alignment x longer) span. The GPU stack's per-sample Python-loop CutMix
(LRW/video/src/augment.py:12-118) is replaced by this single vectorized form.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def temporal_cutmix(
    rng: jax.Array,
    inputs: Array,          # [B, T, ...] float features (or video frames)
    labels: Array,          # [B, L] soft labels
    audio_tokens: Array,    # [B, T*alignment, G] int tokens
    word_mask: Optional[Array] = None,  # [B, T] float
    alpha: float = 1.0,
) -> Tuple[Array, Array, Array, Optional[Array]]:
    if alpha == 0.0:
        return inputs, labels, audio_tokens, word_mask

    r1, r2 = jax.random.split(rng)
    ratio = jax.random.beta(r1, alpha, alpha)
    start = (1.0 - ratio) * jax.random.uniform(r2)

    t = inputs.shape[1]
    grid = jnp.linspace(0.0, 1.0, t)
    keep = ~((start < grid) & (grid <= start + ratio))          # True -> keep own frames
    lam = keep.mean()

    audio_rep = audio_tokens.shape[1] // t
    audio_keep = jnp.repeat(keep, audio_rep, axis=0)

    def flip(x):
        return jnp.flip(x, axis=0)

    kshape = (1, t) + (1,) * (inputs.ndim - 2)
    inputs = jnp.where(keep.reshape(kshape), inputs, flip(inputs))
    labels = lam * labels + (1.0 - lam) * flip(labels)
    am = audio_keep[None, :, None]
    audio_tokens = jnp.where(am, audio_tokens, flip(audio_tokens))
    if word_mask is not None:
        word_mask = lam * word_mask + (1.0 - lam) * flip(word_mask)
    return inputs, labels, audio_tokens, word_mask


def batch_mixup(
    rng: jax.Array,
    videos: Array,
    alpha: float,
) -> Tuple[Array, Array]:
    """DC-TCN style batch mixup: lerp every sample toward the batch rolled by 1
    with a folded beta weight lam in [0, 0.5] (reference
    LRW/video/src/lightning.py:264-269). Returns mixed videos and lam; the
    caller lerps the two losses (own labels vs rolled labels) by lam."""
    if alpha <= 0.0:
        return videos, jnp.asarray(0.0, videos.dtype)
    lam = jax.random.beta(rng, alpha, alpha)
    lam = 0.5 - jnp.abs(0.5 - lam)
    mixed = videos + lam.astype(videos.dtype) * (jnp.roll(videos, 1, axis=0) - videos)
    return mixed, lam

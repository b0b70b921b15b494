"""Input frontends mapping raw modalities to [B, T, D] sequences.

* ``Conv3DResNetFrontend``: 3D conv stem + ResNet-18 trunk over 96x96 mouth
  crops (reference LRW/video/src/lightning.py:49-55 and espnet
  conv3d_extractor.py:19-48). Videos arrive channels-last [B, T, H, W, 1]
  (uint8 or float); the stem runs in compute dtype.
* ``LandmarkFrontend``: per-frame linear token embedding of flattened facial
  landmarks (reference LRW/landmark/src/modeling.py:115 — a 1x1 conv).
* ``Conv1DResNetFrontend``: raw-audio ResNet1D (espnet conv1d_extractor.py:13-33),
  the audio-modality option.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import activation, trunc_normal
from syncvsr_tpu.models.resnet import ResNet1D, ResNetTrunk

Array = jax.Array


class Conv3DResNetFrontend(nn.Module):
    stem_channels: int = 64
    width: int = 64
    relu_type: str = "swish"
    stem_act: str = "gelu"   # LRW stem uses GELU (lightning.py:52)
    fold_threshold: int = 256  # fold [B,T,...] -> [B*T,...] at/above this T
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, videos: Array, train: bool = False) -> Array:
        # videos: [B, T, H, W, C]; normalize handled upstream (data/image ops)
        x = videos.astype(self.dtype)
        # Conv3D 1->64, kernel (5,7,7), stride (1,2,2), pad (2,3,3) — run via
        # the space-to-depth regrouping (ops/stem.py), ~2x faster on the MXU;
        # the parameter keeps the reference (5,7,7,1,C) layout
        from syncvsr_tpu.ops.stem import stem_conv3d_s2d

        kernel = self.param(
            "stem_conv_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (5, 7, 7, 1, self.stem_channels))
        if x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            x = stem_conv3d_s2d(x, kernel, self.dtype)
        else:  # odd spatial sizes: direct conv fallback
            from syncvsr_tpu.ops.stem import stem_conv3d_reference

            x = stem_conv3d_reference(x, kernel, self.dtype)
        # Long clips (sentence buckets): fold time into batch after the only
        # temporal op (the stem conv). At bs 1 x T 1800 XLA otherwise keeps
        # batch-minor 5D layouts whose (C 64->128, B 1->2) tile padding
        # inflates HLO temps ~2.7x and OOMs one chip; the fold costs two
        # layout copies but halves padded memory. BN statistics reduce over
        # all non-channel axes either way — numerics are identical. Short
        # clips (LRW, T=29, large batch) keep the copy-free 5D path.
        fold = x.shape[1] >= self.fold_threshold
        if fold:
            b, t = x.shape[0], x.shape[1]
            x = x.reshape((b * t,) + x.shape[2:])
        from syncvsr_tpu.models.resnet import _bn

        x = _bn(train, self.dtype, "stem_bn")(x)
        x = activation(self.stem_act)(x)
        # MaxPool3D (1,3,3) stride (1,2,2) pad (0,1,1) (time never pooled)
        from syncvsr_tpu.ops.maxpool import max_pool_s2, use_recompute_maxpool

        if use_recompute_maxpool():
            x = max_pool_s2(x)  # recomputed bwd instead of select-and-scatter
        elif fold:
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        else:
            x = nn.max_pool(x, (1, 3, 3), (1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)))
        # trunk runs on the 5D tensor (kt=1 convs): one layout from stem to
        # pooling, no [B,T]->[B*T] reshape copies
        feats = ResNetTrunk(self.width, relu_type=self.relu_type,
                            dtype=self.dtype, name="resnet")(x, train)
        if fold:
            feats = feats.reshape(b, t, feats.shape[-1])
        return feats


class LandmarkFrontend(nn.Module):
    dim: int = 320
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, landmarks: Array, train: bool = False) -> Array:
        # landmarks: [B, T, F] with pad sentinel -100 already zeroed upstream
        return nn.Dense(self.dim, kernel_init=trunc_normal(), dtype=self.dtype,
                        param_dtype=jnp.float32, name="wte")(landmarks.astype(self.dtype))


class Conv1DResNetFrontend(nn.Module):
    width: int = 64
    relu_type: str = "swish"
    a_upsample_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: Array, train: bool = False) -> Array:
        # audio: [B, S] or [B, S, 1] raw 16 kHz waveform; truncate to //640
        if audio.ndim == 2:
            audio = audio[..., None]
        s = (audio.shape[1] // 640) * 640
        return ResNet1D(self.width, relu_type=self.relu_type,
                        a_upsample_ratio=self.a_upsample_ratio, dtype=self.dtype,
                        name="resnet1d")(audio[:, :s].astype(self.dtype), train)


def build_frontend(cfg, dtype, embed_dim: int = 0, name: str = "frontend") -> nn.Module:
    """Construct the frontend named ``name``; ``embed_dim`` sets the landmark
    embedding width (other frontends have intrinsic output widths)."""
    if cfg.kind == "landmark":
        return LandmarkFrontend(dim=embed_dim or cfg.out_dim, dtype=dtype, name=name)
    if cfg.kind == "conv3d_resnet":
        return Conv3DResNetFrontend(stem_channels=cfg.stem_channels,
                                    width=cfg.resnet_width,
                                    relu_type=cfg.relu_type,
                                    stem_act=cfg.stem_act,
                                    fold_threshold=cfg.fold_threshold,
                                    dtype=dtype, name=name)
    if cfg.kind == "conv1d_resnet":
        return Conv1DResNetFrontend(width=cfg.resnet_width, relu_type=cfg.relu_type,
                                    dtype=dtype, name=name)
    raise ValueError(f"unknown frontend kind: {cfg.kind}")

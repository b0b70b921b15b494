"""Flax ResNet-18 trunks (2D per-frame, 1D audio) for the video/audio frontends.

Re-designs the reference's torch ResNets (LRW/video/src/tcn/models/resnet.py:75,
espnet backbones/modules/resnet.py:177, resnet1d.py:213) channels-last (NHWC /
NWC) so XLA maps the convs straight onto the MXU. BatchNorm statistics are
computed over the *global* (mesh-sharded) batch: under jit + NamedSharding the
batch-axis reduction is a global reduction, which gives the reference's
``sync_batchnorm: True`` (lrs3.yaml:95) for free.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import activation
from syncvsr_tpu.ops.pallas_bn import FastBatchNorm

Array = jax.Array


def _bn(train: bool, dtype, name: str) -> nn.Module:
    """Trunk BatchNorm: FastBatchNorm (analytic custom-VJP, XLA statistics)
    measured ~2 ms/step faster than autodiff nn.BatchNorm on the LRW video
    step; identical params/collections/numerics (tests/test_pallas_bn.py)."""
    return FastBatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dtype, name=name)


class SpatialConv(nn.Module):
    """2D spatial conv that also accepts 5D [B, T, H, W, C] input, applied
    per frame as a kt=1 conv3d with the SAME [kh, kw, I, O] parameter.

    Keeping the video trunk 5D end-to-end lets XLA hold one layout from the
    stem through the trunk — the logical [B,T,...] -> [B*T,...] reshape at
    this boundary otherwise materializes two full-tensor layout copies
    (~1.6 GB/step at bs 96 on the LRW workload, measured from the compiled
    HLO)."""

    channels: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel
        w = self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.channels))
        pad = (k - 1) // 2
        if x.ndim == 4:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w[None].astype(self.dtype),
            window_strides=(1, self.stride, self.stride),
            padding=((0, 0), (pad, pad), (pad, pad)),
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            preferred_element_type=self.dtype)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    relu_type: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = activation(self.relu_type)
        conv = lambda k, s, name: SpatialConv(self.channels, k, s, self.dtype,
                                              name=name)
        bn = lambda name: _bn(train, self.dtype, name)
        residual = x
        y = act(bn("bn1")(conv(3, self.stride, "conv1")(x)))
        y = bn("bn2")(conv(3, 1, "conv2")(y))
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = conv(1, self.stride, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return act(y + residual)


class ResNetTrunk(nn.Module):
    """layer1..layer4 of ResNet-18 (stems live in the frontends). Input
    [N, H, W, C_in] or video [B, T, H, W, C_in]; output [N, 512*width/64]
    (or [B, T, ...]) after global spatial average pooling."""

    width: int = 64
    blocks: Sequence[int] = (2, 2, 2, 2)
    relu_type: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, n in enumerate(self.blocks):
            channels = self.width * (2 ** i)
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(channels, stride, self.relu_type, self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train)
        spatial = (1, 2) if x.ndim == 4 else (2, 3)
        return jnp.mean(x, axis=spatial)


class BasicBlock1D(nn.Module):
    channels: int
    stride: int = 1
    relu_type: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = activation(self.relu_type)
        conv = lambda c, k, s, name: nn.Conv(c, (k,), (s,), padding="SAME", use_bias=False,
                                             dtype=self.dtype, param_dtype=jnp.float32,
                                             name=name)
        bn = lambda name: _bn(train, self.dtype, name)
        residual = x
        y = act(bn("bn1")(conv(self.channels, 3, self.stride, "conv1")(x)))
        y = bn("bn2")(conv(self.channels, 3, 1, "conv2")(y))
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1,), (self.stride,), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return act(y + residual)


class ResNet1D(nn.Module):
    """Raw-audio 1-D ResNet-18 (reference resnet1d.py: conv1 k=80 s=4 then four
    stages, final average pooling of 20 samples to land on ~25 fps)."""

    width: int = 64
    blocks: Sequence[int] = (2, 2, 2, 2)
    relu_type: str = "swish"
    a_upsample_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # x: [B, S, 1] raw waveform
        act = activation(self.relu_type)
        x = nn.Conv(self.width, (80,), (4,), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem_conv")(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = act(x)
        for i, n in enumerate(self.blocks):
            channels = self.width * (2 ** i)
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock1D(channels, stride, self.relu_type, self.dtype,
                                 name=f"layer{i + 1}_{j}")(x, train)
        # 16 kHz / 4 / 8 = 500 Hz; pool 20//ratio to reach 25*ratio fps
        pool = 20 // self.a_upsample_ratio
        b, s, c = x.shape
        x = x[:, : (s // pool) * pool].reshape(b, s // pool, pool, c).mean(axis=2)
        return x

"""Classic and multibranch temporal convolutional networks.

Flax equivalents of the reference's vendored TCN family
(LRW/video/src/tcn/models/tcn.py:121-253): TemporalBlock stacks with dilation
2^level and symmetric-chomp padding (== SAME for odd effective kernels),
single-kernel (TemporalConvNet) and multibranch (one branch per kernel size)
variants, with an optional depthwise+pointwise (dwpw) factorization.
Channels-last [B, T, C].
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import activation

Array = jax.Array


def _conv(channels, kernel, dilation, groups=1, name=None, dtype=jnp.float32):
    return nn.Conv(channels, (kernel,), kernel_dilation=(dilation,),
                   padding="SAME", feature_group_count=groups,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class ConvBNAct(nn.Module):
    channels: int
    kernel: int
    dilation: int
    relu_type: str = "swish"
    dwpw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = activation(self.relu_type)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, param_dtype=jnp.float32,
                                       name=name)
        if self.dwpw:
            x = _conv(x.shape[-1], self.kernel, self.dilation, groups=x.shape[-1],
                      name="dw", dtype=self.dtype)(x)
            x = act(bn("dw_bn")(x))
            x = _conv(self.channels, 1, 1, name="pw", dtype=self.dtype)(x)
            return act(bn("pw_bn")(x))
        x = _conv(self.channels, self.kernel, self.dilation, name="conv",
                  dtype=self.dtype)(x)
        return act(bn("bn")(x))


class TemporalBlock(nn.Module):
    channels: int
    kernel: int
    dilation: int
    dropout: float = 0.2
    relu_type: str = "swish"
    dwpw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = ConvBNAct(self.channels, self.kernel, self.dilation, self.relu_type,
                      self.dwpw, self.dtype, name="conv1")(x, train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = ConvBNAct(self.channels, self.kernel, self.dilation, self.relu_type,
                      self.dwpw, self.dtype, name="conv2")(h, train)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        res = x
        if x.shape[-1] != self.channels:
            res = _conv(self.channels, 1, 1, name="downsample", dtype=self.dtype)(x)
        return activation(self.relu_type)(h + res)


class MultibranchTemporalBlock(nn.Module):
    channels: int
    kernel_sizes: Sequence[int]
    dilation: int
    dropout: float = 0.2
    relu_type: str = "swish"
    dwpw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        branch_ch = self.channels // len(self.kernel_sizes)
        outs = [ConvBNAct(branch_ch, k, self.dilation, self.relu_type, self.dwpw,
                          self.dtype, name=f"branch0_{i}")(x, train)
                for i, k in enumerate(self.kernel_sizes)]
        h = nn.Dropout(self.dropout)(jnp.concatenate(outs, -1),
                                     deterministic=not train)
        outs = [ConvBNAct(branch_ch, k, self.dilation, self.relu_type, self.dwpw,
                          self.dtype, name=f"branch1_{i}")(h, train)
                for i, k in enumerate(self.kernel_sizes)]
        h = nn.Dropout(self.dropout)(jnp.concatenate(outs, -1),
                                     deterministic=not train)
        res = x
        # reference condition (tcn.py:92): downsample whenever
        # n_inputs // num_kernels != n_outputs — i.e. effectively always,
        # including in==out blocks; kept for checkpoint/numerics parity
        if x.shape[-1] // len(self.kernel_sizes) != self.channels:
            res = _conv(self.channels, 1, 1, name="downsample", dtype=self.dtype)(x)
        return activation(self.relu_type)(h + res)


class TemporalConvNet(nn.Module):
    """Single-kernel TCN: level i uses dilation 2^i (tcn.py:236-253)."""

    channels: Sequence[int] = (256, 256, 256)
    kernel: int = 3
    dropout: float = 0.2
    relu_type: str = "swish"
    dwpw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, c in enumerate(self.channels):
            x = TemporalBlock(c, self.kernel, 2 ** i, self.dropout,
                              self.relu_type, self.dwpw, self.dtype,
                              name=f"block_{i}")(x, train)
        return x


class MultibranchTemporalConvNet(nn.Module):
    """Multibranch TCN (tcn.py:121-143)."""

    channels: Sequence[int] = (256, 256, 256)
    kernel_sizes: Sequence[int] = (3, 5, 7)
    dropout: float = 0.2
    relu_type: str = "swish"
    dwpw: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, c in enumerate(self.channels):
            x = MultibranchTemporalBlock(c, self.kernel_sizes, 2 ** i,
                                         self.dropout, self.relu_type,
                                         self.dwpw, self.dtype,
                                         name=f"block_{i}")(x, train)
        return x

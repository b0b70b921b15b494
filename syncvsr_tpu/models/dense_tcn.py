"""Dense temporal convolutional network (DC-TCN) — the second LRW model family.

TPU-first reimplementation of the reference's DenseTCN
(LRW/video/src/tcn/models/densetcn.py:149): an input transition to
``reduced_size`` channels, then dense blocks whose layers each apply two rounds
of multi-kernel (3/5/7) dilated (1/2/5 cycling) temporal convolutions with a
residual, concatenating every layer's output; transitions reset the width
between blocks. Convs are channels-last [B, T, C] 1-D convolutions with "SAME"
padding (the reference's symmetric Chomp1d of the (k-1)*dilation pad is exactly
SAME padding for odd kernels). Final width = reduced + layers*growth of the
last block (1664 for the published config, matching its 1664-d audio head,
LRW/video/src/lightning.py:245-248).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import SELayer1D, activation

Array = jax.Array


class TemporalConvLayer(nn.Module):
    channels: int
    kernel: int
    dilation: int
    relu_type: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return activation(self.relu_type)(x)


class MultiKernelLayer(nn.Module):
    """One dense layer: two multi-branch conv rounds + residual
    (reference _ConvBatchChompRelu, densetcn.py:39-101)."""

    out_channels: int
    kernel_sizes: Sequence[int]
    dilation: int
    dropout: float = 0.2
    relu_type: str = "swish"
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        branch_ch = self.out_channels // len(self.kernel_sizes)
        outs = []
        for i, k in enumerate(self.kernel_sizes):
            h = x
            if self.use_se:
                h = SELayer1D(x.shape[-1], dtype=self.dtype, name=f"se_{i}")(h)
            outs.append(TemporalConvLayer(branch_ch, k, self.dilation, self.relu_type,
                                          self.dtype, name=f"conv0_{i}")(h, train))
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        outs = [TemporalConvLayer(branch_ch, k, self.dilation, self.relu_type,
                                  self.dtype, name=f"conv1_{i}")(h, train)
                for i, k in enumerate(self.kernel_sizes)]
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        res = x
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                          param_dtype=jnp.float32, name="downsample")(x)
        return activation(self.relu_type)(h + res)


class Transition(nn.Module):
    channels: int
    relu_type: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.channels, (1,), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return activation(self.relu_type)(x)


class DenseTCN(nn.Module):
    growth_rates: Sequence[int] = (384, 384, 384, 384)
    blocks: Sequence[int] = (3, 3, 3, 3)
    kernel_sizes: Sequence[int] = (3, 5, 7)
    dilations: Sequence[int] = (1, 2, 5)
    reduced_size: int = 512
    dropout: float = 0.2
    relu_type: str = "swish"
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Transition(self.reduced_size, "prelu", self.dtype, name="transition0")(x, train)
        for bi, (num_layers, growth) in enumerate(zip(self.blocks, self.growth_rates)):
            features = [x]
            for li in range(num_layers):
                dilation = self.dilations[li % len(self.dilations)]
                inp = jnp.concatenate(features, axis=-1) if len(features) > 1 else features[0]
                y = MultiKernelLayer(growth, self.kernel_sizes, dilation, self.dropout,
                                     self.relu_type, self.use_se, self.dtype,
                                     name=f"block{bi}_layer{li}")(inp, train)
                features.append(y)
            x = jnp.concatenate(features, axis=-1)
            if bi != len(self.blocks) - 1:
                x = Transition(self.reduced_size, self.relu_type, self.dtype,
                               name=f"transition{bi + 1}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_bn")(x)
        return x

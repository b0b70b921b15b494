"""Conformer encoder for sentence-level VSR.

TPU-first reimplementation of the reference's espnet Conformer
(encoder.py:62-319, encoder_layer.py:18-150, convolution.py:14-75,
attention.py:192-278, embedding.py:153-217): macaron feed-forwards (0.5x),
relative-position multi-head attention (Transformer-XL style with the
pad+reshape rel-shift — static-shaped, no gathers), a depthwise conv module
(pointwise-GLU -> depthwise k=31 -> BN -> swish -> pointwise), pre-LN blocks
with a final LayerNorm. Input embedding scales by sqrt(d) and emits the
relative sinusoid table.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import LayerNorm

Array = jax.Array


def rel_sinusoid_table(t: int, dim: int, dtype=jnp.float32) -> Array:
    """Positions t-1 .. -(t-1): [2T-1, D] sinusoid table (embedding.py:172-202)."""
    pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)  # positive first, reversed
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    angles = pos[:, None] * div[None, :]
    pe = jnp.zeros((2 * t - 1, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


def rel_shift(x: Array) -> Array:
    """[B, H, T, 2T-1] -> [B, H, T, T]: align relative scores so column j holds
    relative distance (i - j) (attention.py:216-236)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


class RelPositionAttention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos_emb: Array, bias: Optional[Array] = None,
                 det: bool = True) -> Array:
        d_k = self.dim // self.heads
        proj = lambda name: nn.DenseGeneral((self.heads, d_k), axis=-1,
                                            dtype=self.dtype, param_dtype=jnp.float32,
                                            name=name)
        q, k, v = proj("wq")(x), proj("wk")(x), proj("wv")(x)  # [B,T,H,D]
        p = nn.DenseGeneral((self.heads, d_k), axis=-1, use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="linear_pos")(pos_emb)        # [2T-1,H,D]

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                            (self.heads, d_k)).astype(self.dtype)
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                            (self.heads, d_k)).astype(self.dtype)

        ac = jnp.einsum("bqhd,bkhd->bhqk", q + bias_u, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bqhd,phd->bhqp", q + bias_v, p,
                        preferred_element_type=jnp.float32)
        scores = (ac + rel_shift(bd)) / math.sqrt(d_k)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0 and not det:
            keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout,
                                        probs.shape)
            probs = jnp.where(keep, probs / (1.0 - self.dropout), 0.0)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                               param_dtype=jnp.float32, name="wo")(o)


class ConvModule(nn.Module):
    dim: int
    kernel: int = 31
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pad_mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        # zero padded frames so the depthwise conv doesn't leak across padding
        if pad_mask is not None:
            x = x * pad_mask[:, :, None].astype(x.dtype)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pw1")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(g)                                  # GLU
        h = nn.Conv(self.dim, (self.kernel,), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(h)
        h = h * nn.sigmoid(h)                                  # swish
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="pw2")(h)


class ConformerBlock(nn.Module):
    dim: int
    heads: int
    hidden: int
    conv_kernel: int = 31
    macaron: bool = True
    dropout: float = 0.1
    attn_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos_emb: Array, bias: Optional[Array],
                 pad_mask: Optional[Array], det: bool = True) -> Array:
        drop = nn.Dropout(self.dropout)
        ffn = lambda name: ConformerFeedForward(self.dim, self.hidden,
                                                self.dropout, dtype=self.dtype,
                                                name=name)
        if self.macaron:
            x = x + 0.5 * drop(ffn("ff_macaron")(
                LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x), det),
                deterministic=det)
        x = x + drop(RelPositionAttention(self.dim, self.heads, self.attn_dropout,
                                          self.dtype, name="attn")(
            LayerNorm(dtype=self.dtype, name="norm_mha")(x), pos_emb, bias, det),
            deterministic=det)
        x = x + drop(ConvModule(self.dim, self.conv_kernel, self.dtype, name="conv")(
            LayerNorm(dtype=self.dtype, name="norm_conv")(x), pad_mask, not det),
            deterministic=det)
        x = x + (0.5 if self.macaron else 1.0) * drop(ffn("ff")(
            LayerNorm(dtype=self.dtype, name="norm_ff")(x), det), deterministic=det)
        return LayerNorm(dtype=self.dtype, name="norm_final")(x)


class ConformerFeedForward(nn.Module):
    """espnet PositionwiseFeedForward (positionwise_feed_forward.py:12-30).
    NOTE: the vendored espnet uses ReLU here — the config's relu_type=swish
    only reaches the frontends — so ReLU is the parity default."""

    dim: int
    hidden: int
    dropout: float = 0.1
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, det: bool = True) -> Array:
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="w1")(x)
        h = h * nn.sigmoid(h) if self.activation == "swish" else nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=det)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="w2")(h)


class ConformerEncoder(nn.Module):
    """[B, T, D_in] (frontend features) -> [B, T, dim]."""

    layers: int
    dim: int
    heads: int
    hidden: int
    conv_kernel: int = 31
    macaron: bool = True
    dropout: float = 0.1
    attn_dropout: float = 0.1
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pad_mask: Optional[Array] = None,
                 det: bool = True) -> Array:
        t = x.shape[1]
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="embed")(x)
        x = x * math.sqrt(self.dim)
        x = nn.Dropout(self.dropout)(x, deterministic=det)
        pos_emb = rel_sinusoid_table(t, self.dim, self.dtype)
        pos_emb = nn.Dropout(self.dropout)(pos_emb, deterministic=det)

        bias = None
        if pad_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            bias = jnp.where(pad_mask[:, None, None, :], 0.0, neg)

        block_cls = ConformerBlock
        if self.remat:
            block_cls = nn.remat(ConformerBlock, static_argnums=(5,))
        for i in range(self.layers):
            x = block_cls(self.dim, self.heads, self.hidden, self.conv_kernel,
                          self.macaron, self.dropout, self.attn_dropout,
                          self.dtype, name=f"block_{i}")(x, pos_emb, bias, pad_mask, det)
        # espnet applies a trailing after_norm when normalize_before (encoder.py:286-287)
        return LayerNorm(dtype=self.dtype, name="after_norm")(x)

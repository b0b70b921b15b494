"""Shared building blocks for the model zoo.

TPU notes: every module takes a compute ``dtype`` (bfloat16 by default on TPU)
while parameters stay float32; matmul-heavy paths keep the last dim a multiple
of 128 where the configs allow so XLA tiles them onto the MXU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
Dtype = Any


def trunc_normal(stddev: float = 0.02) -> Callable:
    """Truncated-normal init (reference: LRW/landmark/src/utils.py:74-78)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2, 2, shape, dtype) * stddev

    return init


class RMSNorm(nn.Module):
    """Root-mean-square norm (x-transformers ``use_rmsnorm`` equivalent,
    reference LRW/video/src/lightning.py:102)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (x32 * scale).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm computed in f32, emitting compute dtype (eps 1e-6 = the flax
    default the reference landmark stack uses)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            param_dtype=jnp.float32, use_bias=self.use_bias)(x)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((-x2, x1), axis=-1)


def rope_angles(positions: Array, head_dim: int, base: float = 10000.0) -> Tuple[Array, Array]:
    """cos/sin tables for rotary embedding over the full head dim.

    Matches the reference's landmark attention (LRW/landmark/src/modeling.py:71-76):
    frequencies ``base ** -linspace(0, 1, d/2, endpoint=False)``.
    """
    freqs = base ** -jnp.linspace(0, 1, head_dim // 2, endpoint=False)
    theta = positions[..., None].astype(jnp.float32) * freqs  # [..., T, d/2]
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Apply rotary embedding to ``x`` of shape [B, T, H, D].

    cos/sin have shape [T, D/2] (or broadcastable). Pairs the two halves of the
    head dim like the reference (split-halves convention, not interleaved).
    """
    c = jnp.concatenate((cos, cos), axis=-1)[None, :, None, :].astype(x.dtype)
    s = jnp.concatenate((sin, sin), axis=-1)[None, :, None, :].astype(x.dtype)
    return x * c + rotate_half(x) * s


class DropPath(nn.Module):
    """Stochastic depth over the residual branch; drop decision broadcast over
    (time, feature) dims like the reference's ``Dropout(broadcast_dims=(1,2))``
    (LRW/landmark/src/modeling.py:105)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, det: bool = True) -> Array:
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x * nn.sigmoid(x)


def activation(name: str) -> Callable[[Array], Array]:
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "swish": nn.silu,
        "silu": nn.silu,
        "prelu": nn.leaky_relu,  # parameter-free approximation; resnet uses swish in configs
    }[name]


class FeedForward(nn.Module):
    """Position-wise FFN; plain GELU MLP or GLU variant (``ff_glu`` in the
    reference's x-transformers encoder, LRW/video/src/lightning.py:103)."""

    dim: int
    hidden: int
    dropout: float = 0.0
    use_glu: bool = False
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, det: bool = True) -> Array:
        dense = lambda d, name: nn.Dense(d, kernel_init=trunc_normal(), dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        out_dim = self.out_dim or self.dim
        if self.use_glu:
            u = dense(self.hidden, "wi_gate")(x)
            v = dense(self.hidden, "wi")(x)
            h = nn.gelu(u) * v
        else:
            h = nn.gelu(dense(self.hidden, "wi")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=det)
        return dense(out_dim, "wo")(h)


class SELayer1D(nn.Module):
    """Squeeze-excitation over channels of a [B, T, C] sequence
    (reference: LRW/video/src/tcn/models/se_module.py:8)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=1)  # [B, C]
        s = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, :]


def dot_attention(q: Array, k: Array, v: Array, bias: Optional[Array],
                  dropout: float, det: bool, module: nn.Module,
                  dtype: Dtype) -> Array:
    """Softmax attention core. q,k,v: [B, T, H, D]; bias broadcastable to
    [B, H, Tq, Tk]. Softmax in f32 for stability; matmuls hit the MXU in
    compute dtype."""
    depth = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(depth).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout > 0.0 and not det:
        rng = module.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - dropout, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout), 0.0)
    probs = probs.astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)


def make_pad_bias(pad_mask: Array, dtype=jnp.float32) -> Array:
    """[B, T] boolean keep-mask -> additive attention bias [B, 1, 1, T]."""
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype)
    return jnp.where(pad_mask[:, None, None, :], 0.0, neg)


def causal_bias(t: int, dtype=jnp.float32) -> Array:
    """Additive causal mask [1, 1, T, T] (reference subsequent_mask,
    espnet/.../mask.py:20)."""
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype)
    return jnp.where(mask, 0.0, neg)[None, None]

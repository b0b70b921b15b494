"""Pre-LN transformer encoder with RoPE — the word-level sequence backbone.

Covers both reference flavours with one module:
  * landmark stack (LRW/landmark/src/modeling.py:98-136): LayerNorm + GELU MLP
    + rotary attention + droppath;
  * LRW video stack (LRW/video/src/lightning.py:93-105, x-transformers):
    RMSNorm + GLU feed-forward + rotary attention.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import (
    DropPath,
    FeedForward,
    LayerNorm,
    RMSNorm,
    apply_rope,
    dot_attention,
    rope_angles,
    trunc_normal,
)

Array = jax.Array


class RotaryAttention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0
    rope: bool = True
    # rotate only the first rope_dim dims of each head (0 = full head_dim).
    # x-transformers uses max(32, head_dim // 2) — needed for released-ckpt
    # parity (LRW/video/src/lightning.py:96-105)
    rope_dim: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, positions: Array, bias: Optional[Array] = None,
                 det: bool = True) -> Array:
        head_dim = self.dim // self.heads
        proj = lambda name: nn.DenseGeneral((self.heads, head_dim), axis=-1,
                                            kernel_init=trunc_normal(), dtype=self.dtype,
                                            param_dtype=jnp.float32, name=name)
        q, k, v = proj("wq")(x), proj("wk")(x), proj("wv")(x)
        if self.rope:
            rd = self.rope_dim or head_dim
            cos, sin = rope_angles(positions, rd)
            if rd == head_dim:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            else:  # partial rotary: leave the tail dims unrotated
                q = jnp.concatenate(
                    (apply_rope(q[..., :rd], cos, sin), q[..., rd:]), axis=-1)
                k = jnp.concatenate(
                    (apply_rope(k[..., :rd], cos, sin), k[..., rd:]), axis=-1)
        o = dot_attention(q, k, v, bias, self.dropout, det, self, self.dtype)
        return nn.DenseGeneral(x.shape[-1], axis=(-2, -1), kernel_init=trunc_normal(),
                               dtype=self.dtype, param_dtype=jnp.float32, name="wo")(o)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    hidden: int
    use_rmsnorm: bool = False
    use_glu: bool = False
    rope: bool = True
    rope_dim: int = 0
    msa_dropout: float = 0.0
    mlp_dropout: float = 0.0
    droppath: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, positions: Array, bias: Optional[Array] = None,
                 det: bool = True) -> Array:
        norm = (lambda name: RMSNorm(dtype=self.dtype, name=name)) if self.use_rmsnorm \
            else (lambda name: LayerNorm(dtype=self.dtype, name=name))
        drop = DropPath(self.droppath)
        attn = RotaryAttention(self.dim, self.heads, self.msa_dropout, self.rope,
                               self.rope_dim, self.dtype, name="attn")
        ff = FeedForward(x.shape[-1], self.hidden, self.mlp_dropout, self.use_glu,
                         dtype=self.dtype, name="ff")
        x = x + drop(attn(norm("norm_attn")(x), positions, bias, det), det)
        x = x + drop(ff(norm("norm_ff")(x), det), det)
        return x


class TransformerEncoder(nn.Module):
    """Stack of pre-LN rotary blocks over [B, T, D]; returns [B, T, D]."""

    layers: int
    dim: int
    heads: int
    hidden: int
    use_rmsnorm: bool = False
    use_glu: bool = False
    rope: bool = True
    rope_dim: int = 0
    msa_dropout: float = 0.0
    mlp_dropout: float = 0.0
    droppath: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, positions: Optional[Array] = None,
                 bias: Optional[Array] = None, det: bool = True) -> Array:
        if positions is None:
            positions = jnp.arange(x.shape[1])
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(4,))
        for i in range(self.layers):
            x = block_cls(self.dim, self.heads, self.hidden, self.use_rmsnorm,
                          self.use_glu, self.rope, self.rope_dim,
                          self.msa_dropout, self.mlp_dropout,
                          self.droppath, self.dtype, name=f"block_{i}")(
                              x, positions, bias, det)
        final = RMSNorm(dtype=self.dtype) if self.use_rmsnorm else LayerNorm(dtype=self.dtype)
        return final(x)

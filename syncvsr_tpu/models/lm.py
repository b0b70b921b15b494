"""Language models for shallow fusion in beam search.

Reimplements the reference's optional LM scorers (espnet
lm/transformer.py:18-250, lm/default.py:16-429, lm/seq_rnn.py:10-178; config
stub lrs3.yaml language_model: embed 128, att 512, 8 heads, 16 layers, unit
2048, pos_enc none; lm_weight 0.0 by default). Both models expose the
jittable-beam contract: ``init_cache(width)`` and
``step(y_prev [W], pos, state) -> (logp [W, V], state)`` with states
gatherable along the beam dim, plus a teacher-forced ``__call__`` for LM
training/perplexity.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.decoder import FF, MHA, sinusoid_pe
from syncvsr_tpu.models.layers import LayerNorm, causal_bias

Array = jax.Array


class LMBlock(nn.Module):
    dim: int
    heads: int
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.attn = MHA(self.dim, self.heads, self.dropout, self.dtype)
        self.ff = FF(self.dim, self.hidden, self.dropout, self.dtype)
        self.norm1 = LayerNorm(dtype=self.dtype)
        self.norm2 = LayerNorm(dtype=self.dtype)

    def __call__(self, x: Array, bias: Array, det: bool = True) -> Array:
        h = self.norm1(x)
        x = x + self.attn(h, h, bias, det)
        return x + self.ff(self.norm2(x), det)

    def step_attend(self, x: Array, h: Array, k: Array, v: Array, pos: Array
                    ) -> Array:
        """Finish one step given the updated K/V [W, Lmax, H, Dk] (new token
        already written at ``pos``); see TransformerLM.step for the stacked
        cache update."""
        valid = jnp.arange(k.shape[1])[None, None, None, :] <= pos
        bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
        x = x + self.attn.attend_cached(h, k, v, bias)
        return x + self.ff(self.norm2(x), True)


class TransformerLM(nn.Module):
    vocab: int
    layers: int = 16
    dim: int = 512
    heads: int = 8
    hidden: int = 2048
    embed_dim: int = 128
    dropout: float = 0.0
    pos_enc: str = "none"   # lrs3.yaml: pos_enc none
    max_len: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.embed_dim, dtype=self.dtype,
                              param_dtype=jnp.float32)
        self.input_proj = nn.Dense(self.dim, dtype=self.dtype,
                                   param_dtype=jnp.float32)
        self.input_norm = LayerNorm(dtype=self.dtype)
        self.blocks = [LMBlock(self.dim, self.heads, self.hidden, self.dropout,
                               self.dtype, name=f"block_{i}")
                       for i in range(self.layers)]
        self.norm = LayerNorm(dtype=self.dtype)
        self.output = nn.Dense(self.vocab, dtype=jnp.float32,
                               param_dtype=jnp.float32)

    def _embed(self, ys: Array, offset: int = 0) -> Array:
        # espnet "linear" input layer: Linear -> LayerNorm -> (Dropout) ->
        # ReLU -> pos_enc (transformer/encoder.py:143-150) — matched exactly
        # so released espnet LM checkpoints import losslessly
        x = nn.relu(self.input_norm(self.input_proj(self.embed(ys))))
        if self.pos_enc == "sinusoidal":
            x = x * math.sqrt(self.dim) + sinusoid_pe(
                ys.shape[1], self.dim, offset, self.dtype)[None]
        return x

    def __call__(self, ys: Array, det: bool = True) -> Array:
        """Teacher-forced logits [B, L, V] for next-token prediction."""
        x = self._embed(ys)
        bias = causal_bias(ys.shape[1])
        for block in self.blocks:
            x = block(x, bias, det)
        return self.output(self.norm(x).astype(jnp.float32))

    def init_cache(self, width: int, max_len: Optional[int] = None):
        """K/V cache with all layers stacked on axis 1 (beam axis leading),
        like the decoder's — the beam search reorders it with one gather per
        leaf instead of one per layer."""
        d_k = self.dim // self.heads
        ml = max_len or self.max_len
        shape = (width, self.layers, ml, self.heads, d_k)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype)}

    def step(self, y_prev: Array, pos: Array, cache) -> Tuple[Array, Any]:
        x = self._embed(y_prev[:, None], offset=0)
        k_all, v_all = cache["k"], cache["v"]   # [W, layers, Lmax, H, Dk]
        for i, block in enumerate(self.blocks):
            h = block.norm1(x)
            k_new, v_new = block.attn.project_kv(h)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[:, None], (0, i, pos, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[:, None], (0, i, pos, 0, 0))
            x = block.step_attend(x, h, k_all[:, i], v_all[:, i], pos)
        logits = self.output(self.norm(x[:, 0]).astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1), {"k": k_all, "v": v_all}


class RNNLM(nn.Module):
    """LSTM LM (espnet default/seq_rnn equivalents)."""

    vocab: int
    layers: int = 2
    dim: int = 650
    embed_dim: int = 650
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.embed_dim, dtype=self.dtype,
                              param_dtype=jnp.float32)
        self.cells = [nn.OptimizedLSTMCell(self.dim, param_dtype=jnp.float32,
                                           name=f"lstm_{i}")
                      for i in range(self.layers)]
        self.output = nn.Dense(self.vocab, dtype=jnp.float32,
                               param_dtype=jnp.float32)

    def init_cache(self, width: int):
        return [(jnp.zeros((width, self.dim), self.dtype),
                 jnp.zeros((width, self.dim), self.dtype))
                for _ in range(self.layers)]

    def step(self, y_prev: Array, pos: Array, state) -> Tuple[Array, Any]:
        x = self.embed(y_prev)
        new_state = []
        for cell, s in zip(self.cells, state):
            s, x = cell(s, x)
            new_state.append(s)
        logits = self.output(x.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1), new_state

    def __call__(self, ys: Array, det: bool = True) -> Array:
        b, l = ys.shape
        state = self.init_cache(b)
        outs = []
        for i in range(l):
            logp, state = self.step(ys[:, i], jnp.asarray(i), state)
            outs.append(logp)
        return jnp.stack(outs, axis=1)

"""Transformer attention decoder with an explicit KV-cache step mode.

Reimplements the reference's espnet decoder (decoder.py:39-227,
decoder_layer.py:15-121): embedding + sinusoidal PE (scaled by sqrt(d)),
pre-LN blocks of causal self-attention, source attention over encoder memory,
and feed-forward; trailing LayerNorm and vocab projection.

Unlike espnet's ``forward_one_step`` (which re-runs attention over the whole
prefix each step, caching layer *outputs*), the step mode here caches K/V per
layer in static-shaped buffers and attends only from the new token — O(L) work
per step, and the cache pytree can be gathered along the batch/beam dim by the
beam search when hypotheses are reordered.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.models.layers import LayerNorm, causal_bias, dot_attention

Array = jax.Array


def sinusoid_pe(t: int, dim: int, offset: int = 0, dtype=jnp.float32) -> Array:
    pos = jnp.arange(offset, offset + t, dtype=jnp.float32)
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    angles = pos[:, None] * div[None, :]
    pe = jnp.zeros((t, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


class MHA(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        d_k = self.dim // self.heads
        dg = lambda name: nn.DenseGeneral((self.heads, d_k), axis=-1, dtype=self.dtype,
                                          param_dtype=jnp.float32, name=name)
        self.wq, self.wk, self.wv = dg("wq"), dg("wk"), dg("wv")
        self.wo = nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="wo")

    def __call__(self, q_in: Array, kv_in: Array, bias: Optional[Array],
                 det: bool = True) -> Array:
        q, k, v = self.wq(q_in), self.wk(kv_in), self.wv(kv_in)
        o = dot_attention(q, k, v, bias, self.dropout, det, self, self.dtype)
        return self.wo(o)

    def project_kv(self, kv_in: Array) -> Tuple[Array, Array]:
        return self.wk(kv_in), self.wv(kv_in)

    def attend_cached(self, q_in: Array, k: Array, v: Array,
                      bias: Optional[Array]) -> Array:
        q = self.wq(q_in)
        o = dot_attention(q, k, v, bias, 0.0, True, self, self.dtype)
        return self.wo(o)

    def attend_shared(self, q_in: Array, k: Array, v: Array,
                      keep: Optional[Array]) -> Array:
        """Single-query attention over K/V shared by every row of q_in
        (beam search: all W hypotheses attend the same encoder memory, so
        K/V are stored once as [T, H, Dk] instead of broadcast to [W, ...]).
        q_in: [W, 1, D]; keep: [T] or [W, T] boolean mask."""
        q = self.wq(q_in[:, 0])                              # [W, H, Dk]
        scores = jnp.einsum("whd,khd->whk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
        if keep is not None:
            neg = jnp.finfo(jnp.float32).min
            mask = keep if keep.ndim == 2 else keep[None]    # [W|1, T]
            scores = scores + jnp.where(mask[:, None, :], 0.0, neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        o = jnp.einsum("whk,khd->whd", probs, v.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return self.wo(o)[:, None, :]


class FF(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, det: bool = True) -> Array:
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                             name="w1")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=det)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="w2")(h)


class DecoderLayer(nn.Module):
    dim: int
    heads: int
    hidden: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MHA(self.dim, self.heads, self.dropout, self.dtype)
        self.src_attn = MHA(self.dim, self.heads, self.dropout, self.dtype)
        self.ff = FF(self.dim, self.hidden, self.dropout, self.dtype)
        self.norm1 = LayerNorm(dtype=self.dtype)
        self.norm2 = LayerNorm(dtype=self.dtype)
        self.norm3 = LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: Array, self_bias: Array, memory: Array,
                 mem_bias: Optional[Array], det: bool = True) -> Array:
        h = self.norm1(x)
        x = x + self.drop(self.self_attn(h, h, self_bias, det), deterministic=det)
        x = x + self.drop(self.src_attn(self.norm2(x), memory, mem_bias, det),
                          deterministic=det)
        x = x + self.drop(self.ff(self.norm3(x), det), deterministic=det)
        return x

    def project_step_kv(self, x: Array) -> Tuple[Array, Array, Array]:
        """x: [B, 1, D] new token -> (normed input h, K/V slices [B, 1, H, Dk])
        for the stacked cache update done by TransformerDecoder.step."""
        h = self.norm1(x)
        k_new, v_new = self.self_attn.project_kv(h)
        return h, k_new, v_new

    def step_attend(self, x: Array, h: Array, k: Array, v: Array, pos: Array,
                    memory: Optional[Array], mem_bias: Optional[Array],
                    mem_kv: Optional[Dict[str, Array]] = None,
                    mem_keep: Optional[Array] = None) -> Array:
        """Finish one decode step given this layer's updated self-attn K/V
        [B, Lmax, H, Dk] (new token already written at ``pos``).

        With ``mem_kv`` (precomputed {"k","v"} [T, H, Dk] from
        ``MHA.project_kv`` on the encoder memory) the cross-attention skips
        the per-step K/V projections — espnet's forward_one_step re-projects
        the full memory every step (decoder.py:204-227); at beam width W that
        is 2 x layers x W x T x D^2 MACs/step of pure recompute."""
        lmax = k.shape[1]
        # attend only to positions <= pos
        valid = jnp.arange(lmax)[None, None, None, :] <= pos
        bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
        x = x + self.self_attn.attend_cached(h, k, v, bias)
        if mem_kv is not None:
            x = x + self.src_attn.attend_shared(self.norm2(x), mem_kv["k"],
                                                mem_kv["v"], mem_keep)
        else:
            x = x + self.src_attn(self.norm2(x), memory, mem_bias, True)
        x = x + self.ff(self.norm3(x), True)
        return x


def grow_cache(cache: Dict[str, Array], new_len: int) -> Dict[str, Array]:
    """Resize the stacked K/V cache's length axis (axis 2 of
    [B, layers, Lmax, H, Dk]) to ``new_len`` — the staged-decode hook for
    beam_search(grow_cache=...). Growth zero-pads (unwritten positions are
    never attended: the step masks to <= pos); shrink slices (only used on
    an all-zeros init). Pure layout op; no parameters involved. The
    TransformerLM's stacked cache shares this layout, so the same hook
    stages LM-fusion decoding."""
    def resize(c: Array) -> Array:
        extra = new_len - c.shape[2]
        if extra == 0:
            return c
        if extra < 0:
            return c[:, :, :new_len]
        width = [(0, 0), (0, 0), (0, extra), (0, 0), (0, 0)]
        return jnp.pad(c, width)

    return {k: resize(v) for k, v in cache.items()}


class TransformerDecoder(nn.Module):
    vocab: int
    layers: int = 6
    dim: int = 768
    heads: int = 12
    hidden: int = 3072
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.dim, param_dtype=jnp.float32,
                              dtype=self.dtype)
        self.blocks = [DecoderLayer(self.dim, self.heads, self.hidden, self.dropout,
                                    self.dtype, name=f"block_{i}")
                       for i in range(self.layers)]
        self.after_norm = LayerNorm(dtype=self.dtype)
        self.output = nn.Dense(self.vocab, dtype=jnp.float32, param_dtype=jnp.float32)
        self.emb_drop = nn.Dropout(self.dropout)

    def _embed(self, ys: Array, offset: int = 0, det: bool = True) -> Array:
        x = self.embed(ys) * math.sqrt(self.dim)
        x = x + sinusoid_pe(ys.shape[1], self.dim, offset, self.dtype)[None]
        return self.emb_drop(x, deterministic=det)

    def __call__(self, ys_in: Array, ys_in_lengths: Array, memory: Array,
                 memory_mask: Optional[Array], det: bool = True) -> Array:
        """Teacher-forced: ys_in [B, L] -> logits [B, L, V]."""
        l = ys_in.shape[1]
        x = self._embed(ys_in, det=det)
        self_bias = causal_bias(l)
        pad_keep = jnp.arange(l)[None, :] < ys_in_lengths[:, None]
        self_bias = self_bias + jnp.where(pad_keep[:, None, None, :], 0.0,
                                          jnp.finfo(jnp.float32).min)
        mem_bias = None
        if memory_mask is not None:
            mem_bias = jnp.where(memory_mask[:, None, None, :], 0.0,
                                 jnp.finfo(jnp.float32).min)
        for block in self.blocks:
            x = block(x, self_bias, memory, mem_bias, det)
        return self.output(self.after_norm(x).astype(jnp.float32))

    def init_cache(self, batch: int, max_len: int) -> Dict[str, Array]:
        """Self-attn K/V cache with ALL layers stacked on axis 1
        ([B, layers, Lmax, H, Dk]), beam/batch staying the leading axis: the
        beam search reorders hypotheses with ``tree_map(lambda c: c[sel])``,
        and the stacked layout makes that 2 gathers instead of 2 x layers
        (espnet's batch_beam_search.py:287-349 pays a Python-side per-layer
        re-index instead)."""
        d_k = self.dim // self.heads
        shape = (batch, self.layers, max_len, self.heads, d_k)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype)}

    def precompute_memory(self, memory: Array) -> Dict[str, Dict[str, Array]]:
        """Project the encoder memory [T, D] (or [B, T, D]) through every
        layer's cross-attention K/V once; feed the result to ``step`` via
        ``mem_kv`` so decode steps skip the projections entirely."""
        out = {}
        for i, block in enumerate(self.blocks):
            k, v = block.src_attn.project_kv(memory)
            out[f"block_{i}"] = {"k": k, "v": v}
        return out

    def step(self, y_prev: Array, pos: Array, cache: Dict, memory: Array,
             memory_mask: Optional[Array],
             mem_kv: Optional[Dict] = None) -> Tuple[Array, Dict]:
        """One decode step: y_prev [B] token ids at position ``pos`` -> log-probs
        [B, V] for the next token, updated cache."""
        x = self.embed(y_prev[:, None]) * math.sqrt(self.dim)
        # positional term for a single dynamic position
        div = jnp.exp(jnp.arange(0, self.dim, 2, dtype=jnp.float32)
                      * -(math.log(10000.0) / self.dim))
        ang = pos.astype(jnp.float32) * div
        pe = jnp.zeros((self.dim,), jnp.float32)
        pe = pe.at[0::2].set(jnp.sin(ang)).at[1::2].set(jnp.cos(ang))
        x = x + pe.astype(self.dtype)[None, None, :]

        mem_bias = None
        if memory_mask is not None and mem_kv is None:
            mem_bias = jnp.where(memory_mask[:, None, None, :], 0.0,
                                 jnp.finfo(jnp.float32).min)
        k_all, v_all = cache["k"], cache["v"]   # [B, layers, Lmax, H, Dk]
        for i, block in enumerate(self.blocks):
            h, k_new, v_new = block.project_step_kv(x)
            # write this layer's new-token K/V at (layer i, position pos)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[:, None], (0, i, pos, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[:, None], (0, i, pos, 0, 0))
            x = block.step_attend(
                x, h, k_all[:, i], v_all[:, i], pos, memory, mem_bias,
                mem_kv=None if mem_kv is None else mem_kv[f"block_{i}"],
                mem_keep=memory_mask)
        logits = self.output(self.after_norm(x[:, 0]).astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1), {"k": k_all, "v": v_all}

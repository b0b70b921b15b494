"""Pallas TPU kernel: fused audio-sync cross-entropy forward.

Fuses the sync head's projection + per-slot softmax-CE reduction
(reference materializes [B, T, A*G, V] logits in HBM —
LRW/video/src/lightning.py:167-171) into one VMEM-resident pass: each grid
step projects a row tile onto the padded vocab on the MXU, reduces each slot's
(logsumexp - label logit) on the VPU, and accumulates a scalar (sum, count)
pair — logits never leave VMEM. Backward reuses the chunked-scan recompute
from ops/sync_loss.py via custom_vjp.

Layout: vocab padded to a multiple of 128 lanes per slot (bias -1e30 on pads),
feature dim padded to 128, tokens padded to 128 lanes; rows tiled at 256.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syncvsr_tpu.ops.sync_loss import _chunked_bwd, make_chunk_residuals

Array = jax.Array

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, w_ref, b_ref, tok_ref, out_ref, *, slots: int,
            vpad: int, tile: int):
    logits = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, :][None, :]

    # accumulate per-slot CE into column s and valid-counts into column
    # slots+s of a [tile, 128] register block (Mosaic dislikes 1D/scalar
    # reductions; the final scalar sum happens outside the kernel)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    acc = jnp.zeros((tile, 128), jnp.float32)
    for s in range(slots):
        sl = logits[:, s * vpad:(s + 1) * vpad]              # [tile, vpad]
        tok = tok_ref[:, s]                                  # [tile]
        valid = tok >= 0
        safe = jnp.where(valid, tok, 0)
        m = jnp.max(sl, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(sl - m), axis=-1, keepdims=True))
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, vpad), 1)
                  == safe[:, None])
        lab = jnp.sum(jnp.where(onehot, sl, 0.0), axis=-1, keepdims=True)
        ce = jnp.where(valid[:, None], lse - lab, 0.0)       # [tile, 1]
        acc += jnp.where(col == s, ce, 0.0)
        acc += jnp.where(col == slots + s,
                         valid[:, None].astype(jnp.float32), 0.0)
    sums = jnp.sum(acc, axis=0, keepdims=True)               # [1, 128]
    # output blocks must be (8, 128)-shaped: row 0 carries the sums
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    out_ref[:] = jnp.where(row == 0, jnp.broadcast_to(sums, (8, 128)), 0.0)


def _kernel_split(x_ref, w_ref, b_ref, tok_ref, out_ref, *, slots: int,
                  vpad: int, tile: int):
    """Slot-split variant: grid (row tiles, slots); each step projects onto
    ONE slot's [dpad, vpad] weight block (~0.6 MB at lrs3 dims vs the 4.5 MB
    monolithic block whose double-buffered footprint brushes the VMEM
    ceiling at d=768)."""
    s = pl.program_id(1)
    logits = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, :][None, :]                    # [tile, vpad]

    # slot-s token per row via a masked lane reduction (no dynamic lane
    # slicing in Mosaic): exactly one lane matches col == s
    col128 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    tok = jnp.sum(jnp.where(col128 == s, tok_ref[:], 0), axis=1,
                  keepdims=True)                              # [tile, 1]
    valid = tok >= 0
    safe = jnp.where(valid, tok, 0)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, vpad), 1) == safe)
    lab = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1, keepdims=True)
    ce = jnp.where(valid, lse - lab, 0.0)                     # [tile, 1]

    part = (jnp.where(col128 == s, ce, 0.0)
            + jnp.where(col128 == slots + s,
                        valid.astype(jnp.float32), 0.0))
    sums = jnp.sum(part, axis=0, keepdims=True)               # [1, 128]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    block = jnp.where(row == 0, jnp.broadcast_to(sums, (8, 128)), 0.0)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = block

    @pl.when(s > 0)
    def _acc():
        out_ref[:] += block


# weight blocks larger than this run the slot-split kernel (the monolithic
# kernel's [dpad, slots*vpad] bf16 block, double-buffered next to the f32
# logits, exceeds VMEM around d=768/lrs3 dims)
_MONO_W_BYTES = 4 * 1024 * 1024


def _pallas_forward(features: Array, kernel: Array, bias: Array, tok: Array,
                    slots: int, vocab: int, tile: int = 256,
                    interpret: bool = False) -> Tuple[Array, Array]:
    """features [N, D], kernel [D, slots*vocab], bias [slots*vocab],
    tok [N, slots] (-1 = ignore) -> (ce_sum, count)."""
    n, d = features.shape
    vpad = _round_up(vocab, 128)
    dpad = _round_up(d, 128)
    npad = _round_up(max(n, tile), tile)

    x = jnp.pad(features.astype(jnp.bfloat16), ((0, npad - n), (0, dpad - d)))
    w = kernel.reshape(d, slots, vocab).astype(jnp.bfloat16)
    w = jnp.pad(w, ((0, dpad - d), (0, 0), (0, vpad - vocab)))
    w = w.reshape(dpad, slots * vpad)
    b = bias.reshape(slots, vocab).astype(jnp.float32)
    b = jnp.pad(b, ((0, 0), (0, vpad - vocab)), constant_values=_NEG)
    b = b.reshape(1, slots * vpad)
    t = jnp.pad(tok.astype(jnp.int32), ((0, npad - n), (0, 128 - slots)),
                constant_values=-1)

    n_tiles = npad // tile
    if dpad * slots * vpad * 2 > _MONO_W_BYTES:
        parts = pl.pallas_call(
            functools.partial(_kernel_split, slots=slots, vpad=vpad, tile=tile),
            grid=(n_tiles, slots),
            in_specs=[
                pl.BlockSpec((tile, dpad), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dpad, vpad), lambda i, s: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, vpad), lambda i, s: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
            interpret=interpret,
        )(x, w, b, t)
    else:
        parts = pl.pallas_call(
            functools.partial(_kernel, slots=slots, vpad=vpad, tile=tile),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, dpad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dpad, slots * vpad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, slots * vpad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
            interpret=interpret,
        )(x, w, b, t)
    ce_sum = parts[:, :slots].sum()
    count = parts[:, slots:2 * slots].sum()
    return ce_sum, count


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def pallas_sync_cross_entropy(features, kernel, bias, tokens, alignment,
                              groups, vocab, chunk=128, interpret=False):
    """Drop-in fused version of ops.sync_loss.sync_cross_entropy.

    features [B, T, D]; kernel [D, A*G*V]; bias [A*G*V];
    tokens [B, >=T*A, G] (-1 ignored). Mean CE over valid slots.
    """
    b, t, d = features.shape
    slots = alignment * groups
    tok = tokens.reshape(b, -1, groups)[:, : t * alignment].reshape(b, t, slots)
    ce_sum, count = _pallas_forward(
        features.reshape(b * t, d), kernel, bias, tok.reshape(b * t, slots),
        slots, vocab, interpret=interpret)
    return ce_sum / jnp.maximum(count, 1.0)


def _fwd(features, kernel, bias, tokens, alignment, groups, vocab, chunk,
         interpret):
    loss = pallas_sync_cross_entropy(features, kernel, bias, tokens, alignment,
                                     groups, vocab, chunk, interpret)
    # residuals in the layout the chunked scan backward expects (inputs only —
    # no recompute in the forward pass)
    res = make_chunk_residuals(features, kernel, bias, tokens, alignment,
                               groups, chunk)
    return loss, res


def _bwd(alignment, groups, vocab, chunk, interpret, res, g):
    return _chunked_bwd(alignment, groups, vocab, chunk, res, g)


pallas_sync_cross_entropy.defvjp(_fwd, _bwd)

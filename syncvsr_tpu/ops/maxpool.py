"""3x3/stride-2/pad-1 spatial max-pool with an optional recomputed backward.

XLA differentiates ``reduce_window``-max through a ``select-and-scatter`` op
that costs ~4.2 ms of the LRW train step (profile: the [96,29,48,48,64] stem
activation). The alternative here recomputes the routing in the backward pass
instead: every input position belongs to at most 4 of the overlapping 3x3/s2
windows, so

    dx[p] = sum_{w containing p} gy[w] * (x[p] == y[w])

is 9 shifted elementwise terms over dilated views of (y, gy) — one fused
elementwise pass reading x once, instead of XLA's windowed scatter.

Tie semantics differ from select-and-scatter (which routes each window's
gradient to the FIRST maximal element): on exact ties the equality test
routes the FULL window gradient to EVERY maximal element — k-way ties
amplify that window's gradient k-fold rather than redistributing it. Float
activations tie rarely (bf16 rounding makes it possible), the training
effect is nil, but exact-parity tests must use distinct values.

MEASURED AND CLOSED: the full-step A/B (tools/bench_bn.py ab lrw
default,mpr, v5e) read 144.9 vs 99.8 ms/step — the dilation pads/shifts do
not fuse on the batch-minor trunk layout, so select-and-scatter stays the
default and SYNCVSR_MAXPOOL_RECOMPUTE=1 remains a documented dead end.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def use_recompute_maxpool() -> bool:
    return bool(int(os.environ.get("SYNCVSR_MAXPOOL_RECOMPUTE", "0")))


def _pool_dims(ndim: int):
    """Window/stride/padding tuples pooling the (-3, -2) spatial axes."""
    window = [1] * ndim
    strides = [1] * ndim
    padding = [(0, 0)] * ndim
    for ax in (ndim - 3, ndim - 2):
        window[ax] = 3
        strides[ax] = 2
        padding[ax] = (1, 1)
    return tuple(window), tuple(strides), tuple(padding)


def _pool_fwd_raw(x: Array) -> Array:
    window, strides, padding = _pool_dims(x.ndim)
    return lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype), lax.max,
                             window, strides, padding)


def _dilate_to_input(v: Array, in_shape, fill) -> Array:
    """Place out-grid values at their window centers (input coords 2*wi) on
    the input grid, everything else ``fill`` — lax.pad with interior 1."""
    ndim = v.ndim
    cfg = [(0, 0, 0)] * ndim
    for ax in (ndim - 3, ndim - 2):
        hi = in_shape[ax] - (2 * v.shape[ax] - 1)
        cfg[ax] = (0, hi, 1)
    return lax.pad(v, jnp.asarray(fill, v.dtype), cfg)


def _shift(v: Array, d: int, ax: int, fill) -> Array:
    """v shifted by d along ax (out[i] = v[i + d]), edges filled."""
    if d == 0:
        return v
    ndim = v.ndim
    cfg = [(0, 0, 0)] * ndim
    cfg[ax] = (-d, d, 0)  # negative low padding trims; high padding refills
    return lax.pad(v, jnp.asarray(fill, v.dtype), cfg)


@jax.custom_vjp
def max_pool_s2(x: Array) -> Array:
    """3x3 stride-2 pad-1 max pool over the (-3, -2) axes of [..., H, W, C]."""
    return _pool_fwd_raw(x)


def _mp_fwd(x):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _mp_bwd(res, gy):
    x, y = res
    ndim = x.ndim
    h_ax, w_ax = ndim - 3, ndim - 2
    # NaN never equals x, so dilation/shift fill positions contribute nothing
    yd = _dilate_to_input(y, x.shape, jnp.nan)
    gd = _dilate_to_input(gy, x.shape, 0)
    dx = jnp.zeros_like(gy, shape=x.shape)
    for di in (-1, 0, 1):
        ys_h = _shift(yd, di, h_ax, jnp.nan)
        gs_h = _shift(gd, di, h_ax, 0)
        for dj in (-1, 0, 1):
            ys = _shift(ys_h, dj, w_ax, jnp.nan)
            gs = _shift(gs_h, dj, w_ax, 0)
            dx = dx + gs * (x == ys).astype(gy.dtype)
    return (dx,)


max_pool_s2.defvjp(_mp_fwd, _mp_bwd)

"""Pallas TPU BatchNorm: bandwidth-bound statistics kernels + analytic VJP.

XLA's convert+reduce fusions for train-mode BN statistics run far below HBM
bandwidth on this workload (~115 GB/s measured round 1); these kernels stream
the activation once in bf16 and accumulate per-channel f32 (sum, sum-of-
squares) — and, in the backward pass, (sum dy, sum dy*xhat) — in VMEM across
a sequential grid. The normalization itself and the dx formula stay in XLA
(pure elementwise, fuses into neighbors).

Channel folding: Mosaic wants the minor dim a multiple of 128 lanes. For
C < 128 the [N, C] view is bitcast to [N*C/128, 128] (free in row-major
layout) and the folded per-column sums are re-added at the end — no padding
copy of the activation.

Layout/convention parity: identical math to flax nn.BatchNorm
(use_fast_variance E[x^2]-E[x]^2, biased variance, running stats
ra = m*ra + (1-m)*batch); param/collection names match nn.BatchNorm so
checkpoints interoperate either way.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fold(c: int):
    """How many rows to fold into the 128-lane minor dim; None when the
    channel count can't tile the lanes (fall back to the XLA reduction)."""
    if c >= 128:
        return 1 if c % 128 == 0 else None
    return 128 // c if 128 % c == 0 else None


def _stats_kernel(x_ref, out_ref, *, n_rows: int, tile: int):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)                    # [tile, cw]
    # rows past n_rows are padding: zero contribution
    row_id = i * tile + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = jnp.where(row_id < n_rows, x, 0.0)
    s = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    part = (jnp.where(rows == 0, jnp.broadcast_to(s, out_ref.shape), 0.0)
            + jnp.where(rows == 1, jnp.broadcast_to(s2, out_ref.shape), 0.0))

    @pl.when(i == 0)
    def _init():
        out_ref[:] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[:] += part


def _bwd_kernel(g_ref, x_ref, mi_ref, out_ref, *, n_rows: int, tile: int):
    i = pl.program_id(0)
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    mean = mi_ref[0, :][None, :]
    inv = mi_ref[1, :][None, :]
    row_id = i * tile + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    valid = row_id < n_rows
    g = jnp.where(valid, g, 0.0)
    xhat = jnp.where(valid, (x - mean) * inv, 0.0)
    s1 = jnp.sum(g, axis=0, keepdims=True)
    s2 = jnp.sum(g * xhat, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    part = (jnp.where(rows == 0, jnp.broadcast_to(s1, out_ref.shape), 0.0)
            + jnp.where(rows == 1, jnp.broadcast_to(s2, out_ref.shape), 0.0))

    @pl.when(i == 0)
    def _init():
        out_ref[:] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[:] += part


def _as_lanes(x2d: Array, fold: int) -> Array:
    n, c = x2d.shape
    return x2d.reshape(n // fold, c * fold) if fold > 1 else x2d


def _unfold_sum(row: Array, c: int, fold: int) -> Array:
    return row.reshape(fold, c).sum(0) if fold > 1 else row


def _tile_rows(n: int, cw: int) -> int:
    # keep the block under ~1 MB of VMEM
    return max(256, min(2048, _round_up((1 << 19) // (cw * 2), 256)))


def pallas_batch_stats(x2d: Array, interpret: bool = False
                       ) -> Tuple[Array, Array]:
    """[N, C] (any float dtype) -> per-channel f32 (sum, sumsq)."""
    n, c = x2d.shape
    fold = _fold(c)
    xl = _as_lanes(x2d, fold)
    rows, cw = xl.shape
    tile = _tile_rows(n, cw)
    rpad = _round_up(rows, tile)
    xl = jnp.pad(xl, ((0, rpad - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_stats_kernel, n_rows=rows, tile=tile),
        grid=(rpad // tile,),
        in_specs=[pl.BlockSpec((tile, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, cw), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, cw), jnp.float32),
        interpret=interpret,
    )(xl)
    return _unfold_sum(out[0], c, fold), _unfold_sum(out[1], c, fold)


def pallas_bn_bwd_stats(g2d: Array, x2d: Array, mean: Array, inv: Array,
                        interpret: bool = False) -> Tuple[Array, Array]:
    """Per-channel (sum g, sum g*xhat) with xhat=(x-mean)*inv."""
    n, c = g2d.shape
    fold = _fold(c)
    gl = _as_lanes(g2d, fold)
    xl = _as_lanes(x2d, fold)
    rows, cw = gl.shape
    tile = _tile_rows(n, cw)
    rpad = _round_up(rows, tile)
    gl = jnp.pad(gl, ((0, rpad - rows), (0, 0)))
    xl = jnp.pad(xl, ((0, rpad - rows), (0, 0)))
    mi = jnp.stack([jnp.tile(mean.astype(jnp.float32), fold),
                    jnp.tile(inv.astype(jnp.float32), fold)])
    mi = jnp.pad(mi, ((0, 6), (0, 0)))  # [8, cw] block
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rows=rows, tile=tile),
        grid=(rpad // tile,),
        in_specs=[
            pl.BlockSpec((tile, cw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, cw), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, cw), jnp.float32),
        interpret=interpret,
    )(gl, xl, mi)
    return _unfold_sum(out[0], c, fold), _unfold_sum(out[1], c, fold)


# ---------------------------------------------------------------------------
# Train-mode batch norm with analytic VJP over the Pallas stats
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    # Opt-in only: the full-step A/B (tools/bench_bn.py) measured the Pallas
    # stats kernels SLOWER than XLA's convert+reduce fusions on the 5D video
    # trunk (167 vs 103 ms/step — the [N, C] view re-creates layout copies),
    # while the analytic VJP *with XLA stats* is ~2 ms/step faster than
    # autodiff nn.BatchNorm (fewer backward reduction passes). So the module
    # default is XLA stats + analytic VJP.
    import os

    return bool(os.environ.get("SYNCVSR_BN_PALLAS"))


def _stats_stride():
    """Experimental (opt-in, SYNCVSR_BN_STATS_STRIDE=s | "sh"): estimate the
    batch statistics from a spatial subsample — x[..., ::s, ::s, :] (H and W)
    or x[..., ::s, :, :] ("h" suffix: H only; W is near-minor in the trunk's
    physical layout, so striding it fragments the reads — H-only keeps ~49 KB
    contiguous runs). The forward stats pass reads 1/s^2 (or 1/s) of the
    tensor. With thousands of images per batch the subsampled estimator is
    still extremely tight; the custom VJP below is the EXACT gradient of the
    subsampled-stats objective (correction terms land only on sampled
    positions, while dscale/dbias stay full exact sums). Returns (sh, sw)."""
    import os

    v = os.environ.get("SYNCVSR_BN_STATS_STRIDE", "1")
    if v.endswith("h"):
        return max(1, int(v[:-1])), 1
    s = max(1, int(v))
    return s, s


def _spatial_subsample(x: Array, sh: int, sw: int) -> Array:
    """Stride H and W (the two axes before channels) for ndim >= 4."""
    idx = [slice(None)] * x.ndim
    idx[-3] = slice(None, None, sh)
    idx[-2] = slice(None, None, sw)
    return x[tuple(idx)]


def _foldable(x2d: Array) -> bool:
    f = _fold(x2d.shape[-1])
    return f is not None and x2d.shape[0] % f == 0


def _lane_fold() -> bool:
    """Experimental (SYNCVSR_BN_FOLD64=1): narrow-channel (C < 128) stats
    reductions under-fill the 128-lane registers (C=64 wastes half of every
    vector op); reshaping adjacent row pairs into the lane dim before the
    reduction keeps the VPU full. Row-major reshape — free when XLA fuses it
    into the convert+reduce."""
    import os

    return bool(os.environ.get("SYNCVSR_BN_FOLD64"))


def _folded_sum(x32: Array) -> Array:
    n, c = x32.shape
    f = 128 // c
    return x32.reshape(n // f, 128).sum(0).reshape(f, c).sum(0)


def _can_lane_fold(x2d: Array) -> bool:
    n, c = x2d.shape
    return (_lane_fold() and c < 128 and 128 % c == 0
            and n % (128 // c) == 0)


def _stats_phys() -> bool:
    """Experimental (SYNCVSR_BN_STATS_PHYS=1): reduce the 5D trunk statistics
    in the activation's PHYSICAL order. The trunk layout is batch-minor —
    minor-to-major {C, B, W, H, T} (tools/profile_step.py, CLAUDE.md) — so
    transposing the logical [B,T,H,W,C] to [T,H,W,B,C] and viewing it as
    [T*H*W, B*C] is layout-preserving: the reduction then walks contiguous
    memory with a B*C-wide minor (full 128 lanes even at the stem's C=64,
    which under-fills half of every vector op in the default [N, C] view).
    The tiny [B, C] -> [C] fold afterwards is free. Whether XLA's layout
    assignment actually turns the transpose into a bitcast is the A/B
    question (tools/bench_bn.py ab)."""
    import os

    return bool(int(os.environ.get("SYNCVSR_BN_STATS_PHYS", "0")))


def _phys_view(x: Array) -> Array:
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(t * h * w, b * c)


def _phys_stats(x: Array) -> Tuple[Array, Array]:
    b, c = x.shape[0], x.shape[-1]
    x32 = _phys_view(x).astype(jnp.float32)
    s = jnp.sum(x32, 0).reshape(b, c).sum(0)
    s2 = jnp.sum(x32 * x32, 0).reshape(b, c).sum(0)
    return s, s2


def _phys_bwd_stats(gy: Array, x: Array, mean: Array, inv: Array
                    ) -> Tuple[Array, Array]:
    b, c = gy.shape[0], gy.shape[-1]
    gp = _phys_view(gy).astype(jnp.float32)
    xp = _phys_view(x).astype(jnp.float32)
    xhat = (xp - jnp.tile(mean, b)) * jnp.tile(inv, b)
    s1 = jnp.sum(gp, 0).reshape(b, c).sum(0)
    s2 = jnp.sum(gp * xhat, 0).reshape(b, c).sum(0)
    return s1, s2


def _stats_mxu() -> bool:
    """Experimental (SYNCVSR_BN_STATS_MXU=1): compute the statistics as MXU
    contractions over the activation's native N-D layout instead of VPU
    reductions over a [N, C] view. sum = ones . x and sumsq = diag(x^T x)
    via dot_general contracting every leading axis — no reshape, so the
    batch-minor 5D trunk layout is consumed as-is (the [N, C] view is what
    forced layout copies in every Pallas stats attempt, CLAUDE.md), and the
    MXU streams the tensor at full HBM bandwidth regardless of C < 128
    lane under-fill (the 11 ms stem-BN slab at C=64). The [C, C] Gram matrix
    wastes C x the reduction FLOPs, which is noise next to the conv FLOPs."""
    import os

    return bool(int(os.environ.get("SYNCVSR_BN_STATS_MXU", "0")))


def _mxu_moments(x: Array) -> Tuple[Array, Array]:
    """Per-channel f32 (sum, sumsq) over all leading axes of [..., C]."""
    nd = x.ndim - 1
    dims = tuple(range(nd))
    ones = jnp.ones(x.shape[:nd], x.dtype)
    s = jax.lax.dot_general(ones, x, ((dims, dims), ((), ())),
                            preferred_element_type=jnp.float32)
    gram = jax.lax.dot_general(x, x, ((dims, dims), ((), ())),
                               preferred_element_type=jnp.float32)
    return s, jnp.diagonal(gram)


def _mxu_bwd_stats(gy: Array, x: Array, mean: Array, inv: Array
                   ) -> Tuple[Array, Array]:
    """(sum g, sum g*xhat) via contractions: sum g*xhat folds to
    inv * (diag(g^T x) - mean * sum g), so no xhat tensor is formed."""
    nd = gy.ndim - 1
    dims = tuple(range(nd))
    ones = jnp.ones(gy.shape[:nd], gy.dtype)
    s1 = jax.lax.dot_general(ones, gy, ((dims, dims), ((), ())),
                             preferred_element_type=jnp.float32)
    sgx = jnp.diagonal(
        jax.lax.dot_general(gy, x, ((dims, dims), ((), ())),
                            preferred_element_type=jnp.float32))
    return s1, (sgx - mean * s1) * inv


def _stats(x2d: Array) -> Tuple[Array, Array]:
    if _use_pallas() and _foldable(x2d):
        return pallas_batch_stats(x2d)
    x32 = x2d.astype(jnp.float32)
    if _can_lane_fold(x2d):
        return _folded_sum(x32), _folded_sum(x32 * x32)
    return jnp.sum(x32, 0), jnp.sum(x32 * x32, 0)


def _bwd_stats(g2d, x2d, mean, inv):
    if _use_pallas() and _foldable(g2d):
        return pallas_bn_bwd_stats(g2d, x2d, mean, inv)
    g32 = g2d.astype(jnp.float32)
    xhat = (x2d.astype(jnp.float32) - mean) * inv
    if _can_lane_fold(g2d):
        return _folded_sum(g32), _folded_sum(g32 * xhat)
    return jnp.sum(g32, 0), jnp.sum(g32 * xhat, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x: Array, scale: Array, bias: Array, eps: float,
                     dtype: Any):
    """Train-mode BN over all-but-last axes. Returns (y, mean, var)."""
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, dtype)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, dtype):
    shape = x.shape
    c = shape[-1]
    sh, sw = _stats_stride()
    if (sh > 1 or sw > 1) and x.ndim >= 4:
        xs = _spatial_subsample(x, sh, sw)
    else:
        xs = x
    m = xs.size // c
    if _stats_mxu() and xs.ndim >= 2:
        s, s2 = _mxu_moments(xs)
    elif _stats_phys() and xs.ndim == 5:
        s, s2 = _phys_stats(xs)
    else:
        s, s2 = _stats(xs.reshape(m, c))
    mean = s / m
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale.astype(jnp.float32)).astype(dtype)
    b = (bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32)
         ).astype(dtype)
    y = x.astype(dtype) * a + b
    return y, jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), inv


def _bn_fwd(x, scale, bias, eps, dtype):
    y, mean, var, inv = _bn_fwd_impl(x, scale, bias, eps, dtype)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(eps, dtype, res, cts):
    gy = cts[0]  # cotangents for mean/var (running stats) are not propagated
    x, scale, mean, inv = res
    shape = x.shape
    c = shape[-1]
    n = x.size // c
    if _stats_mxu() and x.ndim >= 2:
        s1, s2 = _mxu_bwd_stats(gy.reshape(shape), x, mean, inv)
    elif _stats_phys() and x.ndim == 5:
        s1, s2 = _phys_bwd_stats(gy.reshape(shape), x, mean, inv)
    else:
        s1, s2 = _bwd_stats(gy.reshape(n, c), x.reshape(n, c), mean, inv)
    dscale = s2
    dbias = s1
    scale32 = scale.astype(jnp.float32)
    k = (inv * scale32).astype(dtype)
    sh, sw = _stats_stride()
    if (sh > 1 or sw > 1) and x.ndim >= 4:
        # subsampled statistics: the mean/var gradient flows only through
        # sampled positions, each weighted by 1/m (m = sample count):
        #   dx_j = k*gy_j - 1(j in S) * (k*S1 + inv^2*scale*(x_j-mu)*S2) / m
        # (exact VJP of the subsampled-stats objective; dscale/dbias are
        # full exact sums as in standard BN)
        m = _spatial_subsample(x, sh, sw).size // c
        h_idx = jax.lax.broadcasted_iota(jnp.int32, shape, x.ndim - 3)
        w_idx = jax.lax.broadcasted_iota(jnp.int32, shape, x.ndim - 2)
        mask = ((h_idx % sh == 0) & (w_idx % sw == 0)).astype(dtype)
    else:
        m = n
        mask = None
    c1 = (inv * scale32 * s1 / m).astype(dtype)
    c2 = (inv * inv * scale32 * s2 / m).astype(dtype)
    xc = x.astype(dtype) - mean.astype(dtype)
    corr = c1 + xc.reshape(shape) * c2
    if mask is not None:
        corr = corr * mask
    dx = gy.astype(dtype).reshape(shape) * k - corr
    return dx, dscale.astype(jnp.float32), dbias.astype(jnp.float32)


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)


class FastBatchNorm(nn.Module):
    """Drop-in nn.BatchNorm replacement with Pallas statistics on TPU.

    Same parameter (scale/bias) and batch_stats (mean/var) layout as
    nn.BatchNorm; eval mode is the plain affine transform.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (inv * scale).astype(self.dtype)
            b = (bias - ra_mean.value * inv * scale).astype(self.dtype)
            return x.astype(self.dtype) * a + b
        y, mean, var = batch_norm_train(x, scale, bias, self.epsilon,
                                        self.dtype)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        return y

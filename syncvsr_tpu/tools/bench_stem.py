"""Micro-bench the stem conv's forward and backward lowerings.

The s2d stem (ops/stem.py) made the forward ~2x faster, but the profile
(tools/profile_step.py) shows its autodiff backward-filter costing 6.1 ms
(5% MXU: conv-backward-filter with 4 input channels). This tool times
forward, grad-x and grad-w for both formulations to decide whether a
mix-and-match custom VJP pays.

Usage: python -m syncvsr_tpu.tools.bench_stem
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.ops.stem import stem_conv3d_reference, stem_conv3d_s2d


def _time(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(96, 29, 96, 96, 1), jnp.bfloat16)
    w = jnp.asarray(rng.randn(5, 7, 7, 1, 64) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(96, 29, 48, 48, 64), jnp.bfloat16)

    results = {}
    for name, f in (("s2d", stem_conv3d_s2d), ("direct", stem_conv3d_reference)):
        fwd = jax.jit(lambda x, w, f=f: f(x, w, jnp.bfloat16))
        dw = jax.jit(lambda x, w, g, f=f: jax.vjp(
            lambda w: f(x, w, jnp.bfloat16), w)[1](g)[0])
        dx = jax.jit(lambda x, w, g, f=f: jax.vjp(
            lambda x: f(x, w, jnp.bfloat16), x)[1](g)[0])
        results[name] = {
            "fwd_ms": round(_time(fwd, x, w) * 1e3, 2),
            "grad_w_ms": round(_time(dw, x, w, g) * 1e3, 2),
            "grad_x_ms": round(_time(dx, x, w, g) * 1e3, 2),
        }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

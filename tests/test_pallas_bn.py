"""FastBatchNorm: numeric parity with nn.BatchNorm (values, running stats,
gradients) and Pallas stats kernels vs jnp in interpret mode."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncvsr_tpu.ops.pallas_bn import (
    FastBatchNorm,
    batch_norm_train,
    pallas_batch_stats,
    pallas_bn_bwd_stats,
)


def test_pallas_stats_kernel_interpret():
    rng = np.random.RandomState(0)
    for n, c in ((512, 64), (300, 128), (257, 256)):
        x = jnp.asarray(rng.randn(n, c), jnp.float32)
        if (128 // c if c < 128 else 1) and n % max(128 // c, 1) == 0:
            s, s2 = pallas_batch_stats(x, interpret=True)
            np.testing.assert_allclose(np.asarray(s), np.asarray(x).sum(0),
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.asarray(s2),
                                       (np.asarray(x) ** 2).sum(0),
                                       rtol=1e-4, atol=1e-3)


def test_pallas_bwd_stats_kernel_interpret():
    rng = np.random.RandomState(1)
    n, c = 512, 64
    x = jnp.asarray(rng.randn(n, c), jnp.float32)
    g = jnp.asarray(rng.randn(n, c), jnp.float32)
    mean = jnp.asarray(rng.randn(c), jnp.float32)
    inv = jnp.asarray(np.abs(rng.randn(c)) + 0.5, jnp.float32)
    s1, s2 = pallas_bn_bwd_stats(g, x, mean, inv, interpret=True)
    xhat = (np.asarray(x) - np.asarray(mean)) * np.asarray(inv)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(g).sum(0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (np.asarray(g) * xhat).sum(0),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("shape", [(8, 6, 6, 64), (16, 32)])
def test_fast_bn_matches_flax(shape):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    c = shape[-1]
    scale = jnp.asarray(rng.randn(c), jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)}}

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    fast = FastBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)

    y_ref, mut_ref = ref.apply(variables, x, mutable=["batch_stats"])
    y_fast, mut_fast = fast.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_fast["batch_stats"][k]),
            np.asarray(mut_ref["batch_stats"][k]), rtol=2e-5, atol=2e-5)

    # gradients: d loss / d (x, scale, bias)
    def loss(mod, v, x):
        y, _ = mod.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(variables, x)
    g_fast = jax.grad(lambda v, x: loss(fast, v, x), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-4)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_fast[0]["params"][k]),
            np.asarray(g_ref[0]["params"][k]), rtol=2e-4, atol=2e-4)


def test_fast_bn_eval_mode():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 5, 64), jnp.float32)
    variables = {"params": {"scale": jnp.full((64,), 1.5),
                            "bias": jnp.full((64,), 0.25)},
                 "batch_stats": {"mean": jnp.asarray(rng.randn(64), jnp.float32),
                                 "var": jnp.asarray(np.abs(rng.randn(64)) + 0.5,
                                                    jnp.float32)}}
    ref = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    fast = FastBatchNorm(use_running_average=True, epsilon=1e-5)
    np.testing.assert_allclose(np.asarray(fast.apply(variables, x)),
                               np.asarray(ref.apply(variables, x)),
                               rtol=2e-5, atol=2e-5)


def test_batch_norm_train_direct():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(64, 32), jnp.float32)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    y, mean, var = batch_norm_train(x, scale, bias, 1e-5, jnp.float32)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(0), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x).mean(0),
                               atol=1e-5)


def test_subsampled_bn_stats_exact_vjp(monkeypatch):
    """SYNCVSR_BN_STATS_STRIDE=s: batch_norm_train must equal the autodiff of
    an explicit subsampled-stats BN (value AND gradients) — the custom VJP's
    masked correction terms are the exact derivative, not an approximation."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.ops.pallas_bn import batch_norm_train

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 6, 8, 5).astype(np.float32))
    scale = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    eps, s = 1e-5, 2

    def ref_loss(x, scale, bias):
        xs = x[..., ::s, ::s, :]
        m = xs.size // xs.shape[-1]
        mean = xs.reshape(m, -1).mean(0)
        var = (xs.reshape(m, -1) ** 2).mean(0) - mean ** 2
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv * scale + bias
        return jnp.sum(jnp.sin(y)), y

    def fast_loss(x, scale, bias):
        y, _, _ = batch_norm_train(x, scale, bias, eps, jnp.float32)
        return jnp.sum(jnp.sin(y)), y

    monkeypatch.setenv("SYNCVSR_BN_STATS_STRIDE", str(s))
    (l_f, y_f), g_f = jax.value_and_grad(fast_loss, argnums=(0, 1, 2),
                                         has_aux=True)(x, scale, bias)
    (l_r, y_r), g_r = jax.value_and_grad(ref_loss, argnums=(0, 1, 2),
                                         has_aux=True)(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # stride 1 (default) stays the standard full-batch BN
    monkeypatch.delenv("SYNCVSR_BN_STATS_STRIDE")
    y1, mean1, var1 = batch_norm_train(x, scale, bias, eps, jnp.float32)
    full_mean = x.reshape(-1, 5).mean(0)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(full_mean),
                               rtol=1e-5, atol=1e-6)


def test_lane_folded_stats_match(monkeypatch):
    """SYNCVSR_BN_FOLD64: lane-folded narrow-channel statistics are
    numerically identical to the straight reduction (fwd stats AND the
    analytic backward)."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.ops.pallas_bn import batch_norm_train

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 6, 8, 64).astype(np.float32))
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    def loss(x, scale, bias):
        y, mean, var = batch_norm_train(x, scale, bias, 1e-5, jnp.float32)
        return jnp.sum(jnp.sin(y)), (y, mean, var)

    (l0, aux0), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                        has_aux=True)(x, scale, bias)
    monkeypatch.setenv("SYNCVSR_BN_FOLD64", "1")
    (l1, aux1), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                        has_aux=True)(x, scale, bias)
    for a, b in zip(aux0, aux1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_mxu_stats_match(monkeypatch):
    """SYNCVSR_BN_STATS_MXU: dot_general-contraction statistics (ones . x,
    diag(x^T x)) are numerically equivalent to the straight reductions, fwd
    stats AND the analytic backward."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.ops.pallas_bn import batch_norm_train

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(3, 4, 6, 5, 64).astype(np.float32))
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    def loss(x, scale, bias):
        y, mean, var = batch_norm_train(x, scale, bias, 1e-5, jnp.float32)
        return jnp.sum(jnp.sin(y)), (y, mean, var)

    (l0, aux0), g0 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                        has_aux=True)(x, scale, bias)
    monkeypatch.setenv("SYNCVSR_BN_STATS_MXU", "1")
    (l1, aux1), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                        has_aux=True)(x, scale, bias)
    for a, b in zip(aux0, aux1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_subsampled_bn_stats_h_only(monkeypatch):
    """The "sh" form strides H only; still the exact VJP."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.ops.pallas_bn import batch_norm_train

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 3, 6, 8, 5).astype(np.float32))
    scale = jnp.asarray(rng.rand(5).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    eps = 1e-5

    def ref_loss(x, scale, bias):
        xs = x[..., ::2, :, :]
        m = xs.size // xs.shape[-1]
        mean = xs.reshape(m, -1).mean(0)
        var = (xs.reshape(m, -1) ** 2).mean(0) - mean ** 2
        inv = jax.lax.rsqrt(var + eps)
        return jnp.sum(jnp.sin((x - mean) * inv * scale + bias))

    def fast_loss(x, scale, bias):
        y, _, _ = batch_norm_train(x, scale, bias, eps, jnp.float32)
        return jnp.sum(jnp.sin(y))

    monkeypatch.setenv("SYNCVSR_BN_STATS_STRIDE", "2h")
    lf, gf = jax.value_and_grad(fast_loss, argnums=(0, 1, 2))(x, scale, bias)
    lr, gr = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(x, scale, bias)
    assert lf == pytest.approx(lr, rel=1e-5)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

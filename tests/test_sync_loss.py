"""Sync-loss numerics: fused/chunked op must match the unfused reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncvsr_tpu.ops.sync_loss import (
    sync_cross_entropy,
    sync_cross_entropy_reference,
)

A, G, V = 4, 2, 32


def _setup(b=2, t=8, d=16, seed=0):
    rng = np.random.RandomState(seed)
    features = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    kernel = jnp.asarray(rng.randn(d, A * G * V) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(A * G * V) * 0.01, jnp.float32)
    tokens = jnp.asarray(rng.randint(0, V, (b, t * A + 3, G)), jnp.int32)
    return features, kernel, bias, tokens


def test_fused_matches_reference():
    features, kernel, bias, tokens = _setup()
    ref = sync_cross_entropy_reference(features, kernel, bias, tokens, A, G, V)
    fused = sync_cross_entropy(features, kernel, bias, tokens, A, G, V)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5)


def test_chunked_matches_reference():
    features, kernel, bias, tokens = _setup(t=10)
    ref = sync_cross_entropy_reference(features, kernel, bias, tokens, A, G, V)
    chunked = sync_cross_entropy(features, kernel, bias, tokens, A, G, V, chunk=3)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref), rtol=1e-5)


def test_chunked_gradients_match():
    features, kernel, bias, tokens = _setup(t=10)

    def loss_ref(f, k, b):
        return sync_cross_entropy_reference(f, k, b, tokens, A, G, V)

    def loss_chunked(f, k, b):
        return sync_cross_entropy(f, k, b, tokens, A, G, V, chunk=4)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(features, kernel, bias)
    g_new = jax.grad(loss_chunked, argnums=(0, 1, 2))(features, kernel, bias)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_ignore_tokens():
    features, kernel, bias, tokens = _setup()
    masked = tokens.at[:, : A].set(-1)
    loss = sync_cross_entropy(features, kernel, bias, masked, A, G, V)
    assert np.isfinite(float(loss))
    # masking some slots changes the mean
    full = sync_cross_entropy(features, kernel, bias, tokens, A, G, V)
    assert float(loss) != pytest.approx(float(full))

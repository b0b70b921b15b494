"""Pallas fused sync-CE (interpret mode on CPU) vs the unfused reference."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.ops.pallas_sync import pallas_sync_cross_entropy
from syncvsr_tpu.ops.sync_loss import sync_cross_entropy_reference

A, G, V = 4, 2, 32


def _setup(b=2, t=8, d=16, seed=0):
    rng = np.random.RandomState(seed)
    features = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    kernel = jnp.asarray(rng.randn(d, A * G * V) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(A * G * V) * 0.01, jnp.float32)
    tokens = jnp.asarray(rng.randint(0, V, (b, t * A + 3, G)), jnp.int32)
    return features, kernel, bias, tokens


def test_pallas_forward_matches_reference():
    features, kernel, bias, tokens = _setup()
    ref = sync_cross_entropy_reference(features, kernel, bias, tokens, A, G, V)
    got = pallas_sync_cross_entropy(features, kernel, bias, tokens, A, G, V,
                                    chunk=4, interpret=True)
    # forward runs in bf16 on the MXU path; interpret mode mirrors that
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)


def test_pallas_ignore_tokens():
    features, kernel, bias, tokens = _setup()
    masked = tokens.at[:, :A].set(-1)
    full = pallas_sync_cross_entropy(features, kernel, bias, tokens, A, G, V,
                                     chunk=4, interpret=True)
    part = pallas_sync_cross_entropy(features, kernel, bias, masked, A, G, V,
                                     chunk=4, interpret=True)
    assert np.isfinite(float(part)) and float(part) != float(full)


def test_pallas_gradients_match_reference():
    features, kernel, bias, tokens = _setup(t=6)

    def loss_ref(f, k, b):
        return sync_cross_entropy_reference(f, k, b, tokens, A, G, V)

    def loss_pallas(f, k, b):
        return pallas_sync_cross_entropy(f, k, b, tokens, A, G, V, 4, True)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(features, kernel, bias)
    g_new = jax.grad(loss_pallas, argnums=(0, 1, 2))(features, kernel, bias)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_pallas_slot_split_matches_reference():
    """Large-d configs route to the slot-split kernel (grid rows x slots,
    per-slot weight blocks) — same numerics as the monolithic kernel and the
    unfused reference. d=768/V=320 are the lrs3 dims that cross the
    _MONO_W_BYTES threshold."""
    rng = np.random.RandomState(1)
    a, g, v, d = 4, 2, 320, 768
    b, t = 1, 3
    features = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    kernel = jnp.asarray(rng.randn(d, a * g * v) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.randn(a * g * v) * 0.01, jnp.float32)
    tokens = jnp.asarray(rng.randint(0, v, (b, t * a + 2, g)), jnp.int32)
    tokens = tokens.at[:, 0].set(-1)  # some ignores

    from syncvsr_tpu.ops import pallas_sync as ps

    assert (768 * a * g * ps._round_up(v, 128) * 2 > ps._MONO_W_BYTES)
    ref = sync_cross_entropy_reference(features, kernel, bias, tokens, a, g, v)
    got = pallas_sync_cross_entropy(features, kernel, bias, tokens, a, g, v,
                                    chunk=4, interpret=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)

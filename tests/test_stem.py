"""Space-to-depth stem conv must equal the direct conv3d bit-for-bit in f32."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.ops.stem import stem_conv3d_reference, stem_conv3d_s2d


def test_s2d_equivalence():
    rng = np.random.RandomState(0)
    for h, w in [(16, 16), (12, 20), (96, 112)]:
        x = jnp.asarray(rng.randn(2, 3, h, w, 1), jnp.float32)
        k = jnp.asarray(rng.randn(5, 7, 7, 1, 8) * 0.1, jnp.float32)
        ref = stem_conv3d_reference(x, k, jnp.float32)
        got = stem_conv3d_s2d(x, k, jnp.float32)
        assert got.shape == ref.shape == (2, 3, h // 2, w // 2, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_s2d_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 8, 8, 1), jnp.float32)
    k = jnp.asarray(rng.randn(5, 7, 7, 1, 4) * 0.1, jnp.float32)

    g_ref = jax.grad(lambda k: stem_conv3d_reference(x, k, jnp.float32).sum())(k)
    g_s2d = jax.grad(lambda k: stem_conv3d_s2d(x, k, jnp.float32).sum())(k)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)

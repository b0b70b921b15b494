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


def test_frontend_fold_matches_5d_path():
    """Long-clip [B*T] folding (frontend.py fold_threshold) is numerically
    identical to the 5D trunk path — fwd, train mode, and BN batch stats."""
    from syncvsr_tpu.models.frontend import Conv3DResNetFrontend

    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 16, 16, 1), jnp.float32)
    m5 = Conv3DResNetFrontend(fold_threshold=10 ** 9, dtype=jnp.float32)
    mf = Conv3DResNetFrontend(fold_threshold=1, dtype=jnp.float32)
    v = m5.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m5.apply(v, x)),
                               np.asarray(mf.apply(v, x)), rtol=1e-4, atol=1e-4)
    y5, s5 = m5.apply(v, x, train=True, mutable=["batch_stats"])
    yf, sf = mf.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y5), np.asarray(yf), rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s5),
                    jax.tree_util.tree_leaves(sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_s2d_custom_vjp_grads_match_reference():
    """The custom VJP (im2col weight grad + transposed-conv input grad)
    matches autodiff through the direct conv on both operands."""
    rng = np.random.RandomState(2)
    for h, w in [(8, 8), (10, 14)]:
        x = jnp.asarray(rng.randn(2, 4, h, w, 1), jnp.float32)
        k = jnp.asarray(rng.randn(5, 7, 7, 1, 8) * 0.1, jnp.float32)
        gx_ref, gk_ref = jax.grad(
            lambda x, k: (stem_conv3d_reference(x, k, jnp.float32) ** 2).sum(),
            argnums=(0, 1))(x, k)
        gx, gk = jax.grad(
            lambda x, k: (stem_conv3d_s2d(x, k, jnp.float32) ** 2).sum(),
            argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-3, atol=1e-3)

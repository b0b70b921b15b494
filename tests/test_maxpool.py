"""Recompute-backward max pool: exact parity with nn.max_pool away from ties,
documented tie-splitting behavior, and the frontend env wiring."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncvsr_tpu.ops.maxpool import max_pool_s2


def _ref(x):
    if x.ndim == 5:
        return nn.max_pool(x, (1, 3, 3), (1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))
    return nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("shape", [(2, 3, 48, 48, 5), (4, 24, 24, 7),
                                   (2, 2, 47, 47, 3)])
def test_maxpool_matches_select_and_scatter(shape):
    rng = np.random.RandomState(0)
    # distinct values: no ties, so the recomputed routing must equal XLA's
    # select-and-scatter gradient exactly
    x = jnp.asarray(
        rng.permutation(np.arange(np.prod(shape), dtype=np.float32))
        .reshape(shape)) * 1e-3
    np.testing.assert_array_equal(np.asarray(_ref(x)),
                                  np.asarray(max_pool_s2(x)))
    g = jnp.asarray(rng.randn(*_ref(x).shape), jnp.float32)
    g0 = jax.grad(lambda v: jnp.sum(_ref(v) * g))(x)
    g1 = jax.grad(lambda v: jnp.sum(max_pool_s2(v) * g))(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


def test_maxpool_tie_splitting():
    # constant window: select-and-scatter routes each window's gradient to
    # one position; the recomputed backward splits it across every maximum.
    # Total gradient mass per window is conserved either way.
    x = jnp.ones((1, 8, 8, 1), jnp.float32)
    g0 = jax.grad(lambda v: jnp.sum(_ref(v)))(x)
    g1 = jax.grad(lambda v: jnp.sum(max_pool_s2(v)))(x)
    assert float(jnp.sum(g0)) == float(jnp.sum(_ref(x)).item())  # 16 windows
    # recompute assigns every covering window to every (tying) position
    assert float(jnp.max(g1)) >= float(jnp.max(g0))
    assert g1.shape == g0.shape


def test_frontend_env_wiring(monkeypatch):
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.data.synthetic import word_batch

    cfg = lrw_video_config().override(**{
        "data.batch_size": 2, "data.crop_size": 32,
        "model.encoder.layers": 1, "model.encoder.dim": 64,
        "model.encoder.heads": 2})
    model = build_model(cfg)
    batch = word_batch(cfg, 2)
    batch["inputs"] = np.random.RandomState(0).rand(
        2, 29, 32, 32, 1).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()}, det=True)

    def loss():
        out = model.apply(variables,
                          **{k: jnp.asarray(v) for k, v in batch.items()},
                          det=True)
        return float(out["loss"])

    base = loss()
    monkeypatch.setenv("SYNCVSR_MAXPOOL_RECOMPUTE", "1")
    jax.clear_caches()
    assert loss() == pytest.approx(base, rel=1e-5)

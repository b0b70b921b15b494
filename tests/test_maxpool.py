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


def test_maxpool_tie_semantics():
    # constant input: every position ties in every window it belongs to.
    # select-and-scatter routes each window's gradient to ONE position
    # (mass conserved: sum == #windows); the recomputed backward routes the
    # FULL window gradient to EVERY tying position, so dx[p] == the number
    # of 3x3/s2 windows covering p (mass amplified, NOT conserved).
    h = 8
    x = jnp.ones((1, h, h, 1), jnp.float32)
    g0 = jax.grad(lambda v: jnp.sum(_ref(v)))(x)
    g1 = jax.grad(lambda v: jnp.sum(max_pool_s2(v)))(x)
    n_windows = (h // 2) ** 2
    assert float(jnp.sum(g0)) == n_windows
    # expected recompute routing: count of window centers (2i, 2j) with
    # chebyshev distance <= 1 from each position
    centers = 2 * np.arange(h // 2)
    count1d = np.array([(np.abs(centers - i) <= 1).sum() for i in range(h)])
    expected = np.outer(count1d, count1d).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(g1)[0, :, :, 0], expected)


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

    def loss_fn(v):
        out = model.apply(v, **{k: jnp.asarray(x) for k, x in batch.items()},
                          det=True)
        return out["loss"]

    def grad_ops():
        jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(variables)
        return str(jaxpr)

    base = float(loss_fn(variables))
    assert "select_and_scatter" in grad_ops()  # default: XLA maxpool bwd
    monkeypatch.setenv("SYNCVSR_MAXPOOL_RECOMPUTE", "1")
    jax.clear_caches()
    # the lever must actually reroute the backward, and keep the forward
    assert "select_and_scatter" not in grad_ops()
    assert float(loss_fn(variables)) == pytest.approx(base, rel=1e-5)

"""On-device augmentation ops: shapes, determinism per-key, identity cases."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.config import lrw_video_config
from syncvsr_tpu.ops.image import (
    build_eval_transform,
    build_word_aug,
    center_crop_resize,
    normalize,
    random_hflip,
    random_resized_crop,
    time_mask,
    to_float,
)


def _videos(b=2, t=3, h=12, w=14, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 256, (b, t, h, w, 1)), jnp.uint8)


def test_to_float_normalize():
    v = to_float(_videos())
    assert v.dtype == jnp.float32 and float(v.max()) <= 1.0
    n = normalize(v, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(n), (np.asarray(v) - 0.5) / 0.5, rtol=1e-6)


def test_rrc_shape_and_full_scale_identity():
    v = to_float(_videos(h=16, w=16))
    out = random_resized_crop(jax.random.PRNGKey(0), v, 8, scale=(0.5, 1.0))
    assert out.shape == (2, 3, 8, 8, 1)
    # scale=1, ratio=1 crop of the full image == plain bilinear resize
    full = random_resized_crop(jax.random.PRNGKey(1), v, 16,
                               scale=(1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(full), np.asarray(v), atol=1e-5)


def test_hflip():
    v = to_float(_videos())
    flipped = random_hflip(jax.random.PRNGKey(0), v, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(v)[:, :, :, ::-1])
    same = random_hflip(jax.random.PRNGKey(0), v, p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(v))


def test_time_mask_fills_with_mean():
    v = to_float(_videos(t=10))
    out = time_mask(jax.random.PRNGKey(3), v, max_span=5, n_masks=1)
    assert out.shape == v.shape
    # masked frames equal the clip mean
    m = np.asarray(jnp.mean(v, axis=(1, 2, 3, 4)))
    changed = ~np.all(np.isclose(np.asarray(out), np.asarray(v)), axis=(2, 3, 4))
    for b in range(v.shape[0]):
        for t in range(v.shape[1]):
            if changed[b, t]:
                np.testing.assert_allclose(np.asarray(out)[b, t], m[b], rtol=1e-5)


def test_center_crop():
    v = to_float(_videos(h=16, w=16))
    out = center_crop_resize(v, 8, resize_first=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v)[:, :, 4:12, 4:12])


def test_fused_aug_identity_and_flip():
    """fused_train_aug with a full deterministic crop reproduces the
    normalized source; hflip_prob=1 mirrors it exactly."""
    from syncvsr_tpu.ops.image import fused_train_aug

    rng = jax.random.PRNGKey(3)
    v = _videos(h=8, w=8)
    base = fused_train_aug(rng, v, 8, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                           hflip_prob=0.0, time_mask_span=0, time_mask_n=0,
                           dtype=jnp.float32)
    expect = (np.asarray(v).astype(np.float32) / 255.0 - 0.421) / 0.165
    np.testing.assert_allclose(np.asarray(base), expect, rtol=1e-4, atol=1e-4)

    flipped = fused_train_aug(rng, v, 8, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                              hflip_prob=1.0, time_mask_span=0, time_mask_n=0,
                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(flipped),
                               np.asarray(base)[:, :, :, ::-1], rtol=1e-4,
                               atol=1e-4)


def test_fused_aug_time_mask_and_shapes():
    from syncvsr_tpu.ops.image import fused_train_aug

    v = _videos(h=12, w=14)
    out = fused_train_aug(jax.random.PRNGKey(0), v, 8, time_mask_span=2,
                          time_mask_n=1)
    assert out.shape == (2, 3, 8, 8, 1)
    assert out.dtype == jnp.bfloat16
    # masked frames (if any) are constant = normalized clip mean
    outs = [np.asarray(fused_train_aug(jax.random.PRNGKey(s), v, 8,
                                       scale=(1.0, 1.0), ratio=(1.0, 1.0),
                                       hflip_prob=0.0, time_mask_span=3,
                                       time_mask_n=1, dtype=jnp.float32))
            for s in range(8)]
    found = False
    for o in outs:
        for b in range(o.shape[0]):
            for t in range(o.shape[1]):
                frame = o[b, t]
                if np.allclose(frame, frame.flat[0], atol=1e-5) \
                        and not np.allclose(o[b], o[b].flat[0], atol=1e-5):
                    found = True
    assert found, "no time-masked frame observed across seeds"


def test_word_aug_pipeline():
    cfg = lrw_video_config().override(**{"data.crop_size": 8})
    aug = build_word_aug(cfg.data)
    batch = {"inputs": _videos(h=12, w=14), "labels": jnp.zeros((2,), jnp.int32)}
    out = jax.jit(aug)(jax.random.PRNGKey(0), batch)
    assert out["inputs"].shape == (2, 3, 8, 8, 1)
    assert out["inputs"].dtype == jnp.bfloat16  # compute dtype for the stem
    # landmark batches pass through untouched
    lm = {"inputs": jnp.zeros((2, 3, 10)), "labels": jnp.zeros((2,), jnp.int32)}
    out2 = aug(jax.random.PRNGKey(0), lm)
    assert out2["inputs"].shape == (2, 3, 10)

    ev = build_eval_transform(cfg.data)
    out3 = ev(batch)
    assert out3["inputs"].shape == (2, 3, 8, 8, 1)

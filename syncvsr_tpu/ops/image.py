"""On-device video augmentation — the reference's torchvision CPU pipeline
(LRW/video/src/data.py:150-167: x/255 -> RandomHorizontalFlip(0.5) ->
RandomResizedCrop(96, scale 0.6-1.0) -> Grayscale -> TimeMask -> Normalize;
LRS train recipe transforms.py:89-109 with RandomResizedCrop scale 0.7-1.0 and
AdaptiveTimeMask) re-built as jit-compiled batched jnp ops running inside the
train step on uint8 HBM-resident batches.

RandomResizedCrop is an affine bilinear resample (per-sample scale/offset grid
+ gather) so every sample keeps a static [T, S, S, 1] shape on the MXU-friendly
path; no dynamic shapes reach XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def to_float(videos: Array) -> Array:
    """uint8 [0,255] -> float [0,1]."""
    if videos.dtype == jnp.uint8:
        return videos.astype(jnp.float32) / 255.0
    return videos


def normalize(videos: Array, mean: float = 0.421, std: float = 0.165) -> Array:
    return (videos - mean) / std


def _bilinear_sample(frames: Array, ys: Array, xs: Array) -> Array:
    """frames [T, H, W, C]; ys [Ho], xs [Wo] fractional coords -> [T, Ho, Wo, C]."""
    h, w = frames.shape[1], frames.shape[2]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(ys.dtype))[None, :, None, None]
    wx = (xs - x0.astype(xs.dtype))[None, None, :, None]

    def g(yi, xi):
        return frames[:, yi][:, :, xi]

    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _interp_matrix(coords: Array, size: int) -> Array:
    """[O] fractional sample coords -> [O, size] linear-interpolation matrix
    (each row two taps, border-replicating like _bilinear_sample's clip)."""
    c = jnp.clip(coords, 0.0, size - 1.0)
    idx = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - idx[None]))


def _bilinear_matmul(frames: Array, ys: Array, xs: Array) -> Array:
    """Bilinear resample expressed as two small interpolation matmuls.

    Equivalent to _bilinear_sample but with no gathers: on TPU the per-pixel
    gather lowering forces full-tensor layout copies (~650 MB/step measured
    on the LRW workload), while [O,H]x[...H...] contractions ride the MXU and
    read the uint8 source directly."""
    wy = _interp_matrix(ys, frames.shape[1])
    wx = _interp_matrix(xs, frames.shape[2])
    f = frames.astype(jnp.float32)
    out = jnp.einsum("oh,thwc->towc", wy, f)
    return jnp.einsum("pw,towc->topc", wx, out)


def random_resized_crop(rng: Array, videos: Array, out_size: int,
                        scale: Tuple[float, float] = (0.6, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)) -> Array:
    """Per-sample random crop (area scale + aspect jitter) resized to
    out_size x out_size with bilinear sampling; crop is shared across a clip's
    frames (temporal consistency, like torchvision applied per-clip)."""
    b, t, h, w, c = videos.shape
    r_area, r_ratio, r_y, r_x = jax.random.split(rng, 4)
    area = jax.random.uniform(r_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(r_ratio, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1, h)
    y0 = jax.random.uniform(r_y, (b,)) * (h - ch)
    x0 = jax.random.uniform(r_x, (b,)) * (w - cw)

    grid = (jnp.arange(out_size) + 0.5) / out_size  # sample centers in [0,1]

    def crop_one(frames, ch_i, cw_i, y0_i, x0_i):
        ys = y0_i + grid * ch_i - 0.5
        xs = x0_i + grid * cw_i - 0.5
        return _bilinear_sample(frames, ys, xs)

    return jax.vmap(crop_one)(videos, ch, cw, y0, x0)


def center_crop_resize(videos: Array, out_size: int, resize_first: bool = True,
                       resize_to: int = 0) -> Array:
    """Eval pipeline: Resize(96) for LRS3 or CenterCrop(96) (av_dataset.py:30-41,
    data.py:169-174)."""
    b, t, h, w, c = videos.shape
    if resize_first and (h, w) != (out_size, out_size):
        grid = (jnp.arange(out_size) + 0.5) / out_size
        ys = grid * h - 0.5
        xs = grid * w - 0.5
        return jax.vmap(lambda f: _bilinear_sample(f, ys, xs))(videos)
    y0 = (h - out_size) // 2
    x0 = (w - out_size) // 2
    return videos[:, :, y0:y0 + out_size, x0:x0 + out_size]


def random_hflip(rng: Array, videos: Array, p: float = 0.5) -> Array:
    flip = jax.random.bernoulli(rng, p, (videos.shape[0],))
    return jnp.where(flip[:, None, None, None, None],
                     jnp.flip(videos, axis=3), videos)


def time_mask(rng: Array, videos: Array, max_span: int = 15, n_masks: int = 1,
              mean_fill: bool = True,
              lengths: Optional[Array] = None) -> Array:
    """Mask n random temporal spans per clip with the clip mean (reference
    TimeMask augment.py:120-141; AdaptiveTimeMask transforms.py:44-64 when
    ``lengths`` given — span budget scales with true length)."""
    b, t = videos.shape[0], videos.shape[1]
    fill = (jnp.mean(videos, axis=(1, 2, 3, 4), keepdims=True)
            if mean_fill else jnp.zeros((b, 1, 1, 1, 1), videos.dtype))
    frames = jnp.arange(t)[None, :]
    out = videos
    for i in range(n_masks):
        r_span, r_start, rng = jax.random.split(rng, 3)
        span = jax.random.randint(r_span, (b,), 0, max_span + 1)
        limit = (lengths if lengths is not None
                 else jnp.full((b,), t)).astype(jnp.float32)
        start = (jax.random.uniform(r_start, (b,))
                 * jnp.maximum(limit - span, 1)).astype(jnp.int32)
        hit = (frames >= start[:, None]) & (frames < (start + span)[:, None])
        out = jnp.where(hit[:, :, None, None, None], fill.astype(out.dtype), out)
    return out


def fused_train_aug(rng: Array, videos: Array, out_size: int,
                    scale: Tuple[float, float] = (0.6, 1.0),
                    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                    hflip_prob: float = 0.5,
                    time_mask_span: int = 15, time_mask_n: int = 1,
                    mean: float = 0.421, std: float = 0.165,
                    lengths: Optional[Array] = None,
                    dtype=jnp.bfloat16) -> Array:
    """hflip + RandomResizedCrop + TimeMask + normalize in ONE gather pass.

    The composition of per-op passes (to_float, where-flip, crop gather,
    mask where, normalize) costs ~5 full-size HBM round trips; here the flip
    is folded into the crop's x coordinates (a reversed ramp), the bilinear
    gather reads the uint8 source directly in compute dtype, and the time
    mask + normalization fuse into the gather output. Semantics match the
    sequential pipeline (flip-then-crop == crop-with-mirrored-ramp because
    RRC's offset distribution is symmetric).
    """
    b, t, h, w, c = videos.shape
    r_area, r_ratio, r_y, r_x, r_flip, r_tm = jax.random.split(rng, 6)
    area = jax.random.uniform(r_area, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(r_ratio, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1, h)
    y0 = jax.random.uniform(r_y, (b,)) * (h - ch)
    x0 = jax.random.uniform(r_x, (b,)) * (w - cw)
    flip = jax.random.bernoulli(r_flip, hflip_prob, (b,))

    grid = (jnp.arange(out_size) + 0.5) / out_size

    # time mask spans (per clip), matching time_mask()
    frames = jnp.arange(t)[None, :]
    hit = jnp.zeros((b, t), bool)
    for _ in range(time_mask_n):
        r_span, r_start, r_tm = jax.random.split(r_tm, 3)
        span = jax.random.randint(r_span, (b,), 0, time_mask_span + 1)
        limit = (lengths if lengths is not None
                 else jnp.full((b,), t)).astype(jnp.float32)
        start = (jax.random.uniform(r_start, (b,))
                 * jnp.maximum(limit - span, 1)).astype(jnp.int32)
        hit |= (frames >= start[:, None]) & (frames < (start + span)[:, None])

    inv255 = jnp.asarray(1.0 / 255.0, jnp.float32)

    def one(frames_u8, ch_i, cw_i, y0_i, x0_i, flip_i, hit_i):
        ys = y0_i + grid * ch_i - 0.5
        xs_f = x0_i + grid * cw_i - 0.5
        # mirrored ramp = flip folded into the resample coordinates
        xs = jnp.where(flip_i, x0_i + (cw_i - 1.0) - grid * cw_i + 0.5, xs_f)
        v = _bilinear_matmul(frames_u8, ys, xs) * inv255
        fill = jnp.mean(v)
        v = jnp.where(hit_i[:, None, None, None], fill, v)
        return ((v - mean) / std).astype(dtype)

    return jax.vmap(one)(videos, ch, cw, y0, x0, flip, hit)


def build_word_aug(data_cfg):
    """Composite train-time augmentation for the LRW video workload, applied
    inside the jitted train step (aug_fn contract of build_train_step)."""

    def aug(rng: Array, batch):
        videos = batch["inputs"]
        if videos.ndim != 5:
            return batch  # landmark inputs: augmentation happens in the loader
        v = fused_train_aug(
            rng, videos, data_cfg.crop_size, data_cfg.rrc_scale,
            hflip_prob=data_cfg.hflip_prob,
            time_mask_span=data_cfg.time_mask_window,
            time_mask_n=data_cfg.time_mask_stride,
            mean=data_cfg.mean, std=data_cfg.std)
        return dict(batch, inputs=v)

    return aug


def build_eval_transform(data_cfg):
    def transform(batch):
        videos = batch["inputs"]
        if videos.ndim != 5:
            return batch
        v = to_float(videos)
        v = center_crop_resize(v, data_cfg.crop_size)
        v = normalize(v, data_cfg.mean, data_cfg.std)
        return dict(batch, inputs=v)

    return transform


def build_sentence_aug(data_cfg):
    """LRS train-time pipeline inside the jitted step (transforms.py:89-109:
    x/255 -> RandomResizedCrop(96, 0.7-1.0) -> HFlip -> Grayscale(already) ->
    AdaptiveTimeMask -> Normalize). Length-aware time masking."""

    def aug(rng: Array, batch):
        videos = batch["videos"]
        if videos.ndim != 5:
            return batch  # landmark/audio inputs pass through
        v = fused_train_aug(
            rng, videos, data_cfg.crop_size, (0.7, 1.0), hflip_prob=0.5,
            time_mask_span=10 if data_cfg.adaptive_time_mask else 0,
            time_mask_n=2 if data_cfg.adaptive_time_mask else 0,
            mean=data_cfg.mean, std=data_cfg.std,
            lengths=batch.get("lengths"))
        return dict(batch, videos=v)

    return aug


def build_sentence_eval_transform(data_cfg, dataset: str = "lrs3"):
    """Eval: LRS3 resizes the full frame to 96, LRS2 center-crops
    (av_dataset.py:30-41)."""
    resize_first = dataset != "lrs2"

    def transform(batch):
        videos = batch["videos"]
        if videos.ndim != 5:
            return batch
        v = to_float(videos)
        v = center_crop_resize(v, data_cfg.crop_size, resize_first=resize_first)
        v = normalize(v, data_cfg.mean, data_cfg.std)
        return dict(batch, videos=v)

    return transform

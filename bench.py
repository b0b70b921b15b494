"""Benchmark: LRW-video training throughput (video frames/sec/chip).

Runs the flagship word-level workload — Conv3D+ResNet-18 frontend, 12L x 512d
transformer encoder, word-CE + lambda*sync objective, bf16 compute, with the
fused on-device augmentation pipeline (hflip/RRC/time-mask/normalize) inside
the jitted train step — on the available accelerator and prints one JSON line.

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
compares against the previous round's recorded value when BENCH_BASELINE.json
exists, else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_word_aug

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "axon")
    batch_size = 96 if on_accel else 4
    frames = 29

    config = lrw_video_config().override(**{
        "data.batch_size": batch_size,
        "data.crop_size": 96,
        "optim.total_steps": 270_000, "optim.warmup_steps": 15_000,
    })
    if not on_accel:  # CPU smoke: shrink so the bench itself stays runnable
        config = config.override(**{
            "model.encoder.layers": 2, "model.encoder.dim": 64,
            "model.encoder.heads": 2, "data.crop_size": 32})

    model = build_model(config)
    rng = np.random.RandomState(0)
    raw = word_batch(config, batch_size)
    # uint8 frames as produced by the data pipeline; crop source is 96h x 112w
    # (reference preprocess_pkl.py:141-146)
    h = config.data.crop_size
    w = int(h * 112 / 96)
    raw["inputs"] = rng.randint(0, 256, (batch_size, frames, h, w, 1)).astype(np.uint8)

    init_batch = dict(raw)
    init_batch["inputs"] = jnp.zeros(
        (batch_size, frames, h, h, 1), jnp.float32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init_batch.items()})

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(config.train.scoped_vmem_kib)}
            if config.train.scoped_vmem_kib and on_accel else None)
    step = build_train_step(mesh=None, donate=True,
                            aug_fn=build_word_aug(config.data),
                            compiler_options=opts)
    device_batch = jax.device_put({k: jnp.asarray(v) for k, v in raw.items()})

    # warmup (compile); sync via host transfer — block_until_ready is not
    # reliable on the axon relay platform
    for _ in range(3):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])

    # two timed repetitions; keep the faster (the relay occasionally stalls a
    # dispatch for minutes — see CLAUDE.md)
    n_steps = 10
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, device_batch)
        float(metrics["loss"])
        dt = min(dt, time.perf_counter() - t0)

    n_chips = 1  # single-chip benchmark
    fps = batch_size * frames * n_steps / dt / n_chips

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    vs = fps / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "lrw_video_train_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()

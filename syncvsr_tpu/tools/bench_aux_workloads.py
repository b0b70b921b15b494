"""Train-step throughput of the two auxiliary workloads not covered by
bench.py: LRW landmark (the reference's own TPU stack, LRW/landmark) and
LRS3 audio (Conv1D-ResNet frontend over raw waveforms, lrs3.yaml modality
switch). One process, one relay session.

Usage: python -m syncvsr_tpu.tools.bench_aux_workloads
"""

from __future__ import annotations

import json
import time

import jax.numpy as jnp

from syncvsr_tpu.engine import build_train_step, create_train_state
from syncvsr_tpu.models import build_model


def _time_step(step, state, batch, n=10, reps=2):
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        dt = min(dt, time.perf_counter() - t0)
    return dt / n


def bench_landmark(batch_size=1024):
    from syncvsr_tpu.config import lrw_landmark_config
    from syncvsr_tpu.data.synthetic import word_batch

    config = lrw_landmark_config().override(**{"data.batch_size": batch_size})
    model = build_model(config)
    raw = word_batch(config, batch_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    state = create_train_state(config, model, batch)
    step = build_train_step(mesh=None, donate=True)
    sec = _time_step(step, state, batch)
    frames = batch_size * raw["inputs"].shape[1]
    print(json.dumps({"workload": "lrw_landmark", "batch_size": batch_size,
                      "ms_per_step": round(sec * 1e3, 2),
                      "frames_per_sec": round(frames / sec, 1)}))


def bench_audio(batch_size=32, frames=160):
    from syncvsr_tpu.config import lrs3_audio_config
    from syncvsr_tpu.data.synthetic import sentence_batch

    config = lrs3_audio_config().override(**{"data.batch_size": batch_size})
    model = build_model(config)
    raw = sentence_batch(config, batch_size, num_frames=frames, label_len=48)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    state = create_train_state(config, model, batch)
    step = build_train_step(mesh=None, donate=True)
    sec = _time_step(step, state, batch)
    print(json.dumps({"workload": "lrs3_audio", "batch_size": batch_size,
                      "video_equiv_frames": frames,
                      "ms_per_step": round(sec * 1e3, 2),
                      "frames_per_sec": round(batch_size * frames / sec, 1)}))


if __name__ == "__main__":
    bench_landmark()
    bench_audio()

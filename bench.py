"""Benchmarks: train-step throughput for the two flagship workloads.

Prints one JSON line per workload (video frames/sec/chip):
  1. lrs3 sentence-level — Conformer 12L x 768d + CTC + attention decoder +
     sync head, bs 16 x T=160 bucket, bf16, aug in-step (the workload the
     reference trained on TPU pods: LRS/video/config/lrs3.yaml).
  2. lrw word-level — Conv3D+ResNet-18 frontend, 12L x 512d transformer,
     word-CE + lambda*sync, bs 96, bf16, fused on-device augmentation.
The LRW line is printed LAST (the driver's tail parse keeps it as the
headline metric).

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
compares against the previous round's recorded value when BENCH_BASELINE.json
(lrw) / BENCH_BASELINE_LRS3.json (lrs3) exist, else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_fps(step, state, device_batch, frames_per_batch: int,
               n_steps: int = 10, reps: int = 2) -> float:
    """Warm up (compile), then time `reps` runs of `n_steps`, keep the faster
    (the axon relay occasionally stalls a dispatch — see CLAUDE.md); sync via
    host transfer since block_until_ready is unreliable on the relay."""
    for _ in range(3):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, device_batch)
        float(metrics["loss"])
        dt = min(dt, time.perf_counter() - t0)
    return frames_per_batch * n_steps / dt


def _vs(value: float, baseline_file: str) -> float:
    if os.path.exists(baseline_file):
        try:
            baseline = json.load(open(baseline_file)).get("value")
            if baseline:
                return round(value / baseline, 3)
        except Exception:
            pass
    return 1.0


def bench_lrw(on_accel: bool) -> None:
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_word_aug

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
    fps = _timed_fps(step, state, device_batch, batch_size * frames)

    print(json.dumps({
        "metric": "lrw_video_train_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": _vs(fps, "BENCH_BASELINE.json"),
    }))


def bench_lrs3(on_accel: bool) -> None:
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_sentence_aug

    # bs 8 x T=160: the stable single-chip bucket (reference global bs 16 is
    # split across chips). bs 16 on one v5e chip reproducibly crashes the TPU
    # worker ("kernel fault") with or without the Pallas sync kernel — an
    # XLA/runtime fault at those shapes, triaged 2026-08-17; bs8 measured
    # 102 ms/step (12.5k fps) with uint8-128 aug in-step.
    batch_size = 8 if on_accel else 2
    frames = 160 if on_accel else 16

    config = lrs3_config().override(**{"data.batch_size": batch_size})
    if not on_accel:
        config = config.override(**{
            "model.encoder.layers": 2, "model.encoder.dim": 64,
            "model.encoder.heads": 2, "model.decoder.layers": 1,
            "model.decoder.dim": 64, "model.decoder.heads": 2,
            "model.decoder.hidden": 128, "model.labels": 101,
            "data.crop_size": 32})

    model = build_model(config)
    raw = sentence_batch(config, batch_size, num_frames=frames, label_len=48)
    # uint8 frames as decoded from the pkls; LRS3 preprocessing emits 128x128
    # face crops (reference prepare_LRS3.py:90-115), RRC'd to 96 in-step
    rng = np.random.RandomState(0)
    src = 128 if on_accel else 40
    raw["videos"] = rng.randint(
        0, 256, (batch_size, frames, src, src, 1)).astype(np.uint8)

    h = config.data.crop_size
    init_batch = dict(raw)
    init_batch["videos"] = jnp.zeros(
        (batch_size, frames, h, h, 1), jnp.float32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init_batch.items()})

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(config.train.scoped_vmem_kib)}
            if config.train.scoped_vmem_kib and on_accel else None)
    step = build_train_step(mesh=None, donate=True,
                            aug_fn=build_sentence_aug(config.data),
                            compiler_options=opts)
    device_batch = jax.device_put({k: jnp.asarray(v) for k, v in raw.items()})
    fps = _timed_fps(step, state, device_batch, batch_size * frames)

    print(json.dumps({
        "metric": "lrs3_sentence_train_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": _vs(fps, "BENCH_BASELINE_LRS3.json"),
    }))


def main():
    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "axon")
    bench_lrs3(on_accel)
    bench_lrw(on_accel)  # headline metric: keep last


def _run_isolated(workload: str, timeout_s: int) -> bool:
    """Run one workload in a subprocess so a TPU-relay fault (OOM/wedge)
    in one bench cannot take down the other — the lrw line must stay last
    on stdout (the driver's tail parse is the headline metric). The child
    probes the platform itself: the parent must NOT touch jax.devices()
    (on real TPU that takes exclusive per-process chip access and every
    child would fail; on the axon relay it would hold a session idle)."""
    import subprocess
    import sys

    code = ("import jax, bench; "
            "bench.bench_%s(jax.devices()[0].platform in ('tpu', 'axon'))"
            % workload)
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s, cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f"# bench {workload}: timeout after {timeout_s}s "
                  f"(attempt {attempt + 1})", flush=True)
            continue
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if line:
            # keep a completed measurement even if teardown crashed the
            # child afterwards (relay faults around session end are a
            # documented mode)
            print(line, flush=True)
            return True
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        print(f"# bench {workload} failed (attempt {attempt + 1}, "
              f"rc {proc.returncode}): " + " | ".join(tail), flush=True)
    return False


if __name__ == "__main__":
    if bool(int(os.environ.get("SYNCVSR_BENCH_INPROC", "0"))):
        main()  # debugging: single process, no isolation
    else:
        # generous timeouts: relay startup + first compile can take 20+ min
        # on a sick relay (observed 2026-08-17)
        _run_isolated("lrs3", timeout_s=2700)
        _run_isolated("lrw", timeout_s=2700)

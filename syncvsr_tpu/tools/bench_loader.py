"""Measure the host data-pipeline feed rate against the TPU step rate.

VERDICT r1 #6: the training loader must sustain clips/sec above the chip's
consumption (bs 96 at ~8.6 steps/s = ~830 clips/s on a full v5e host). This
tool builds a synthetic LRW pkl tree at the real geometry (29 frames of
96h x 112w grayscale JPEG per clip, vq tokens, durations.csv — the layout of
reference LRW/video/src/preprocess_pkl.py:209-225), then drives the *real*
factory loader (native batch JPEG decode + thread pool + prefetch) and
reports clips/sec, scaling over thread counts.

Usage: python -m syncvsr_tpu.tools.bench_loader [n_clips] [threads,threads,..]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_tree(root: Path, n_clips: int, frames: int = 29,
              size=(96, 112), vocab: int = 320, seed: int = 0) -> int:
    import cv2
    import pandas as pd
    import torch

    rng = np.random.RandomState(seed)
    rows = []
    word = "ABOUT"
    d = root / word / "train"
    d.mkdir(parents=True, exist_ok=True)
    # natural-image-ish frames so JPEG decode cost is realistic (pure noise
    # inflates entropy ~3x vs lip crops)
    base = cv2.GaussianBlur(
        rng.randint(0, 256, size, np.uint8), (0, 0), 3)
    for i in range(n_clips):
        jpgs = []
        for f in range(frames):
            img = np.clip(base.astype(np.int16)
                          + rng.randint(-20, 20, size), 0, 255).astype(np.uint8)
            jpgs.append(cv2.imencode(".jpg", img)[1].tobytes())
        tokens = torch.tensor(rng.randint(0, vocab, (1, frames * 4 + 4, 2)))
        torch.save({"video": jpgs, "vq_tokens": tokens},
                   d / f"{word}_{i:05d}.pkl")
        rows.append((f"train/{word}_{i:05d}", 11))
    pd.DataFrame(rows, columns=["id", "length"]).to_csv(
        root / "durations.csv", index=False)
    return n_clips


def bench(root: str, threads: int, batch_size: int = 96,
          max_batches: int = 50, packed: bool = False) -> dict:
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.factory import build_loaders
    from syncvsr_tpu.data.jpeg import native_available

    config = lrw_video_config().override(**{
        "data.root": root, "data.batch_size": batch_size,
        "data.eval_batch_size": batch_size, "data.num_workers": threads,
        "data.packed": packed})
    train_loader, _ = build_loaders(config)
    it = iter(train_loader)
    first = next(it)  # warm: builds the native lib, fills prefetch
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += batch["inputs"].shape[0]
        if n >= max_batches * batch_size:
            break
    dt = time.perf_counter() - t0
    cps = n / dt if n else 0.0
    return {"threads": threads, "packed": packed,
            "clips_per_sec": round(cps, 1),
            "frames_per_sec": round(cps * 29, 1),
            "native_decoder": native_available(),
            "batch_shape": list(first["inputs"].shape)}


def make_lrs_tree(root: Path, n_clips: int, tmin: int = 40, tmax: int = 200,
                  size=(128, 128), seed: int = 0) -> int:
    """Synthetic LRS3 pkl tree at preprocessing geometry (128x128 face-crop
    JPEGs + bundled waveform + vq tokens, tools/prepare_lrs.py)."""
    import cv2
    import torch

    rng = np.random.RandomState(seed)
    d = root / "LRS3" / "train" / "spk0"
    d.mkdir(parents=True, exist_ok=True)
    base = cv2.GaussianBlur(rng.randint(0, 256, size, np.uint8), (0, 0), 3)
    for i in range(n_clips):
        t = int(rng.randint(tmin, tmax + 1))
        jpgs = []
        for _ in range(t):
            img = np.clip(base.astype(np.int16)
                          + rng.randint(-20, 20, size), 0, 255).astype(np.uint8)
            jpgs.append(cv2.imencode(".jpg", img)[1].tobytes())
        torch.save({
            "video": jpgs,
            "text": "hello world " * int(rng.randint(1, 8)),
            "audio": (rng.randn(t * 640) * 3000).astype(np.int16),
            "vq_tokens": torch.tensor(rng.randint(0, 320, (1, t * 4 + 4, 2))),
        }, d / f"clip{i:05d}.pkl")
    return n_clips


def bench_sentence(root: str, threads: int, packed: bool = False,
                   max_frames_read: int = 20_000) -> dict:
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.factory import LRSBucketLoader
    from syncvsr_tpu.data.jpeg import native_available

    config = lrs3_config().override(**{
        "data.root": root, "data.dataset": "lrs3", "data.batch_size": 8,
        "data.num_workers": threads, "data.packed": packed,
        "data.length_buckets": [80, 160, 200]})
    loader = LRSBucketLoader(config, "train", True)
    frames = 0
    it = iter(loader)
    next(it)  # warm: schedule + native lib + prefetch window
    t0 = time.perf_counter()
    for batch in it:
        frames += int(batch["lengths"].sum())
        if frames >= max_frames_read:
            break
    dt = time.perf_counter() - t0
    return {"threads": threads, "packed": packed,
            "frames_per_sec": round(frames / dt, 1) if frames else 0.0,
            "native_decoder": native_available()}


def main_sentence(n_clips: int, threads):
    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_lrs_"))
    packed_dir = Path(tempfile.mkdtemp(prefix="bench_loader_lrs_packed_"))
    try:
        t0 = time.perf_counter()
        make_lrs_tree(tmp, n_clips)
        gen_s = time.perf_counter() - t0
        from syncvsr_tpu.data.packed_lrs import pack_lrs_split

        pack_lrs_split(str(tmp), "LRS3", "train", str(packed_dir / "LRS3"))
        results = [bench_sentence(str(tmp), t) for t in threads]
        results += [bench_sentence(str(packed_dir), t, packed=True)
                    for t in threads]
        print(json.dumps({
            "task": "sentence", "n_clips": n_clips,
            "tree_gen_s": round(gen_s, 1),
            "host_cpus": __import__("os").cpu_count(),
            # chip consumption: lrs3 bench 12.5k frames/s/chip (bs8 x T160)
            "required_frames_per_sec_per_chip": 12_500,
            "results": results,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(packed_dir, ignore_errors=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "sentence":
        main_sentence(int(sys.argv[2]) if len(sys.argv) > 2 else 96,
                      [int(t) for t in sys.argv[3].split(",")]
                      if len(sys.argv) > 3 else [1, 4, 8])
        return
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    threads = ([int(t) for t in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [1, 4, 8])
    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    packed_dir = Path(tempfile.mkdtemp(prefix="bench_loader_packed_"))
    try:
        t0 = time.perf_counter()
        make_tree(tmp, n_clips)
        gen_s = time.perf_counter() - t0
        from syncvsr_tpu.data.lrw import load_durations
        from syncvsr_tpu.data.packed import pack_lrw_split

        pack_lrw_split(str(tmp), "train", str(packed_dir),
                       durations_df=load_durations(str(tmp / "durations.csv")))
        results = [bench(str(tmp), t, max_batches=max(2, n_clips // 96))
                   for t in threads]
        results += [bench(str(packed_dir), t, packed=True,
                          max_batches=max(2, n_clips // 96))
                    for t in threads]
        step_clips = 96 * 8.6  # chip consumption at the round-1 step rate
        print(json.dumps({
            "n_clips": n_clips, "tree_gen_s": round(gen_s, 1),
            "host_cpus": __import__("os").cpu_count(),
            "required_clips_per_sec_per_chip": round(step_clips, 1),
            "results": results,
            "feed_ratio_best": round(
                max(r["clips_per_sec"] for r in results) / step_clips, 3),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(packed_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Dataset/loader factory: Config -> (train_iter, eval_iter) of numpy batches."""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from syncvsr_tpu.config import Config
from syncvsr_tpu.data import synthetic
from syncvsr_tpu.data.loader import DataLoader, pad_word_collate
from syncvsr_tpu.data.lrs import BucketBatcher, LRSDataset, glob_lrs_files
from syncvsr_tpu.data.lrw import (
    LRWLandmarkDataset,
    LRWVideoDataset,
    discover_labels,
    glob_lrw_files,
    load_durations,
)


class SyntheticLoader:
    """Deterministic random batches — smoke tests and benchmarking."""

    def __init__(self, config: Config, train: bool, n_batches: int = 16):
        self.config = config
        self.n = n_batches
        self.train = train

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            seed = i if self.train else 10_000 + i
            if self.config.model.task == "word":
                yield synthetic.word_batch(self.config, seed=seed)
            else:
                yield synthetic.sentence_batch(
                    self.config, num_frames=min(32, self.config.data.max_frames),
                    seed=seed)


def build_loaders(config: Config) -> Tuple[object, object]:
    name = config.data.dataset
    if name == "synthetic":
        return SyntheticLoader(config, True), SyntheticLoader(config, False, 4)
    if name in ("lrw", "lrw1000"):
        return _lrw_video_loaders(config)
    if name == "lrw_landmark":
        return _lrw_landmark_loaders(config)
    if name in ("lrs2", "lrs3", "vox2"):
        return _lrs_loaders(config)
    raise ValueError(f"unknown dataset {name}")


def _lrw_common(config: Config):
    root = config.data.root
    labels = discover_labels(root)
    durations = None
    durations_path = os.path.join(root, "durations.csv")
    if config.model.use_word_boundary and os.path.exists(durations_path):
        durations = load_durations(durations_path)
    return root, labels, durations


def _lrw_video_loaders(config: Config):
    root, labels, durations = _lrw_common(config)
    codec = config.model.codec
    rows = config.data.num_frames * codec.audio_alignment + 4
    collate = pad_word_collate(config.data.num_frames, rows, codec.vq_groups)

    def make(split, shuffle, bs):
        files = glob_lrw_files(root, split)
        ds = LRWVideoDataset(files, labels, codec=codec.name,
                             durations_df=durations,
                             num_frames=config.data.num_frames)
        return DataLoader(ds, bs, shuffle=shuffle, seed=config.train.seed,
                          collate=collate)

    return (make("train", True, config.data.batch_size),
            make("val", False, config.data.eval_batch_size))


def _lrw_landmark_loaders(config: Config):
    root, labels, durations = _lrw_common(config)
    codec = config.model.codec
    rows = config.data.num_frames * codec.audio_alignment + 4
    collate = pad_word_collate(config.data.num_frames, rows, codec.vq_groups)
    from syncvsr_tpu.data.landmark_transforms import create_transform

    def make(split, shuffle, bs, train):
        files = glob_lrw_files(root, split, ext="npy")
        ds = LRWLandmarkDataset(files, labels, codec=codec.name,
                                durations_df=durations,
                                transform=create_transform(train=train))
        return DataLoader(ds, bs, shuffle=shuffle, seed=config.train.seed,
                          collate=collate)

    return (make("train", True, config.data.batch_size, True),
            make("val", False, config.data.eval_batch_size, False))


class LRSBucketLoader:
    def __init__(self, config: Config, split: str, shuffle: bool):
        from syncvsr_tpu.data.tokenizer import TextTransform

        self.config = config
        self.tt = TextTransform()
        files = glob_lrs_files(config.data.root, config.data.dataset.upper(), split)
        self.ds = LRSDataset(files, self.tt, codec=config.model.codec.name,
                             audio_alignment=config.model.codec.audio_alignment,
                             max_frames=config.data.max_frames)
        self.shuffle = shuffle
        self.split = split
        self.epoch = 0

    def __len__(self):
        return max(len(self.ds) // self.config.data.batch_size, 1)

    def __iter__(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.config.train.seed + self.epoch)
            rng.shuffle(idx)
        self.epoch += 1
        import jax

        idx = idx[jax.process_index()::jax.process_count()]
        codec = self.config.model.codec
        batcher = BucketBatcher(self.config.data.length_buckets,
                                self.config.data.batch_size // jax.process_count(),
                                self.config.data.max_label_len,
                                codec.vq_groups, codec.audio_alignment)
        for i in idx:
            b = batcher.add(self.ds[int(i)])
            if b is not None:
                yield b
        for b in batcher.flush():
            yield b


def _lrs_loaders(config: Config):
    return (LRSBucketLoader(config, "train", True),
            LRSBucketLoader(config, "val", False))

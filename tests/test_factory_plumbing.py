"""Factory plumbing: eval-split selection, released-token audio_root mapping,
DC-TCN data path, loader thread-pool concurrency, vox2 length distribution."""

import time

import numpy as np
import pytest

from syncvsr_tpu.config import lrw_video_config, vox2_config
from syncvsr_tpu.data.factory import build_loaders
from tests.conftest import make_lrw_tree


def _tiny_lrw_overrides(root, **extra):
    o = {
        "model.encoder.layers": 1, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.labels": 2,
        "model.codec.audio_vocab_size": 13, "model.dtype": "float32",
        "model.use_word_boundary": True,
        "data.dataset": "lrw", "data.root": str(root), "data.batch_size": 4,
        "data.eval_batch_size": 4, "data.crop_size": 16,
    }
    o.update(extra)
    return lrw_video_config().override(**o)


def _base_filenames(loader):
    ds = loader.dataset
    ds = getattr(ds, "base", ds)
    return ds.filenames


def test_eval_split_selection(tmp_path):
    root = make_lrw_tree(tmp_path / "LRW", splits=("train", "val", "test"), n=4)
    config = _tiny_lrw_overrides(root)
    _, val_loader = build_loaders(config)              # training default: val
    _, test_loader = build_loaders(config, eval_split="test")
    assert all("/val/" in f.replace("\\", "/") for f in _base_filenames(val_loader))
    assert all("/test/" in f.replace("\\", "/") for f in _base_filenames(test_loader))
    # config.data.split also routes the default
    config2 = config.override(**{"data.split": "test"})
    _, l2 = build_loaders(config2)
    assert all("/test/" in f.replace("\\", "/") for f in _base_filenames(l2))


def test_audio_root_token_mapping(tmp_path):
    """Tokens live in separate released pkls mapped by path convention
    (reference LRW/video/src/data.py:49-55)."""
    token_root = tmp_path / "tokens"
    root = make_lrw_tree(tmp_path / "LRW", n=4, token_root=token_root)
    config = _tiny_lrw_overrides(root, **{"data.audio_root": str(token_root)})
    train_loader, _ = build_loaders(config)
    batch = next(iter(train_loader))
    assert batch["audio_tokens"].shape[-1] == 2
    assert (batch["audio_tokens"][:, : 29 * 4] >= 0).all()
    # without audio_root the video pkls have no tokens -> loader raises
    config_no = _tiny_lrw_overrides(root)
    bad_loader, _ = build_loaders(config_no)
    with pytest.raises(KeyError):
        next(iter(bad_loader))


def test_dctcn_data_path(tmp_path, mesh8):
    """encoder.kind=dense_tcn wires the DC-TCN augs + attention_mask through
    the factory (reference LRW/video/src/data.py:70-139)."""
    root = make_lrw_tree(tmp_path / "LRW", n=4)
    config = _tiny_lrw_overrides(root, **{
        "model.encoder.kind": "dense_tcn",
        "model.encoder.tcn_growth_rates": [16, 16],
        "model.encoder.tcn_blocks": [1, 1],
        "model.encoder.tcn_kernel_sizes": [3],
        "model.encoder.tcn_dilations": [1],
        "model.encoder.tcn_reduced_size": 16,
    })
    train_loader, eval_loader = build_loaders(config)
    tb = next(iter(train_loader))
    eb = next(iter(eval_loader))
    assert "attention_mask" in tb and "attention_mask" in eb
    assert tb["inputs"].dtype == np.uint8  # mask_frames keeps uint8
    # eval has no augs: full attention everywhere
    assert (eb["attention_mask"] == 1.0).all()
    # train trims are observable: over a few epochs some mask rows shorten
    seen_trim = False
    for _ in range(4):
        b = next(iter(train_loader))
        if (b["attention_mask"].sum(axis=1) < b["attention_mask"].shape[1]).any():
            seen_trim = True
            break
    assert seen_trim


def test_dctcn_driver_end_to_end(tmp_path, mesh8):
    """DC-TCN trains end-to-end from the pkl tree through the real factory."""
    from syncvsr_tpu.train import train

    root = make_lrw_tree(tmp_path / "LRW", n=4)
    config = _tiny_lrw_overrides(root, **{
        "model.encoder.kind": "dense_tcn",
        "model.encoder.tcn_growth_rates": [16, 16],
        "model.encoder.tcn_blocks": [1, 1],
        "model.encoder.tcn_kernel_sizes": [3],
        "model.encoder.tcn_dilations": [1],
        "model.encoder.tcn_reduced_size": 16,
        "data.batch_size": 8, "data.eval_batch_size": 8,
        "optim.total_steps": 0,
        "train.epochs": 1, "train.log_every": 1, "train.eval_every": 2,
        "train.ckpt_every": 100, "train.ckpt_dir": str(tmp_path / "ckpt")})
    final = train(config)
    assert np.isfinite(final["val/loss"])


class _SlowDataset:
    def __init__(self, n=32, delay=0.02):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)  # releases the GIL like cv2 decode does
        return {"x": np.full((4,), i, np.float32)}


def test_loader_thread_pool_concurrency():
    """num_threads actually parallelizes sample fetches."""
    from syncvsr_tpu.data.loader import DataLoader

    def run(threads):
        dl = DataLoader(_SlowDataset(), 8, shuffle=False, num_threads=threads,
                        process_index=0, process_count=1)
        t0 = time.perf_counter()
        batches = list(dl)
        return time.perf_counter() - t0, batches

    t1, b1 = run(1)
    t8, b8 = run(8)
    assert len(b8) == 4
    # identical content/order regardless of concurrency
    for a, b in zip(b1, b8):
        np.testing.assert_array_equal(a["x"], b["x"])
    assert t8 < t1 * 0.6, f"no speedup from threads: {t1:.3f}s -> {t8:.3f}s"


def test_loader_propagates_worker_errors():
    from syncvsr_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("boom")

    dl = DataLoader(Bad(), 4, shuffle=False, num_threads=2,
                    process_index=0, process_count=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


def test_vox2_length_distribution(tmp_path):
    root = tmp_path / "data"
    (root / "VOX2" / "train" / "x").mkdir(parents=True)
    (root / "VOX2" / "val" / "x").mkdir(parents=True)
    np.save(root / "video_length.npy",
            np.random.RandomState(0).randint(12, 156, 100))
    config = vox2_config().override(**{"data.root": str(root)})
    train_loader, eval_loader = build_loaders(config)
    assert train_loader.ds.length_distribution is not None
    assert len(train_loader.ds.length_distribution) == 100
    # eval never windows stochastically and caps at max_frames_val
    assert eval_loader.ds.length_distribution is None
    assert eval_loader.ds.max_frames == config.data.max_frames_val

"""Packed dataset format: pack/read equality with the pkl tree, factory path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests.conftest import make_lrw_tree  # noqa: E402


@pytest.fixture(scope="module")
def packed_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("lrw_src")
    out = tmp_path_factory.mktemp("lrw_packed")
    make_lrw_tree(root, n=4)

    from syncvsr_tpu.data.lrw import load_durations
    from syncvsr_tpu.data.packed import pack_lrw_split

    durations = load_durations(str(root / "durations.csv"))
    for split in ("train", "val"):
        pack_lrw_split(str(root), split, str(out), durations_df=durations)
    return str(root), str(out)


def test_packed_matches_pkl_reader(packed_pair):
    root, out = packed_pair
    from syncvsr_tpu.data.lrw import (
        LRWVideoDataset,
        discover_labels,
        glob_lrw_files,
        load_durations,
    )
    from syncvsr_tpu.data.packed import PackedLRWDataset

    labels = discover_labels(root)
    import os

    durations = load_durations(os.path.join(root, "durations.csv"))
    ref = LRWVideoDataset(glob_lrw_files(root, "train"), labels,
                          durations_df=durations)
    got = PackedLRWDataset(out, "train")
    assert len(got) == len(ref)
    assert got.label_names == labels
    for i in range(len(ref)):
        a, b = ref[i], got[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"sample {i} key {k}")


def test_packed_factory_train_loader(packed_pair):
    _, out = packed_pair
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.factory import build_loaders

    config = lrw_video_config().override(**{
        "data.dataset": "lrw", "data.packed": True, "data.root": out,
        "data.batch_size": 4, "data.eval_batch_size": 4,
        "data.num_frames": 29, "model.codec.audio_vocab_size": 13})
    train_loader, val_loader = build_loaders(config)
    batch = next(iter(train_loader))
    assert batch["inputs"].shape == (4, 29, 24, 28, 1)
    assert batch["audio_tokens"].shape[0] == 4
    assert "word_mask" in batch
    assert sum(1 for _ in val_loader) == 2  # 2 words x 4 clips / bs 4


def test_packed_dctcn_wrap(packed_pair):
    _, out = packed_pair
    from syncvsr_tpu.data.lrw import DCTCNDataset
    from syncvsr_tpu.data.packed import PackedLRWDataset

    ds = DCTCNDataset(PackedLRWDataset(out, "train"), train=True, seed=3)
    s = ds[0]
    assert "attention_mask" in s
    assert s["inputs"].dtype == np.uint8

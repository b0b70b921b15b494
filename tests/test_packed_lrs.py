"""Packed LRS sentence dataset: sample parity with the pkl reader, loader
parity through the real factory, codec guard, audio modality."""

import numpy as np
import pytest

from tests.test_audio_modality import _make_audio_lrs_tree


def _pack(root, out, codec="vq", splits=("train", "val")):
    from syncvsr_tpu.data.packed_lrs import pack_lrs_split

    for split in splits:
        pack_lrs_split(root, "LRS3", split, f"{out}/LRS3", codec=codec)
    return str(out)


def test_packed_sample_parity(tmp_path):
    from syncvsr_tpu.data.lrs import LRSDataset, glob_lrs_files
    from syncvsr_tpu.data.packed_lrs import PackedLRSDataset
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [10, 14, 7])
    out = _pack(root, tmp_path / "packed")
    tt = TextTransform()
    ds = LRSDataset(glob_lrs_files(root, "LRS3", "train"), tt)
    pds = PackedLRSDataset(f"{out}/LRS3", "train", tt)
    assert len(pds) == len(ds)
    np.testing.assert_array_equal(pds.lengths, [10, 14, 7])
    for i in range(len(ds)):
        a, b = ds[i], pds[i]
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"sample {i} key {k}")


def test_packed_sample_parity_audio(tmp_path):
    from syncvsr_tpu.data.lrs import LRSDataset, glob_lrs_files
    from syncvsr_tpu.data.packed_lrs import PackedLRSDataset
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [9, 12])
    out = _pack(root, tmp_path / "packed")
    tt = TextTransform()
    ds = LRSDataset(glob_lrs_files(root, "LRS3", "train"), tt,
                    modality="audio")
    pds = PackedLRSDataset(f"{out}/LRS3", "train", tt, modality="audio")
    for i in range(len(ds)):
        a, b = ds[i], pds[i]
        assert b["videos"].ndim == 1
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=f"key {k}")


def test_packed_codec_guard(tmp_path):
    from syncvsr_tpu.data.packed_lrs import PackedLRSDataset
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [8])
    out = _pack(root, tmp_path / "packed", codec="vq", splits=("train",))
    with pytest.raises(ValueError, match="holds 'vq' tokens"):
        PackedLRSDataset(f"{out}/LRS3", "train", TextTransform(),
                         codec="wav2vec2")


def test_packed_blob_size_guard(tmp_path):
    """A blob whose size disagrees with the index (interrupted or stale
    re-pack) must fail loudly at load, not slice garbage offsets."""
    from syncvsr_tpu.data.packed_lrs import PackedLRSDataset
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [8])
    out = _pack(root, tmp_path / "packed", splits=("train",))
    with open(f"{out}/LRS3/train.bin", "ab") as f:
        f.write(b"xx")
    with pytest.raises(ValueError, match="interrupted or mismatched pack"):
        PackedLRSDataset(f"{out}/LRS3", "train", TextTransform())


def test_packed_mixed_audio_fails_loudly(tmp_path):
    """Clips packed without audio in a mixed split must raise (KeyError,
    like the pkl reader) under modality=audio — never feed a silent empty
    waveform row."""
    import torch

    from syncvsr_tpu.data.packed_lrs import PackedLRSDataset, pack_lrs_split
    from syncvsr_tpu.data.tokenizer import TextTransform

    root = _make_audio_lrs_tree(tmp_path, [8, 10])
    # strip the audio key from one clip
    d = tmp_path / "data" / "LRS3" / "train" / "spk0"
    p = sorted(d.glob("*.pkl"))[1]
    data = torch.load(p, weights_only=False)
    del data["audio"]
    torch.save(data, p)
    pack_lrs_split(str(root), "LRS3", "train", str(tmp_path / "p" / "LRS3"))
    pds = PackedLRSDataset(str(tmp_path / "p" / "LRS3"), "train",
                           TextTransform(), modality="audio")
    _ = pds[0]  # has audio: fine
    with pytest.raises(KeyError):
        pds[1]


def test_packed_loader_matches_unpacked(tmp_path):
    """The bucket loader must yield identical batches from packed and pkl
    sources (same schedule, same collate) for both splits."""
    from tests.test_audio_modality import _audio_config
    from syncvsr_tpu.data.factory import LRSBucketLoader

    root = _make_audio_lrs_tree(tmp_path, [10, 14, 7, 22, 30, 5, 18, 9])
    _pack(root, tmp_path / "data_packed")
    base = _audio_config(root).override(**{"data.modality": "video"})
    packed = base.override(**{"data.packed": True,
                              "data.root": str(tmp_path / "data_packed")})

    for split, shuffle in (("train", True), ("val", False)):
        a = list(LRSBucketLoader(base, split, shuffle))
        b = list(LRSBucketLoader(packed, split, shuffle))
        assert len(a) == len(b) and len(a) > 0
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k],
                                              err_msg=f"{split} key {k}")

"""Test harness: emulate an 8-device TPU-like mesh on CPU (SURVEY.md §4f)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from syncvsr_tpu.parallel import create_mesh

    assert len(jax.devices()) == 8
    return create_mesh(data=8, model=1)


def make_lrw_tree(root, words=("ABOUT", "WORLD"), splits=("train", "val"),
                  n=8, frames=29, size=(24, 28), vocab=13, boundary=11,
                  token_root=None, seed=0, with_audio=False,
                  with_tokens=True):
    """Synthetic LRW pkl tree: <root>/<WORD>/<split>/<WORD>_<i>.pkl with JPEG
    frames + vq tokens + durations.csv. When ``token_root`` is given the
    tokens go into a parallel tree of token-only pkls (the released-token
    layout, reference LRW/video/src/data.py:49-55) instead of the video pkls."""
    import cv2
    import pandas as pd
    import torch

    rng = __import__("numpy").random.RandomState(seed)
    np = __import__("numpy")
    rows = []
    for word in words:
        for split in splits:
            d = root / word / split
            d.mkdir(parents=True, exist_ok=True)
            if token_root is not None:
                td = token_root / word / split
                td.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                jpgs = []
                for _ in range(frames):
                    ok, buf = cv2.imencode(
                        ".jpg", rng.randint(0, 256, size, np.uint8))
                    jpgs.append(buf.tobytes())
                tokens = torch.tensor(
                    rng.randint(0, vocab, (1, frames * 4 + 4, 2)))
                payload = {"video": jpgs}
                if with_audio:
                    samples = frames * 640  # 29 frames @ 25fps @ 16 kHz
                    payload["audio"] = (
                        rng.randn(samples) * 3000).astype(np.int16)
                if not with_tokens:
                    pass
                elif token_root is None:
                    payload["vq_tokens"] = tokens
                else:
                    torch.save({"vq_tokens": tokens},
                               token_root / word / split / f"{word}_{i:05d}.pkl")
                torch.save(payload, d / f"{word}_{i:05d}.pkl")
                rows.append((f"{split}/{word}_{i:05d}", boundary))
    pd.DataFrame(rows, columns=["id", "length"]).to_csv(
        root / "durations.csv", index=False)
    return root

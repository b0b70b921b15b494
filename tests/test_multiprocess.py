"""Real multi-process SPMD: 2 jax processes x 4 virtual CPU devices, one
8-device mesh, per-host input sharding via make_array_from_process_local_data
(SURVEY §2.4 multi-host input sharding — the branch single-process tests
can't reach). The sentence test additionally proves the LRS bucket schedule
is lockstep across hosts (same bucket shape on every host at every step)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _spawn(extra_args):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")

    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", coord] + extra_args,
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            # generous: the 1-core container runs both workers (and often a
            # concurrent pytest) on one CPU
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    outs = _spawn(["word"])
    results = [l for out in outs for l in out.splitlines()
               if l.startswith("MP_RESULT")]
    assert len(results) == 2, outs
    losses = sorted(r.split("loss=")[1] for r in results)
    # both hosts see identical replicated metrics for the SAME global batch
    assert losses[0] == losses[1], results


def _make_sentence_tree(tmp_path):
    import cv2
    import torch

    rng = np.random.RandomState(11)
    d = tmp_path / "data" / "LRS3" / "train" / "spk0"
    d.mkdir(parents=True)
    words = ["HELLO", "WORLD", "QUICK", "BROWN", "FOX"]
    # 10 clips per bucket (16 and 32) -> one full global batch of 8 + a
    # repeat-padded tail per bucket; clips long enough that CTC stays
    # feasible (2*label_len+1 <= frames)
    lengths = [rng.randint(12, 17) for _ in range(10)] + \
              [rng.randint(20, 33) for _ in range(10)]
    for i, t in enumerate(lengths):
        frames = []
        for _ in range(t):
            ok, buf = cv2.imencode(
                ".jpg", rng.randint(0, 256, (16, 16), np.uint8))
            frames.append(buf.tobytes())
        torch.save({"video": frames,
                    "text": str(rng.choice(words)),
                    "vq_tokens": torch.tensor(
                        rng.randint(0, 11, (1, t * 4 + 4, 2)))},
                   d / f"clip{i:02d}.pkl")
    return str(tmp_path / "data")


def _assert_lockstep(outs):
    shapes = sorted(l for out in outs for l in out.splitlines()
                    if l.startswith("MP_SHAPES"))
    assert len(shapes) == 2, outs
    # same bucket shape sequence on both hosts (strip the pid)
    assert shapes[0].split()[-1] == shapes[1].split()[-1], shapes
    results = [l for out in outs for l in out.splitlines()
               if l.startswith("MP_RESULT")]
    assert len(results) == 2, outs
    losses = sorted(r.split("losses=")[1] for r in results)
    assert losses[0] == losses[1], results


@pytest.mark.slow
def test_two_process_fsdp_checkpoint(tmp_path):
    """Multi-host FSDP checkpointing: params/Adam moments scattered across
    both processes' devices must still produce a complete, round-trippable
    checkpoint — gather_for_save allgathers on every process, process 0
    writes (regression for ADVICE r4: device_get on process 0 alone raised
    'array spans non-addressable devices')."""
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    outs = _spawn(["fsdp_ckpt", str(ckpt_dir)])
    results = [l for out in outs for l in out.splitlines()
               if l.startswith("MP_RESULT")]
    assert len(results) == 2, outs
    shas = sorted(r.split("params_sha=")[1] for r in results)
    # both hosts assembled the SAME global params from their shards
    assert shas[0] == shas[1], results
    assert (ckpt_dir / "step_1.msgpack").exists()


@pytest.mark.slow
def test_two_process_sentence_buckets(tmp_path):
    """LRS bucket batching in lockstep across 2 hosts: both processes build
    the schedule from the shared length index, emit identical bucket shapes
    at every step, and see identical replicated losses (reference multi-node
    LRS training, LRS/video/config/lrs3.yaml:93-95)."""
    root = _make_sentence_tree(tmp_path)
    _assert_lockstep(_spawn(["sentence", root]))


@pytest.mark.slow
def test_two_process_sentence_buckets_packed(tmp_path):
    """Same lockstep guarantee from the packed blob: the schedule lengths
    come from the packed index (no sidecar scan), and both hosts read their
    strided slice of each scheduled batch from the mmap."""
    root = _make_sentence_tree(tmp_path)
    from syncvsr_tpu.data.packed_lrs import pack_lrs_split

    packed_root = tmp_path / "packed"
    pack_lrs_split(root, "LRS3", "train", str(packed_root / "LRS3"))
    _assert_lockstep(_spawn(["sentence", str(packed_root), "packed"]))

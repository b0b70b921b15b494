"""Relay-proofing kill-tests for the two driver entry points.

Round-3 postmortem: both driver artifacts were rc=124 because the TPU relay
was wedged — ``jax.devices()`` hung >2 min, ``dryrun_multichip`` initialized
the relay backend before deciding to re-exec to CPU, and bench.py burned
2x2700 s retries. These tests simulate a hung/dead relay with a poisoned
``sitecustomize`` and assert both entry points stay fast and green.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _poison_dir(tmp_path, body: str) -> str:
    d = tmp_path / "poison_site"
    d.mkdir()
    (d / "sitecustomize.py").write_text(body)
    return str(d)


# sitecustomize that emulates the axon relay's failure modes. It only arms
# when the poison env var is set AND the process is not the CPU-mesh child
# (which strips PYTHONPATH anyway — the gate is belt-and-braces).
_HANG_SITE = """
import os
if os.environ.get("SYNCVSR_TEST_POISON") and \\
        os.environ.get("JAX_PLATFORMS", "") != "cpu":
    import time
    import jax

    def _hang(*a, **k):
        time.sleep(float(os.environ.get("SYNCVSR_TEST_POISON_SLEEP", "3600")))
        raise RuntimeError("poisoned relay: jax.devices() reached")

    jax.devices = _hang
"""


def _env(**overrides):
    env = dict(os.environ)
    env.pop("SYNCVSR_BENCH_INPROC", None)
    env.update(overrides)
    return env


def test_cpu_mesh_ready_decision(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.remove(REPO)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ge._cpu_mesh_ready(8)
    assert ge._cpu_mesh_ready(4)
    assert not ge._cpu_mesh_ready(16)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not ge._cpu_mesh_ready(8)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "")
    assert not ge._cpu_mesh_ready(2)
    monkeypatch.delenv("JAX_PLATFORMS")
    assert not ge._cpu_mesh_ready(2)


def test_dryrun_reexecs_without_touching_relay(tmp_path):
    """With a poisoned relay (jax.devices() hangs then raises) and a
    relay-shaped env (JAX_PLATFORMS=axon), dryrun_multichip must still go
    green by re-exec'ing into the CPU-mesh subprocess without ever calling
    into the poisoned backend."""
    poison = _poison_dir(tmp_path, _HANG_SITE)
    env = _env(
        PYTHONPATH=poison,
        JAX_PLATFORMS="axon",
        SYNCVSR_TEST_POISON="1",
        # a regression (parent touching jax.devices) fails in ~60s, not 1h
        SYNCVSR_TEST_POISON_SLEEP="60",
    )
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "multichip", "2"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(2) dp: ok" in proc.stdout


def test_bench_probe_hang_fails_fast(tmp_path):
    """A wedged relay (probe hangs) must cost ~one probe window, mark the
    relay dead, skip the remaining workloads, and exit 0 with diagnostics."""
    poison = _poison_dir(tmp_path, _HANG_SITE)
    env = _env(
        PYTHONPATH=poison,
        JAX_PLATFORMS="axon",
        SYNCVSR_TEST_POISON="1",
        SYNCVSR_BENCH_PROBE_S="5",
        SYNCVSR_BENCH_BUDGET_S="300",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "# bench lrw: probe-hang" in out
    assert out.count("skipped (relay unavailable)") == 3
    assert not [ln for ln in out.splitlines() if ln.startswith("{")]


def test_bench_init_error_fails_fast():
    """A dead relay (backend init raises) gets exactly one retry, then the
    parent declares the relay dead — no 2700 s timeout burn."""
    env = _env(JAX_PLATFORMS="doesnotexist", SYNCVSR_BENCH_BUDGET_S="300")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert out.count("init-error") == 2  # first try + the one retry
    assert "skipped (relay unavailable)" in out
    assert not [ln for ln in out.splitlines() if ln.startswith("{")]


@pytest.mark.slow
def test_bench_cpu_smoke_emits_four_lines_headline_last():
    env = _env(JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    metrics = [ln["metric"] for ln in lines]
    # aux/lrs3 lines stream in completion order; the ONLY contract is that
    # all four appear and the lrw headline is the final json line
    assert sorted(metrics) == sorted([
        "lrw_landmark_train_frames_per_sec_per_chip",
        "lrs3_audio_train_frames_per_sec_per_chip",
        "lrs3_sentence_train_frames_per_sec_per_chip",
        "lrw_video_train_frames_per_sec_per_chip",
    ])
    assert metrics[-1] == "lrw_video_train_frames_per_sec_per_chip"
    for ln in lines:
        assert ln["value"] > 0
        assert ln["unit"] == "frames/sec/chip"

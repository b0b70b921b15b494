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


# sitecustomize that emulates the round-4 driver failure: the env LOOKS
# CPU-mesh-ready (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count)
# but a sitecustomize on PYTHONPATH defeats the forced device count at
# interpreter start — exactly what /root/.axon_site did to MULTICHIP_r04
# (reproduced there: 1 device despite the flags). The hermetic child strips
# PYTHONPATH, so this never loads there.
_CLOBBER_SITE = """
import os
if os.environ.get("SYNCVSR_TEST_POISON"):
    os.environ.pop("XLA_FLAGS", None)
"""


def test_dryrun_r4_driver_env_goes_green(tmp_path):
    """The ambient env must never be trusted: even when JAX_PLATFORMS/
    XLA_FLAGS claim a ready CPU mesh, dryrun_multichip must re-exec into the
    stripped-PYTHONPATH child (MULTICHIP_r04 postmortem)."""
    poison = _poison_dir(tmp_path, _CLOBBER_SITE)
    env = _env(
        PYTHONPATH=poison,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        SYNCVSR_TEST_POISON="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "multichip", "2"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(2) dp: ok" in proc.stdout


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


def test_bench_sigterm_flushes_held_headline():
    """A driver-level SIGTERM mid-aux-workload must flush the held lrw
    headline as the final JSON line before dying (BENCH_r04 postmortem: a
    parent kill during audio lost the completed lrw measurement)."""
    import signal
    import time

    env = _env(
        SYNCVSR_BENCH_FAKE="lrw=ok,lrs3=ok,landmark=hang,audio=ok",
        SYNCVSR_BENCH_BUDGET_S="300",
        # the parent dies on SIGTERM without reaping the hanging child;
        # bound the orphan's lifetime
        SYNCVSR_BENCH_FAKE_HANG_S="60",
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    # read until both fast workloads completed and landmark is hanging
    out_lines = []
    deadline = time.time() + 60
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        out_lines.append(line)
        if line.startswith("# bench lrs3: ok"):
            break
    assert any(ln.startswith("# bench lrw: ok") for ln in out_lines), out_lines
    time.sleep(1.0)  # let the parent enter the hanging landmark child wait
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=30)
    out = "".join(out_lines) + rest
    json_lines = [json.loads(ln) for ln in out.splitlines()
                  if ln.startswith("{")]
    metrics = [ln["metric"] for ln in json_lines]
    # lrs3 streamed immediately; the held lrw line was flushed ON the kill
    assert metrics[-1] == "lrw_fake", out
    assert "lrs3_fake" in metrics, out
    assert proc.returncode == 128 + signal.SIGTERM, proc.returncode


def test_bench_budget_prioritizes_headline_and_exits_in_time():
    """With a budget too small for every workload, the headline still runs
    (first), an overrunning aux workload is timed out, the rest are skipped
    with diagnostics, and the parent exits 0 on its own — never relying on
    the driver's kill (BENCH_r04 postmortem: budget > driver cap = rc 124)."""
    env = _env(
        SYNCVSR_BENCH_FAKE="lrw=ok,lrs3=hang,landmark=ok,audio=ok",
        SYNCVSR_BENCH_BUDGET_S="12",
        SYNCVSR_BENCH_MIN_REMAINING_S="6",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "# bench lrs3: timeout" in out, out
    assert "skipped (budget exhausted" in out, out
    json_lines = [json.loads(ln) for ln in out.splitlines()
                  if ln.startswith("{")]
    assert json_lines[-1]["metric"] == "lrw_fake", out


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

"""Real multi-process SPMD: 2 jax processes x 4 virtual CPU devices, one
8-device mesh, per-host input sharding via make_array_from_process_local_data
(SURVEY §2.4 multi-host input sharding — the branch single-process tests
can't reach)."""

import os
import socket
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
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
        [sys.executable, worker, str(pid), "2", coord],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    results = [l for out in outs for l in out.splitlines()
               if l.startswith("MP_RESULT")]
    assert len(results) == 2, outs
    losses = sorted(r.split("loss=")[1] for r in results)
    # both hosts see identical replicated metrics for the SAME global batch
    assert losses[0] == losses[1], results

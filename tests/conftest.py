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

"""Persistent XLA compilation cache (shared by bench/tools/train/eval).

On the axon TPU relay a cold compile dominates wall time: round-5
calibration measured the first program of a fresh process at 224 s cold vs
26.5 s with a warm cache (the residue is relay session setup). Warm-caching
the bench workloads in one session makes every later run — including the
driver's — fit comfortably inside its budget. On CPU it shaves repeated
test-suite compiles.

The cache is keyed on the HLO + compile options + jax/runtime version, so
code changes simply miss (never corrupt). Disable with
``SYNCVSR_COMPILE_CACHE=0``; point elsewhere with
``SYNCVSR_COMPILE_CACHE=<dir>``.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotent; call after ``import jax`` anywhere compiles happen.
    Returns the cache dir, or None when disabled/unsupported.

    TPU/relay-only: XLA:CPU persists AOT executables stamped with the
    compile machine's CPU features, and reloading them floods stderr with
    machine-feature-mismatch errors (SIGILL risk) on this box — and CPU
    compiles are cheap anyway. Decided from JAX_PLATFORMS without touching
    the backend (initializing it here could block on a sick relay)."""
    env = os.environ.get("SYNCVSR_COMPILE_CACHE", "")
    if env == "0":
        return None
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return None
    path = path or (env if env not in ("", "1") else _DEFAULT_DIR)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the relay's cost is RTT + queue, not
        # XLA time, so "cheap" compiles still cost seconds through it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        return None
    return path

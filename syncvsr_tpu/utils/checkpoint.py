"""Checkpointing and parameter surgery.

Covers the reference's three mechanisms (SURVEY.md §5):
 1. best/periodic full-TrainState checkpoints — single-file msgpack (the
    landmark stack's flax.serialization format, LRW/landmark/src/main.py:48-50),
    written atomically (tmp + fsync + rename) and asynchronously
    (AsyncCheckpointer), multi-host-safe via gather_for_save;
 2. partial warm starts: merge the intersection of a pretrained tree into
    fresh params (LRW/landmark/src/utils.py:59-71);
 3. state-dict surgery: key-prefix renames when transferring frontends between
    stacks, e.g. audio_projection -> audio_classifier
    (LRS/video/lightning.py:37-86).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import numpy as np


def flatten(tree: Any) -> Dict[str, Any]:
    return flax.traverse_util.flatten_dict(flax.core.unfreeze(tree), sep=".")


def unflatten(d: Dict[str, Any]) -> Any:
    return flax.traverse_util.unflatten_dict(d, sep=".")


# ---------------------------------------------------------------------------
# msgpack single-file checkpoints (landmark-stack format)
# ---------------------------------------------------------------------------

def save_msgpack(path: str, tree: Any) -> None:
    """Atomic write: serialize to <path>.tmp, fsync, then rename, so neither
    a crash mid-write nor a power loss after the rename leaves a corrupt file
    where ``resume=auto`` will look (fsync orders the data before the
    directory entry flip)."""
    tree = jax.device_get(tree)
    blob = flax.serialization.msgpack_serialize(flax.core.unfreeze(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_msgpack(path: str) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


# ---------------------------------------------------------------------------
# full train-state checkpoints
# ---------------------------------------------------------------------------

def _state_payload(state) -> Dict[str, Any]:
    """Host copy of the full TrainState. The device_get is synchronous by
    design: under ``donate=True`` the next train step invalidates these
    device buffers, so they must be off-device before training continues."""
    return {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(
            flax.serialization.to_state_dict(state.opt_state)),
        "batch_stats": jax.device_get(state.batch_stats or {}),
        "mixup_rng": jax.device_get(state.mixup_rng),
        "dropout_rng": jax.device_get(state.dropout_rng),
    }


def gather_for_save(state):
    """Host-complete TrainState for checkpointing under multi-process
    sharded state (FSDP/ZeRO scatter over ``data``, or tensor-parallel
    leaves spanning hosts).

    With leaves scattered across processes' devices, ``jax.device_get`` on
    process 0 alone raises ("array spans non-addressable devices") — and no
    other process enters the save path to serve a collective. So EVERY
    process calls this BEFORE the process-0 guard (it is a collective when
    anything is scattered): non-fully-replicated jax.Array leaves are
    ``process_allgather``'d to host numpy on all hosts; replicated leaves
    pass through untouched (``device_get`` later reads a local shard).
    Single-process: returns ``state`` unchanged at zero cost."""
    if jax.process_count() == 1:
        return state

    from jax.experimental import multihost_utils

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_replicated:
            # identical tree => identical leaf order on every process, so
            # the collectives line up
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return x

    return jax.tree_util.tree_map(leaf, state)


def save_train_state(ckpt_dir: str, state, step: int, keep: int = 5) -> str:
    """Writes <ckpt_dir>/step_<N>.msgpack with params/opt/batch_stats/rngs."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}.msgpack")
    save_msgpack(path, _state_payload(state))
    _prune(ckpt_dir, keep)
    return path


class AsyncCheckpointer:
    """Overlaps checkpoint serialization + disk IO with training.

    ``save`` copies the state to host synchronously (donation safety, see
    ``_state_payload``) then hands msgpack-encode + atomic write + prune to a
    single worker thread — the train loop only ever blocks on the transfer.
    A pending save is awaited before the next one starts (one in flight).
    Call ``wait()`` before reading the file or exiting.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1)
        self._future = None

    def save(self, ckpt_dir: str, state, step: int, keep: int = 5) -> str:
        self.wait()
        os.makedirs(ckpt_dir, exist_ok=True)
        payload = _state_payload(state)
        path = os.path.join(ckpt_dir, f"step_{step}.msgpack")

        def write():
            save_msgpack(path, payload)
            _prune(ckpt_dir, keep)

        self._future = self._pool.submit(write)
        return path

    def save_msgpack(self, path: str, tree: Any) -> None:
        """Async variant of module-level ``save_msgpack`` (best-ckpt files)."""
        self.wait()
        host = jax.device_get(tree)
        self._future = self._pool.submit(save_msgpack, path, host)

    def wait(self) -> None:
        if self._future is not None:
            self._future.result()
            self._future = None


def restore_train_state(path: str, state):
    payload = load_msgpack(path)
    opt_state = flax.serialization.from_state_dict(state.opt_state,
                                                   payload["opt_state"])
    return state.replace(
        step=int(payload["step"]),
        params=payload["params"],
        opt_state=opt_state,
        batch_stats=payload.get("batch_stats", {}),
        mixup_rng=payload["mixup_rng"],
        dropout_rng=payload["dropout_rng"],
    )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    files = [f for f in os.listdir(ckpt_dir)
             if f.startswith("step_") and f.endswith(".msgpack")]
    if not files:
        return None
    files.sort(key=lambda f: int(f.split("_")[1].split(".")[0]))
    return os.path.join(ckpt_dir, files[-1])


def _prune(ckpt_dir: str, keep: int):
    files = sorted((f for f in os.listdir(ckpt_dir)
                    if f.startswith("step_") and f.endswith(".msgpack")),
                   key=lambda f: int(f.split("_")[1].split(".")[0]))
    for f in files[:-keep]:
        os.remove(os.path.join(ckpt_dir, f))


# ---------------------------------------------------------------------------
# surgery
# ---------------------------------------------------------------------------

def partial_load(params: Any, pretrained: Any,
                 rename: Optional[Dict[str, str]] = None,
                 verbose: bool = True) -> Tuple[Any, int]:
    """Merge every pretrained leaf whose (renamed) key exists in params with a
    matching shape. Returns (merged params, n_loaded)."""
    flat = flatten(params)
    pre = flatten(pretrained)
    if rename:
        renamed = {}
        for k, v in pre.items():
            for old, new in rename.items():
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
            renamed[k] = v
        pre = renamed
    loaded = 0
    for k, v in pre.items():
        if k in flat and np.shape(flat[k]) == np.shape(v):
            flat[k] = v
            loaded += 1
    if verbose:
        print(f"[ckpt] loaded {loaded}/{len(flat)} params from pretrained tree")
    return unflatten(flat), loaded


def load_ssl_pretrained(path: str, params: Any,
                        encoder_key: str = "encoder") -> Any:
    """Warm start from an SSL-pretrained landmark msgpack whose tree is
    {"student": {"encoder": ...}} (reference LRW/landmark/src/utils.py:59-71):
    the student encoder becomes the model subtree, merged by intersection."""
    pretrained = load_msgpack(path)
    if "student" in pretrained:
        pretrained = {encoder_key: pretrained["student"]["encoder"]}
    merged, _ = partial_load(params, pretrained)
    return merged

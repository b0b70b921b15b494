"""Worker for the 2-process distributed tests (test_multiprocess.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
mesh. Modes:

``word``     — every process computes the same synthetic global batch, feeds
               only its local slice through ``shard_batch``
               (make_array_from_process_local_data), runs jitted DP train
               steps, and prints the replicated loss — the parent asserts
               both processes agree (proving global-batch assembly).
``sentence`` — the real LRS bucket pipeline: both processes build
               ``LRSBucketLoader`` over one shared pkl tree (argv[5]) with
               two bucket lengths; the deterministic schedule must emit the
               SAME bucket shape on both hosts at every step or
               ``shard_batch`` mis-assembles/fails. Prints per-step losses;
               the parent asserts they match across hosts.
"""

import os
import sys


def _init(pid: int, nproc: int, coord: str):
    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    return jax


def word_mode(pid: int, nproc: int, coord: str):
    _init(pid, nproc, coord)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from syncvsr_tpu.config import lrw_landmark_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.parallel import create_mesh, replicated, shard_batch

    cfg = lrw_landmark_config().override(**{
        "model.encoder.layers": 2, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.frontend.input_features": 12,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32", "data.batch_size": 8, "data.num_frames": 6,
        "optim.total_steps": 100, "optim.warmup_steps": 2})

    mesh = create_mesh()  # all 8 global devices
    model = build_model(cfg)
    global_batch = word_batch(cfg, 8, seed=0)
    local = {k: v[pid * 4:(pid + 1) * 4] for k, v in global_batch.items()}

    state = create_train_state(
        cfg, model, {k: jnp.asarray(v) for k, v in global_batch.items()})
    # replicate the (identically-seeded) state across hosts
    state = jax.device_put(jax.device_get(state), replicated(mesh))

    step = build_train_step(mesh, donate=False)
    state, metrics = step(state, shard_batch(mesh, local))
    loss = float(metrics["loss"])
    state, metrics = step(state, shard_batch(mesh, local))
    loss2 = float(metrics["loss"])
    assert np.isfinite(loss) and np.isfinite(loss2)
    print(f"MP_RESULT pid={pid} loss={loss:.6f} loss2={loss2:.6f}", flush=True)


def sentence_mode(pid: int, nproc: int, coord: str, root: str,
                  packed: bool = False):
    _init(pid, nproc, coord)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.factory import build_loaders
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_sentence_eval_transform
    from syncvsr_tpu.parallel import create_mesh, replicated, shard_batch

    cfg = lrs3_config().override(**{
        "model.encoder.layers": 1, "model.encoder.dim": 16,
        "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
        "model.decoder.layers": 1, "model.decoder.dim": 16,
        "model.decoder.heads": 2, "model.decoder.hidden": 32,
        # real TextTransform ids (bundled unigram-5000 vocab)
        "model.labels": 5049, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32",
        "model.frontend.stem_channels": 8, "model.frontend.resnet_width": 8,
        "model.frontend.out_dim": 16,
        "data.dataset": "lrs3", "data.root": root, "data.crop_size": 16,
        "data.packed": packed,
        "data.batch_size": 8, "data.length_buckets": [16, 32],
        "optim.total_steps": 100, "optim.warmup_steps": 2})

    mesh = create_mesh()
    model = build_model(cfg)
    train_loader, _ = build_loaders(cfg)
    transform = build_sentence_eval_transform(cfg.data, "lrs3")

    batches = [transform(b) for b in train_loader]
    shapes = [b["videos"].shape for b in batches]
    # >= 2 distinct bucket lengths must appear for the test to mean anything
    assert len({s[1] for s in shapes}) >= 2, shapes
    print(f"MP_SHAPES pid={pid} " + ";".join(
        "x".join(map(str, s)) for s in shapes), flush=True)

    init = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(cfg, model, init)
    state = jax.device_put(jax.device_get(state), replicated(mesh))

    step = build_train_step(mesh, donate=False)
    losses = []
    for b in batches:
        state, metrics = step(state, shard_batch(mesh, b))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    print("MP_RESULT pid={} losses={}".format(
        pid, ",".join(f"{l:.6f}" for l in losses)), flush=True)


def fsdp_ckpt_mode(pid: int, nproc: int, coord: str, ckpt_dir: str):
    """FSDP checkpointing across hosts: params/Adam moments are scattered
    over BOTH processes' devices, so process 0 cannot device_get them alone
    (ADVICE r4 medium). Every process calls gather_for_save (a collective),
    process 0 writes, then verifies the file round-trips bit-exact."""
    _init(pid, nproc, coord)

    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from syncvsr_tpu.config import lrw_landmark_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.parallel import create_mesh, replicated, shard_batch, \
        shard_state
    from syncvsr_tpu.utils import checkpoint as ckpt

    cfg = lrw_landmark_config().override(**{
        "model.encoder.layers": 2, "model.encoder.dim": 32,
        "model.encoder.heads": 2, "model.frontend.input_features": 12,
        "model.labels": 11, "model.codec.audio_vocab_size": 17,
        "model.dtype": "float32", "data.batch_size": 8, "data.num_frames": 6,
        "optim.total_steps": 100, "optim.warmup_steps": 2})

    mesh = create_mesh()  # 8 devices over 2 processes, all on "data"
    model = build_model(cfg)
    global_batch = word_batch(cfg, 8, seed=0)
    local = {k: v[pid * 4:(pid + 1) * 4] for k, v in global_batch.items()}

    state = create_train_state(
        cfg, model, {k: jnp.asarray(v) for k, v in global_batch.items()})
    state = jax.device_put(jax.device_get(state), replicated(mesh))
    state = shard_state(mesh, state, fsdp=True, fsdp_min_size=256)

    # the scenario that used to crash: leaves spanning non-addressable devices
    scattered = [x for x in jax.tree_util.tree_leaves(state.params)
                 if not x.is_fully_replicated]
    assert scattered, "fsdp scattered nothing — test is vacuous"
    assert not scattered[0].is_fully_addressable, \
        "scattered leaf is host-local — test is vacuous"

    step = build_train_step(mesh, donate=False, fsdp=True)
    state, metrics = step(state, shard_batch(mesh, local))
    assert np.isfinite(float(metrics["loss"]))

    host_state = ckpt.gather_for_save(state)  # collective on ALL processes
    if pid == 0:
        path = ckpt.save_train_state(ckpt_dir, host_state, step=1)
        payload = ckpt.load_msgpack(path)
        for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(host_state.params)),
                jax.tree_util.tree_leaves(payload["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    digest = hashlib.sha256(b"".join(
        np.ascontiguousarray(np.asarray(x)).tobytes()
        for x in jax.tree_util.tree_leaves(
            jax.device_get(host_state.params)))).hexdigest()
    print(f"MP_RESULT pid={pid} params_sha={digest}", flush=True)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "word"
    if mode == "sentence":
        sentence_mode(pid, nproc, coord, sys.argv[5],
                      packed=len(sys.argv) > 6 and sys.argv[6] == "packed")
    elif mode == "fsdp_ckpt":
        fsdp_ckpt_mode(pid, nproc, coord, sys.argv[5])
    else:
        word_mode(pid, nproc, coord)


if __name__ == "__main__":
    main()

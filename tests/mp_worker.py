"""Worker for the 2-process distributed test (test_multiprocess.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
mesh. Every process computes the same global batch, feeds only its local
slice through ``shard_batch`` (make_array_from_process_local_data), runs one
jitted DP train step, and prints the replicated loss — the parent asserts
both processes agree (proving the global batch was assembled correctly).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

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


if __name__ == "__main__":
    main()

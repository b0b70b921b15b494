"""SPMD correctness: the 8-device data-parallel step must match the
single-device step numerically (same rngs, same global batch)."""

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.data.synthetic import word_batch
from syncvsr_tpu.engine import build_train_step, create_train_state
from syncvsr_tpu.models import build_model
from syncvsr_tpu.parallel import shard_batch
from tests.test_word_model import tiny_landmark_config


def test_mesh_step_matches_single_device(mesh8):
    config = tiny_landmark_config()
    model = build_model(config)
    batch = word_batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state_a = create_train_state(config, model, jb)
    state_b = create_train_state(config, model, jb)

    step_single = build_train_step(mesh=None, donate=False)
    step_mesh = build_train_step(mesh8, donate=False)

    for i in range(3):
        state_a, ma = step_single(state_a, jb)
        state_b, mb = step_mesh(state_b, shard_batch(mesh8, batch))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tensor_parallel_matches_dp(mesh8):
    """A (data=4, model=2) mesh with big matmuls sharded on the model axis
    must reproduce the pure-DP numerics."""
    from syncvsr_tpu.parallel import create_mesh, shard_state

    config = tiny_landmark_config()
    model = build_model(config)
    batch = word_batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state_dp = create_train_state(config, model, jb)
    state_tp = create_train_state(config, model, jb)

    mesh_tp = create_mesh(data=4, model=2)
    step_dp = build_train_step(mesh8, donate=False)
    step_tp = build_train_step(mesh_tp, donate=False)

    state_tp = shard_state(mesh_tp, state_tp, min_dim=16)
    # confirm something is actually sharded on the model axis
    sharded = [x for x in jax.tree_util.tree_leaves(state_tp.params)
               if hasattr(x, "sharding") and "model" in str(x.sharding.spec)]
    assert sharded, "no parameter picked up a model-axis sharding"

    for _ in range(3):
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh8, batch))
        state_tp, m_tp = step_tp(state_tp, shard_batch(mesh_tp, batch))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fsdp_matches_dp(mesh8):
    """ZeRO/FSDP: params + Adam moments scattered over the data axis must
    reproduce pure-DP numerics (XLA all-gathers weights at use and
    reduce-scatters grads — same math, different residency)."""
    from syncvsr_tpu.parallel import shard_state

    config = tiny_landmark_config()
    model = build_model(config)
    batch = word_batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state_dp = create_train_state(config, model, jb)
    state_fs = create_train_state(config, model, jb)
    state_fs = shard_state(mesh8, state_fs, fsdp=True, fsdp_min_size=256)

    # params AND both Adam moment trees must actually be scattered
    def n_scattered(tree):
        return sum(1 for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "sharding") and "data" in str(x.sharding.spec))
    assert n_scattered(state_fs.params) > 0
    assert n_scattered(state_fs.opt_state) >= 2 * n_scattered(state_fs.params)

    step_dp = build_train_step(mesh8, donate=False)
    step_fs = build_train_step(mesh8, donate=False, fsdp=True)
    for _ in range(3):
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh8, batch))
        state_fs, m_fs = step_fs(state_fs, shard_batch(mesh8, batch))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # the updated state must STAY scattered (no silent re-replication)
    assert n_scattered(state_fs.params) > 0


def test_fsdp_composes_with_tensor_parallel(mesh8):
    """(data=4, model=2) + fsdp: a leaf can carry BOTH axes (model on its
    trailing dim, data on another); numerics must still match DP."""
    from syncvsr_tpu.parallel import create_mesh, shard_state, state_shardings

    config = tiny_landmark_config()
    model = build_model(config)
    batch = word_batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state_dp = create_train_state(config, model, jb)
    state_mx = create_train_state(config, model, jb)
    mesh_mx = create_mesh(data=4, model=2)
    sh = state_shardings(mesh_mx, state_mx, min_dim=16, fsdp=True,
                         fsdp_min_size=256)
    both = [s for s in jax.tree_util.tree_leaves(sh)
            if "model" in str(s.spec) and "data" in str(s.spec)]
    assert both, "no leaf carries model and data axes together"
    state_mx = shard_state(mesh_mx, state_mx, min_dim=16, fsdp=True,
                           fsdp_min_size=256)

    step_dp = build_train_step(mesh8, donate=False)
    step_mx = build_train_step(mesh_mx, donate=False, fsdp=True)
    for _ in range(2):
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh8, batch))
        state_mx, m_mx = step_mx(state_mx, shard_batch(mesh_mx, batch))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_mx["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_mx.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_sharded_batched_decode_matches_single_device(mesh8):
    """make_batched_beam_decoder(mesh=...) shards the bucket over the data
    axis; hypotheses and scores must match the unsharded program exactly."""
    from syncvsr_tpu.decode import BeamSearchConfig
    from syncvsr_tpu.decode.api import make_batched_beam_decoder
    from tests.test_sentence_model import tiny_batch, tiny_sentence_config

    config = tiny_sentence_config()
    model = build_model(config)
    batch = tiny_batch(config, b=8, t=10, seed=5)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(config, model, jb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cfg = BeamSearchConfig(beam_size=5, ctc_weight=0.1)

    plain = make_batched_beam_decoder(model, variables, cfg, max_len=10)
    sharded = make_batched_beam_decoder(model, variables, cfg, max_len=10,
                                        mesh=mesh8)
    toks_p, lens_p, scores_p = plain(jb["videos"], jb["lengths"])
    toks_s, lens_s, scores_s = sharded(jb["videos"], jb["lengths"])
    np.testing.assert_array_equal(np.asarray(lens_p), np.asarray(lens_s))
    np.testing.assert_array_equal(np.asarray(toks_p), np.asarray(toks_s))
    np.testing.assert_allclose(np.asarray(scores_p), np.asarray(scores_s),
                               rtol=1e-5)


def test_sequence_parallel_matches_dp(mesh8):
    """A (data=4, seq=2) mesh shards clip time across chips (sequence
    parallelism for long LRS buckets); GSPMD must reproduce the pure-DP
    numerics — attention K/V gathers, conformer-conv halo exchange and the
    cross-shard CTC/BN reductions are semantics-preserving."""
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.parallel import batch_shardings, create_mesh

    from tests.test_sentence_model import tiny_sentence_config

    config = tiny_sentence_config()
    model = build_model(config)
    batch = sentence_batch(config, num_frames=16)  # 16 % seq(2) == 0
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state_dp = create_train_state(config, model, jb)
    state_sp = create_train_state(config, model, jb)

    mesh_sp = create_mesh(data=4, seq=2)
    sh = batch_shardings(mesh_sp, batch)
    assert "seq" in str(sh["videos"].spec)        # time axis really sharded
    assert "seq" not in str(sh["labels"].spec)    # label length is not time

    step_dp = build_train_step(mesh8, donate=False)
    step_sp = build_train_step(mesh_sp, donate=False)
    for _ in range(2):
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh8, batch))
        state_sp, m_sp = step_sp(state_sp, shard_batch(mesh_sp, batch))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sp["loss"]),
                               rtol=1e-5)
    # atol 1e-5: re-sharding time re-associates f32 reductions (CTC scan,
    # attention rows), so near-zero leaves (fresh biases ~1e-7 after 2 adam
    # steps) carry O(1e-6) absolute noise where rtol is meaningless
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seq_sharding_falls_back_on_indivisible_time(mesh8):
    """LRW's T=29 doesn't divide a seq axis: batch_shardings must fall back
    to data-only sharding (and the audio_tokens length T*align+4 never takes
    the seq axis) instead of erroring."""
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.parallel import batch_shardings, create_mesh

    from tests.test_sentence_model import tiny_sentence_config

    config = tiny_sentence_config()
    mesh_sp = create_mesh(data=4, seq=2)
    odd = sentence_batch(config, num_frames=13)   # 13 % 2 != 0
    sh = batch_shardings(mesh_sp, odd)
    assert all("seq" not in str(s.spec) for s in sh.values())
    even = sentence_batch(config, num_frames=16)
    sh = batch_shardings(mesh_sp, even)
    assert "seq" in str(sh["videos"].spec)
    assert "seq" not in str(sh["audio_tokens"].spec)

"""Atomic + async checkpointing (utils/checkpoint.py)."""

import os

import numpy as np

from syncvsr_tpu.utils import checkpoint as ckpt


def test_save_msgpack_is_atomic(tmp_path):
    path = str(tmp_path / "x.msgpack")
    ckpt.save_msgpack(path, {"a": np.arange(5)})
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")
    got = ckpt.load_msgpack(path)
    np.testing.assert_array_equal(got["a"], np.arange(5))


def test_async_checkpointer_roundtrip(tmp_path):
    class FakeState:
        step = np.int32(7)
        params = {"w": np.ones((3, 3), np.float32)}
        opt_state = ()
        batch_stats = {}
        mixup_rng = np.zeros(2, np.uint32)
        dropout_rng = np.zeros(2, np.uint32)

    saver = ckpt.AsyncCheckpointer()
    path = saver.save(str(tmp_path), FakeState(), step=7, keep=2)
    saver.wait()
    assert os.path.exists(path)
    payload = ckpt.load_msgpack(path)
    assert int(payload["step"]) == 7
    np.testing.assert_array_equal(payload["params"]["w"], np.ones((3, 3)))

    # donation safety: the device buffer is copied to host synchronously in
    # save(), so replacing/deleting it afterwards cannot corrupt the pending
    # write (numpy in-place mutation is out of contract — real states hold
    # jax.Arrays, which device_get copies)
    import jax.numpy as jnp

    st = FakeState()
    st.params = {"w": jnp.ones((3, 3), jnp.float32)}
    p2 = saver.save(str(tmp_path), st, step=8, keep=2)
    st.params["w"] = jnp.zeros((3, 3), jnp.float32)
    saver.wait()
    np.testing.assert_array_equal(
        ckpt.load_msgpack(p2)["params"]["w"], np.ones((3, 3)))

    # keep=2 pruning across successive saves
    for s in (9, 10, 11):
        saver.save(str(tmp_path), FakeState(), step=s, keep=2)
    saver.wait()
    files = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert files == ["step_10.msgpack", "step_11.msgpack"]

    saver.save_msgpack(str(tmp_path / "best.msgpack"), {"b": np.eye(2)})
    saver.wait()
    np.testing.assert_array_equal(
        ckpt.load_msgpack(str(tmp_path / "best.msgpack"))["b"], np.eye(2))

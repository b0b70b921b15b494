"""Compile-and-time the full-scale LRS3 decode and the 1800-frame bucket.

Answers the two open feasibility questions (VERDICT r1 item 7):
  (a) beam search at real scale — full lrs3 model (conformer 12L x 768d,
      decoder 6L), beam 40, vocab 5049, T=500: sec/utterance on this chip;
  (b) the 1800-frame train bucket with model.remat=True: does one chip
      compile and execute it (reference trains max_frames=1800,
      LRS/video/config/lrs3.yaml:8).

Note on (a): random-weight models never emit eos (the CTC prefix score
penalizes it), so the beam loop runs all max_len steps — the WORST case.
With a trained model the while_loop early exit (beam_search.py) stops the
sequential loop shortly after the transcript ends (~19x faster on a toy
whose transcript is 18 of 400 steps).

Usage: python -m syncvsr_tpu.tools.bench_decode [beam|train1800|greedy] ...
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _model_and_state(config):
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model

    model = build_model(config)
    init = sentence_batch(config, num_frames=32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init.items()})
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, state, variables


def bench_beam(t_frames: int = 500, beam: int = 40, greedy: bool = False):
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.decode import BeamSearchConfig
    from syncvsr_tpu.decode.api import make_beam_decoder, make_greedy_ctc_decoder

    config = lrs3_config().override(**{"data.batch_size": 1})
    model, state, variables = _model_and_state(config)

    videos = jnp.asarray(
        np.random.RandomState(0).randn(1, t_frames, 96, 96, 1), jnp.float32)
    length = jnp.asarray(t_frames, jnp.int32)

    if greedy:
        decode = make_greedy_ctc_decoder(model, variables)
        t0 = time.perf_counter()
        toks, lens = decode(videos, length[None])
        int(np.asarray(lens)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            toks, lens = decode(videos, length[None])
        int(np.asarray(lens)[0])
        dt = (time.perf_counter() - t0) / 3
        print(json.dumps({"mode": "greedy", "t_frames": t_frames,
                          "compile_s": round(compile_s, 1),
                          "sec_per_utt": round(dt, 3)}))
        return

    decode = make_beam_decoder(
        model, variables,
        BeamSearchConfig(beam_size=beam, ctc_weight=config.model.mtlalpha))
    t0 = time.perf_counter()
    toks, n, score = decode(videos, length)
    float(score)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        toks, n, score = decode(videos, length)
    float(score)
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({"mode": "beam", "beam": beam, "t_frames": t_frames,
                      "vocab": config.model.labels,
                      "compile_s": round(compile_s, 1),
                      "sec_per_utt": round(dt, 3)}))


def bench_train1800(batch_size: int = 2):
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_sentence_aug

    config = lrs3_config().override(**{
        "data.batch_size": batch_size, "model.remat": True})
    model = build_model(config)
    batch = sentence_batch(config, num_frames=1800, label_len=128)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in batch.items()})
    step = build_train_step(mesh=None, donate=True,
                            aug_fn=build_sentence_aug(config.data))
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    t0 = time.perf_counter()
    state, metrics = step(state, device_batch)
    loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 3
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {"peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2)}
    except Exception:
        pass
    print(json.dumps({"mode": "train1800", "batch_size": batch_size,
                      "remat": True, "loss_finite": bool(np.isfinite(loss)),
                      "compile_s": round(compile_s, 1),
                      "sec_per_step": round(dt, 3),
                      "frames_per_sec": round(batch_size * 1800 / dt, 1),
                      **mem}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "beam"
    if mode == "beam":
        bench_beam(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
    elif mode == "greedy":
        bench_beam(int(sys.argv[2]) if len(sys.argv) > 2 else 500, greedy=True)
    elif mode == "train1800":
        bench_train1800(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        raise SystemExit(f"unknown mode {mode}")

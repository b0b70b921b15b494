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

from syncvsr_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
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


def bench_testset(beam: int = 40, bs: int = 8,
                  buckets=(160, 320, 500), batches_per_bucket: int = 1,
                  tiny: bool = False):
    """Full test-set decode wall-clock (VERDICT r2 item 7): the same bucketed
    batches decoded three ways —
      per_utt:    one compiled single-utterance decoder per length, rows
                  decoded sequentially (the reference's loop shape,
                  LRS/video/lightning.py:114-129 / batch_beam_search.py)
      per_bucket: one vmap'd decoder compile per bucket length
      padded:     ONE compile at the max bucket, shorter buckets padded
                  (evaluate.py decode_pad=max)
    Random weights mean no early exit: every number is the worst case."""
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.decode import BeamSearchConfig
    from syncvsr_tpu.decode.api import (
        make_batched_beam_decoder,
        make_beam_decoder,
    )

    config = lrs3_config().override(**{"data.batch_size": bs})
    crop = 96
    if tiny:  # CPU smoke of the harness itself
        config = config.override(**{
            "model.encoder.layers": 1, "model.encoder.dim": 16,
            "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
            "model.decoder.layers": 1, "model.decoder.dim": 16,
            "model.decoder.heads": 2, "model.decoder.hidden": 32,
            "model.labels": 13, "model.codec.audio_vocab_size": 7,
            "model.dtype": "float32", "model.frontend.stem_channels": 8,
            "model.frontend.resnet_width": 8, "model.frontend.out_dim": 16,
            "data.crop_size": 16})
        crop = 16
    model, state, variables = _model_and_state(config)
    bs_config = BeamSearchConfig(beam_size=beam,
                                 ctc_weight=config.model.mtlalpha)
    rng = np.random.RandomState(0)
    batches = []
    for t in buckets:
        for _ in range(batches_per_bucket):
            batches.append((t, rng.randn(bs, t, crop, crop, 1).astype(np.float32),
                            np.full((bs,), t, np.int32)))
    n_utts = len(batches) * bs

    out = {"mode": "testset", "beam": beam, "bs": bs,
           "buckets": list(buckets), "n_utts": n_utts}

    def sync(x):
        return float(np.asarray(x).reshape(-1)[0])

    # ---- padded single compile --------------------------------------------
    t_max = max(buckets)
    t0 = time.perf_counter()
    dec = make_batched_beam_decoder(model, variables, bs_config, max_len=t_max)
    for t, v, lens in batches:
        if t < t_max:
            v = np.pad(v, [(0, 0), (0, t_max - t), (0, 0), (0, 0), (0, 0)])
        sync(dec(jnp.asarray(v), jnp.asarray(lens))[2])
    out["padded"] = {"compiles": 1,
                     "wall_s": round(time.perf_counter() - t0, 1)}
    out["padded"]["sec_per_utt"] = round(out["padded"]["wall_s"] / n_utts, 3)

    # ---- one compile per bucket -------------------------------------------
    t0 = time.perf_counter()
    decs = {}
    for t, v, lens in batches:
        if t not in decs:
            decs[t] = make_batched_beam_decoder(model, variables, bs_config,
                                                max_len=t)
        sync(decs[t](jnp.asarray(v), jnp.asarray(lens))[2])
    out["per_bucket"] = {"compiles": len(decs),
                         "wall_s": round(time.perf_counter() - t0, 1)}
    out["per_bucket"]["sec_per_utt"] = round(
        out["per_bucket"]["wall_s"] / n_utts, 3)

    # ---- per-utterance (2 rows per bucket as a sample) --------------------
    t0 = time.perf_counter()
    n_single = 0
    dec1 = {}
    for t, v, lens in batches[:len(buckets)]:
        if t not in dec1:
            dec1[t] = make_beam_decoder(model, variables, bs_config)
        for i in range(2):
            sync(dec1[t](jnp.asarray(v[i:i + 1]), jnp.asarray(lens[i]))[2])
            n_single += 1
    out["per_utt_sample"] = {
        "n": n_single, "wall_s": round(time.perf_counter() - t0, 1),
        "sec_per_utt": round((time.perf_counter() - t0) / n_single, 3)}
    print(json.dumps(out))


def bench_trained(t_frames: int = 500, train_frames: int = 160,
                  steps: int = 400, beam: int = 40, tiny: bool = False):
    """Measure the while_loop early exit with ACTUALLY trained weights
    (VERDICT r3 weak #5: the 10-20x claim rested on a toy). Overfits the
    full-scale lrs3 model on one synthetic utterance (fixed video ->
    ~20-token transcript), then decodes it through the SAME compiled
    T=t_frames program twice: with the random init (no eos -> all t_frames
    sequential steps, the worst case) and with the trained weights (eos wins
    shortly after the transcript ends -> early exit)."""
    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.decode import BeamSearchConfig
    from syncvsr_tpu.decode.api import make_beam_decoder
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model

    train_frames = min(train_frames, t_frames)
    # sync head off (memorizing one clip only needs ctc+att); short warmup +
    # flat schedule so the overfit actually trains (the preset's 25k-step
    # warmup keeps lr ~0 for a few hundred steps)
    config = lrs3_config().override(**{
        "data.batch_size": 1, "model.sync_lambda": 0.0,
        "optim.lr": 3e-4, "optim.warmup_steps": 20,
        "optim.total_steps": max(steps * 10, 1000),
        "optim.clip_norm": 1.0})
    crop = 96
    if tiny:  # CPU smoke of the harness
        config = config.override(**{
            "model.encoder.layers": 1, "model.encoder.dim": 32,
            "model.encoder.heads": 2, "model.encoder.conv_kernel": 7,
            "model.decoder.layers": 1, "model.decoder.dim": 32,
            "model.decoder.heads": 2, "model.decoder.hidden": 64,
            "model.labels": 33, "model.dtype": "float32",
            "model.frontend.stem_channels": 8,
            "model.frontend.resnet_width": 8,
            "data.crop_size": 16})
        crop = 16
    model = build_model(config)

    rng = np.random.RandomState(0)
    label_len = 20
    batch = sentence_batch(config, 1, num_frames=train_frames,
                           label_len=label_len)
    batch["videos"] = rng.randn(1, train_frames, crop, crop, 1
                                ).astype(np.float32)
    batch["labels"] = np.concatenate(
        [rng.randint(1, config.model.labels - 1, (1, label_len)),
         np.full((1, 4), -1, np.int32)], axis=1).astype(np.int32)
    batch["lengths"] = np.full((1,), train_frames, np.int32)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_train_state(config, model, device_batch)
    init_variables = {"params": state.params, "batch_stats": state.batch_stats}
    step = build_train_step(mesh=None, donate=False)
    for i in range(steps):
        state, metrics = step(state, device_batch)
        if i % 100 == 0 or i == steps - 1:
            print(f"# overfit step {i}: loss {float(metrics['loss']):.3f} "
                  f"dec_acc {float(metrics.get('decoder_acc', np.nan)):.3f}",
                  flush=True)
    trained_variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

    bs_config = BeamSearchConfig(beam_size=beam,
                                 ctc_weight=config.model.mtlalpha)
    videos = jnp.asarray(np.pad(batch["videos"],
                                [(0, 0), (0, t_frames - train_frames),
                                 (0, 0), (0, 0), (0, 0)]))
    length = jnp.asarray(train_frames, jnp.int32)

    out = {"mode": "trained", "beam": beam, "t_frames": t_frames,
           "train_frames": train_frames, "transcript_len": label_len,
           "overfit_steps": steps}
    for name, variables in (("worst_case_random", init_variables),
                            ("trained", trained_variables)):
        # worst case = full sequential loop (no early exit): random weights
        # on small models can spuriously early-exit, which would understate it
        decode = make_beam_decoder(model, variables, bs_config,
                                   early_exit=(name == "trained"))
        toks, n, score = decode(videos, length)   # compile + first run
        float(score)
        t0 = time.perf_counter()
        for _ in range(3):
            toks, n, score = decode(videos, length)
        float(score)
        hyp = [int(x) for x in np.asarray(toks)[: int(n)]]
        out[name] = {"sec_per_utt": round((time.perf_counter() - t0) / 3, 3),
                     "hyp_len": int(n)}
        if name == "trained":
            want = [int(x) for x in batch["labels"][0][:label_len]]
            out[name]["exact_match"] = hyp == want
    out["early_exit_speedup"] = round(
        out["worst_case_random"]["sec_per_utt"] / out["trained"]["sec_per_utt"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "beam"
    if mode == "beam":
        bench_beam(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
    elif mode == "greedy":
        bench_beam(int(sys.argv[2]) if len(sys.argv) > 2 else 500, greedy=True)
    elif mode == "train1800":
        bench_train1800(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif mode == "testset":
        bench_testset(beam=int(sys.argv[2]) if len(sys.argv) > 2 else 40,
                      bs=int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    elif mode == "trained":
        bench_trained(t_frames=int(sys.argv[2]) if len(sys.argv) > 2 else 500,
                      steps=int(sys.argv[3]) if len(sys.argv) > 3 else 400,
                      tiny=len(sys.argv) > 4 and sys.argv[4] == "tiny")
    else:
        raise SystemExit(f"unknown mode {mode}")

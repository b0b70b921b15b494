"""Unified training driver for every workload.

Usage:
    python -m syncvsr_tpu.train preset=lrw_landmark data.root=/data/LRW \
        optim.lr=1e-3 train.epochs=10
    python -m syncvsr_tpu.train config=path/to/config.json [overrides...]

Replaces the reference's three drivers (LRW/video/src/train.py,
LRW/landmark/src/main.py, LRS/video/main.py) with one loop over the
jit+Mesh engine: per-host loaders feed local shards, metrics aggregate via an
AverageMeter, periodic eval tracks the monitored metric, and checkpoints save
the full TrainState (best + latest, resumable).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp

from syncvsr_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from syncvsr_tpu.config import PRESETS, Config, parse_cli_overrides
from syncvsr_tpu.data.factory import build_loaders
from syncvsr_tpu.engine import build_eval_step, build_train_step, create_train_state
from syncvsr_tpu.engine.state import param_count
from syncvsr_tpu.models import build_model
from syncvsr_tpu.ops.image import (
    build_eval_transform,
    build_sentence_aug,
    build_sentence_eval_transform,
    build_word_aug,
)
from syncvsr_tpu.parallel import create_mesh, shard_batch, shard_state
from syncvsr_tpu.utils import checkpoint as ckpt
from syncvsr_tpu.utils.metrics import (
    AverageMeter,
    MetricLogger,
    split_eval_weights,
)
from syncvsr_tpu.utils.profiling import StepTimer


def load_config(argv) -> Config:
    overrides = parse_cli_overrides(argv)
    preset = overrides.pop("preset", None)
    config_path = overrides.pop("config", None)
    if config_path:
        config = Config.from_dict(json.load(open(config_path)))
    elif preset:
        config = PRESETS[preset]()
    else:
        config = Config()
    return config.override(**overrides) if overrides else config


def monitored_metric(config: Config) -> str:
    # val accuracy for word-level (train.py:19-21), decoder acc for sentence
    # (LRS/video/main.py:21-23)
    return "acc1" if config.model.task == "word" else "decoder_acc"


def train(config: Config) -> Dict[str, float]:
    if config.train.distributed:
        # multi-host pods: same call the reference makes at import
        # (LRW/landmark/src/main.py:4-8)
        jax.distributed.initialize()
    mesh = create_mesh(config.mesh.data, config.mesh.model,
                       config.mesh.seq)
    model = build_model(config)
    train_loader, eval_loader = build_loaders(config)

    example = next(iter(train_loader))
    if config.model.task == "word":
        eval_transform = build_eval_transform(config.data)
        aug_fn = build_word_aug(config.data)
    else:
        eval_transform = build_sentence_eval_transform(config.data,
                                                       config.data.dataset)
        aug_fn = build_sentence_aug(config.data)
    tokenize_fn = None
    if config.model.codec.in_step:
        # frozen vq-wav2vec quantization inside the compiled step (reference
        # e2e_asr_transformer.py:167-174); codec weights are closure
        # constants, never touched by the optimizer
        from syncvsr_tpu.ops.codec import load_vq_codec, make_instep_tokenizer

        codec_params, geom = load_vq_codec(config.model.codec.ckpt)
        tokenize_fn = jax.jit(make_instep_tokenizer(
            codec_params, alignment=config.model.codec.audio_alignment,
            strides=geom["strides"]))
        base_aug = aug_fn
        aug_fn = (lambda rng, b: base_aug(rng, tokenize_fn(b))) \
            if base_aug is not None else (lambda rng, b: tokenize_fn(b))
    init_example = eval_transform(example)
    if tokenize_fn is not None and "audio" in init_example:
        init_example = jax.device_get(tokenize_fn(init_example))
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init_example.items()})
    if jax.process_index() == 0:
        print(f"[train] params: {param_count(state.params) / 1e6:.2f}M, "
              f"mesh: {mesh}, devices: {len(jax.devices())}")
        if config.train.tabulate:
            # model summary dump at init (reference training.py:163)
            print(model.tabulate(
                {"params": jax.random.PRNGKey(0)},
                **{k: jnp.asarray(v) for k, v in init_example.items()},
                det=True, depth=2))

    if config.train.pretrained:
        pre = ckpt.load_msgpack(config.train.pretrained)
        pre = pre.get("params", pre)
        new_params, _ = ckpt.partial_load(state.params, pre)
        state = state.replace(params=new_params)
    start_step = 0
    latest = ckpt.latest_checkpoint(config.train.ckpt_dir) \
        if config.train.resume == "auto" else (config.train.resume or None)
    if latest and os.path.exists(latest):
        state = ckpt.restore_train_state(latest, state)
        start_step = int(state.step)
        print(f"[train] resumed from {latest} @ step {start_step}")

    if config.mesh.fsdp:
        # ZeRO-scatter params + Adam moments over the data axis BEFORE the
        # first step so the committed layout (not a replicated copy) is what
        # the jit sees; restore/pretrained loads above land replicated and
        # this reshards them once.
        state = shard_state(mesh, state, fsdp=True,
                            fsdp_min_size=config.mesh.fsdp_min_size)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(config.train.scoped_vmem_kib)}
            if config.train.scoped_vmem_kib and
            jax.default_backend() in ("tpu", "axon") else None)
    train_step = build_train_step(mesh, donate=config.train.donate,
                                  fsdp=config.mesh.fsdp,
                                  aug_fn=aug_fn, compiler_options=opts)
    eval_step = build_eval_step(mesh, fsdp=config.mesh.fsdp)

    os.makedirs(config.train.ckpt_dir, exist_ok=True)
    logger = MetricLogger(path=os.path.join(config.train.ckpt_dir, "metrics.jsonl")
                          if jax.process_index() == 0 else None,
                          use_wandb=config.train.wandb, name=config.name,
                          config=config.to_dict())
    meter = AverageMeter()
    monitor = monitored_metric(config)
    best = -np.inf
    # serialization + disk IO overlap training; only the host copy is sync
    saver = ckpt.AsyncCheckpointer()
    step = start_step
    t_start = time.time()
    timer = StepTimer()
    # optional jax trace capture over a step window ("start:stop")
    prof_range = None
    if config.train.profile_steps:
        a, b = config.train.profile_steps.split(":")
        prof_range = (int(a), int(b))

    def run_eval() -> Dict[str, float]:
        em = AverageMeter()
        for batch in eval_loader:
            batch = eval_transform(batch)
            if tokenize_fn is not None and "audio" in batch:
                batch = tokenize_fn(batch)
            m = jax.device_get(eval_step(state, shard_batch(mesh, batch)))
            m, w = split_eval_weights(m)
            em.update(m, weight=w)
        return em.summary("val/")

    # metrics accounting lags one step: device_get(metrics) blocks until the
    # step finishes, and reading step N only after dispatching step N+1 keeps
    # a step in flight — on the relay backend each dispatch carries network
    # RTT that would otherwise serialize with the host loader
    pending_metrics = None
    for epoch in range(config.train.epochs):
        for batch in train_loader:
            if prof_range and step == prof_range[0]:
                jax.profiler.start_trace(config.train.profile_dir)
            with timer:
                state, metrics = train_step(state, shard_batch(mesh, batch))
                if pending_metrics is not None:
                    meter.update(jax.device_get(pending_metrics))
                pending_metrics = metrics
            step += 1
            if prof_range and step == prof_range[1]:
                jax.profiler.stop_trace()
                print(f"[trace] wrote {config.train.profile_dir}")
            if step % config.train.log_every == 0:
                summary = meter.summary("train/")
                summary["train/steps_per_sec"] = config.train.log_every / max(
                    time.time() - t_start, 1e-6)
                if timer.avg_ms:
                    summary["train/step_ms_ema"] = timer.avg_ms
                t_start = time.time()
                logger.log(summary, step)
                if jax.process_index() == 0:
                    print(f"[step {step}] " + " ".join(
                        f"{k.split('/')[-1]}={v:.4f}" for k, v in summary.items()))
            if step % config.train.eval_every == 0:
                val = run_eval()
                logger.log(val, step)
                if jax.process_index() == 0:
                    print(f"[eval {step}] " + " ".join(
                        f"{k.split('/')[-1]}={v:.4f}" for k, v in val.items()))
                # best-tracking runs on ALL processes (val metrics are
                # replicated, so every host takes the same branch) because
                # gather_for_save is a collective under multi-host FSDP/TP —
                # only the write itself is process-0
                if val.get(f"val/{monitor}", -np.inf) > best:
                    best = val[f"val/{monitor}"]
                    to_save = ckpt.gather_for_save(state)
                    if jax.process_index() == 0:
                        saver.save_msgpack(
                            os.path.join(config.train.ckpt_dir, "best.msgpack"),
                            {"params": jax.device_get(to_save.params),
                             "batch_stats": jax.device_get(
                                 to_save.batch_stats or {}),
                             "step": step, monitor: best})
            if step % config.train.ckpt_every == 0:
                to_save = ckpt.gather_for_save(state)
                if jax.process_index() == 0:
                    saver.save(config.train.ckpt_dir, to_save, step)
            if config.optim.total_steps and step >= config.optim.total_steps:
                break
        else:
            continue
        break

    if pending_metrics is not None:  # flush the lagged final-step metrics
        meter.update(jax.device_get(pending_metrics))
        tail = meter.summary("train/")  # partial window since the last log
        if tail:
            logger.log(tail, step)
    final = run_eval()
    logger.log(final, step)
    to_save = ckpt.gather_for_save(state)
    if jax.process_index() == 0:
        saver.save(config.train.ckpt_dir, to_save, step)
    saver.wait()
    logger.close()
    return final


def main():
    config = load_config(sys.argv[1:])
    final = train(config)
    print("[done]", json.dumps(final))


if __name__ == "__main__":
    main()

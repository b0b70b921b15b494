"""A/B the train-mode BatchNorm implementations on the real accelerator.

Round-1 profile: the four per-stage BN statistics reductions cost ~26 ms of
the 116 ms LRW step, running as XLA convert+reduce fusions at ~115 GB/s.
`ops/pallas_bn.py` streams the activation once with f32 VMEM accumulators and
an analytic VJP. This tool measures both at the shapes the ResNet trunk
actually sees, plus the full LRW train step with the trunk's BN swapped.

Usage: python -m syncvsr_tpu.tools.bench_bn [micro|step]
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


def _sync(x):
    jnp.asarray(x).block_until_ready() if jax.default_backend() == "cpu" \
        else float(jnp.asarray(x).reshape(-1)[0])


def _time(fn, *args, iters=20):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench_micro():
    """Forward+backward through one BN at each ResNet stage shape (bs 96)."""
    import flax.linen as nn

    from syncvsr_tpu.ops.pallas_bn import FastBatchNorm

    # [B*T, H, W, C] activations of layer1..4 at bs 96, T 29, 96x96 crops
    shapes = [(96 * 29, 24, 24, 64), (96 * 29, 12, 12, 128),
              (96 * 29, 6, 6, 256), (96 * 29, 3, 3, 512)]
    rng = np.random.RandomState(0)
    results = []
    for shape in shapes:
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

        def run(mod):
            v = mod.init(jax.random.PRNGKey(0), x)

            def loss(params, x):
                y, _ = mod.apply({"params": params, **{k: v[k] for k in v
                                                       if k != "params"}},
                                 x, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            return _time(lambda: g(v["params"], x))

        t_flax = run(nn.BatchNorm(use_running_average=False, momentum=0.9,
                                  dtype=jnp.bfloat16))
        t_fast = run(FastBatchNorm(use_running_average=False, momentum=0.9,
                                   dtype=jnp.bfloat16))
        gb = 2 * x.size * 2 / 2 ** 30  # fwd reads x; bwd reads g(+x) — lower bound
        results.append({"shape": list(shape),
                        "flax_ms": round(t_flax * 1e3, 2),
                        "pallas_ms": round(t_fast * 1e3, 2),
                        "speedup": round(t_flax / t_fast, 2),
                        "min_gb_moved": round(gb, 2)})
    print(json.dumps(results, indent=1))


def bench_step(fast: bool):
    """Full LRW train step. ``fast`` (the default since commit 80db879) uses
    the trunk's FastBatchNorm; ``not fast`` swaps the trunk back to autodiff
    nn.BatchNorm — the baseline this tool's A/B originally justified the
    default against."""
    import flax.linen as nn

    if not fast:
        from syncvsr_tpu.models import resnet

        def flax_bn(train, dtype, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=dtype, param_dtype=jnp.float32,
                                name=name)

        resnet._bn = flax_bn  # type: ignore[assignment]

    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_word_aug

    batch_size = 96
    config = lrw_video_config().override(**{"data.batch_size": batch_size})
    model = build_model(config)
    rng = np.random.RandomState(0)
    raw = word_batch(config, batch_size)
    h = config.data.crop_size
    w = int(h * 112 / 96)
    raw["inputs"] = rng.randint(0, 256, (batch_size, 29, h, w, 1)).astype(np.uint8)
    init_batch = dict(raw)
    init_batch["inputs"] = jnp.zeros((batch_size, 29, h, h, 1), jnp.float32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init_batch.items()})
    step = build_train_step(mesh=None, donate=True,
                            aug_fn=build_word_aug(config.data))
    device_batch = jax.device_put({k: jnp.asarray(v) for k, v in raw.items()})
    for _ in range(3):
        state, metrics = step(state, device_batch)
    float(metrics["loss"])
    n = 10
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, device_batch)
        float(metrics["loss"])
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"mode": "step", "fast_bn": fast,
                      "ms_per_step": round(dt / n * 1e3, 2),
                      "frames_per_sec": round(batch_size * 29 * n / dt, 1)}))


_AB_ENVS = {
    "default": {},
    "2h": {"SYNCVSR_BN_STATS_STRIDE": "2h"},
    "2": {"SYNCVSR_BN_STATS_STRIDE": "2"},
    "phys": {"SYNCVSR_BN_STATS_PHYS": "1"},
    "mxu": {"SYNCVSR_BN_STATS_MXU": "1"},
    "fold64": {"SYNCVSR_BN_FOLD64": "1"},
    "mpr": {"SYNCVSR_MAXPOOL_RECOMPUTE": "1"},
    # architecture-level variants (config overrides, model rebuilt):
    # stem128 widens the conv3d stem to 128 channels so the stem-BN statistics
    # reduction reads full 128-element lanes (the [.., C=64]-minor layout
    # half-wastes them — 11 ms of the 96 ms lrs3 step). Breaks released-ckpt
    # parity; measurement-only unless it wins big.
    "stem128": {},
}

_AB_CONFIGS = {
    "stem128": {"model.frontend.stem_channels": 128},
}

_AB_ALL_KEYS = sorted({k for env in _AB_ENVS.values() for k in env})


def bench_ab(workload: str, variants: list[str]):
    """Time the full train step under several BN-stats levers in ONE process
    (each relay session costs ~80 s startup; the env levers are read at trace
    time, so re-building the step after setting os.environ recompiles with
    the variant active).

    Usage: python -m syncvsr_tpu.tools.bench_bn ab lrs3|lrw default,2h,phys
    """
    import os

    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.data.synthetic import sentence_batch, word_batch

    rng = np.random.RandomState(0)
    if workload == "lrs3":
        from syncvsr_tpu.config import lrs3_config
        from syncvsr_tpu.ops.image import build_sentence_aug

        bs, frames = 8, 160
        config = lrs3_config().override(**{"data.batch_size": bs})
        raw = sentence_batch(config, bs, num_frames=frames, label_len=48)
        raw["videos"] = rng.randint(0, 256, (bs, frames, 128, 128, 1)
                                    ).astype(np.uint8)
        init = dict(raw)
        h = config.data.crop_size
        init["videos"] = jnp.zeros((bs, frames, h, h, 1), jnp.float32)
        aug = build_sentence_aug(config.data)
    else:
        from syncvsr_tpu.config import lrw_video_config
        from syncvsr_tpu.ops.image import build_word_aug

        bs, frames = 96, 29
        config = lrw_video_config().override(**{"data.batch_size": bs})
        raw = word_batch(config, bs)
        h = config.data.crop_size
        raw["inputs"] = rng.randint(
            0, 256, (bs, frames, h, int(h * 112 / 96), 1)).astype(np.uint8)
        init = dict(raw)
        init["inputs"] = jnp.zeros((bs, frames, h, h, 1), jnp.float32)
        aug = build_word_aug(config.data)

    device_batch = jax.device_put({k: jnp.asarray(v) for k, v in raw.items()})
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(config.train.scoped_vmem_kib)}
            if config.train.scoped_vmem_kib
            and jax.default_backend() != "cpu" else None)

    for variant in variants:
        for k in _AB_ALL_KEYS:
            os.environ.pop(k, None)
        os.environ.update(_AB_ENVS[variant])
        v_config = config.override(**_AB_CONFIGS.get(variant, {}))
        model = build_model(v_config)
        state = create_train_state(
            v_config, model, {k: jnp.asarray(v) for k, v in init.items()})
        step = build_train_step(mesh=None, donate=True, aug_fn=aug,
                                compiler_options=opts)
        for _ in range(3):
            state, metrics = step(state, device_batch)
        float(metrics["loss"])
        n, dt = 10, float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = step(state, device_batch)
            float(metrics["loss"])
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({"workload": workload, "variant": variant,
                          "ms_per_step": round(dt / n * 1e3, 2),
                          "frames_per_sec": round(bs * frames * n / dt, 1)}),
              flush=True)
        del state, step


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    if mode == "micro":
        bench_micro()
    elif mode == "step":
        bench_step(fast=len(sys.argv) > 2 and sys.argv[2] == "fast")
    elif mode == "ab":
        bench_ab(sys.argv[2], sys.argv[3].split(","))
    else:
        raise SystemExit(f"unknown mode {mode}")

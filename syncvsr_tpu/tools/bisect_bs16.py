"""Bisect the lrs3 bs16 TPU-worker crash, one subgraph per relay session.

Round-3 triage (CLAUDE.md): the full lrs3 train step at bs16 x T160
deterministically kills the TPU worker ("kernel fault") while bs8 runs at
102 ms/step. Not the Pallas sync kernel, not uint8 aug, not d=768. Each
crash wedges the relay 20-40 min, so this tool runs exactly ONE variant per
invocation — run the next variant in a fresh session after the relay
recovers.

    python -m syncvsr_tpu.tools.bisect_bs16 <variant> [batch_size]

Variants (ordered by information gain):
    frontend  — conv3d stem + ResNet trunk only, fwd+bwd (sum-sq loss)
    encoder   — frontend + conformer encoder (encode), fwd+bwd
    model     — full model losses fwd+bwd, NO optimizer update, no donation
    ctc       — encode + CTC loss only, fwd+bwd (r5: model crashed, so the
    att       — encode + decoder CE only, fwd+bwd   fault is in one of the
    sync      — encode + sync head only, fwd+bwd    three loss branches)
    dec       — encode + decoder fwd+bwd, sum-sq on logits (att minus the KL)
    lsm       — encode + label-smoothing KL on ctc_head logits (no decoder)
    att_barrier — att with an optimization_barrier between decoder logits
                and the KL (fusion-boundary probe / candidate workaround)
    modelmetrics — model losses fwd+bwd AND all metric outputs kept live
                (model returns only the loss, so decoder_acc's argmax over
                the [16, 49, 5049] decoder logits gets DCE'd there; the
                full step keeps it)
    opt       — hand-rolled full step: aug + value_and_grad + rng splits +
                apply_gradients (clip + AdamW), NO current_lr/grad_norm
                metrics, no donation (splits optimizer-update faults from
                the lr/grad-norm metric plumbing)
    full      — the complete train step (known crasher at bs16; control)
    bs12      — full step at batch 12 (probe between the good/bad sizes)

Env knobs: SYNCVSR_LSM_V2=1 selects the reassociated KL (fault-#1 fix);
SYNCVSR_BISECT_NO_DONATE=1 makes full/bs12 build with donate=False;
SYNCVSR_BISECT_STALE_BN=1 makes `opt` write back the OLD batch_stats (the
BN EMA update gets DCE'd — modelmetrics passed with exactly that, so this
splits the BN-stats-as-outputs materialization from the optimizer chain);
SYNCVSR_BISECT_SGD=1 makes `opt` apply plain SGD instead of clip+AdamW.

TRIAGE COMPLETE (2026-08-19) — full ledger and conclusions in
docs/bs16_triage.md. Fault #1: XLA:TPU codegen for the logq-form
label-smoothing-KL backward on decoder-produced logits; fixed outright by
the reassociated KL (ops/masking.py SYNCVSR_LSM_V2, att CRASH -> 160.1 ms
OK). Fault #2: ANY program that materializes full parameter updates
crashes at bs16 (even p - 1e-3*g plain SGD with stale BN and no metrics),
while the same graph with grads reduced to a scalar passes — an upstream
XLA:TPU defect, not dodgeable at the JAX level. bs12 runs the complete
production step clean (161.0 ms = 11,923 fps) but is slower per frame
than bs8 (~12.3k fps), so bs8 stays the flagship config on merit.

Success prints one JSON line with ms/step; a worker crash is the signal.
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


def _sync(tree):
    float(jax.tree_util.tree_leaves(tree)[0].astype(jnp.float32).reshape(-1)[0])


def _time_loop(fn, n=10):
    """fn() -> something syncable; warm up 3, time n."""
    for _ in range(3):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import os

    variant = sys.argv[1]
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else (
        12 if variant == "bs12" else 16)
    frames = int(os.environ.get("SYNCVSR_BISECT_FRAMES", "160"))

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.data.synthetic import sentence_batch
    from syncvsr_tpu.engine import build_train_step, create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.ops.image import build_sentence_aug

    config = lrs3_config().override(**{"data.batch_size": bs})
    if os.environ.get("SYNCVSR_BISECT_TINY"):  # CPU smoke of the tool itself
        config = config.override(**{
            "model.encoder.layers": 1, "model.encoder.dim": 64,
            "model.encoder.heads": 2, "model.decoder.layers": 1,
            "model.decoder.dim": 64, "model.decoder.heads": 2,
            "model.decoder.hidden": 128, "model.labels": 101})
    model = build_model(config)
    rng_np = np.random.RandomState(0)
    raw = sentence_batch(config, bs, num_frames=frames, label_len=48)
    raw["videos"] = rng_np.randint(0, 256, (bs, frames, 128, 128, 1)
                                   ).astype(np.uint8)
    h = config.data.crop_size
    init = dict(raw)
    init["videos"] = jnp.zeros((bs, frames, h, h, 1), jnp.float32)
    aug = build_sentence_aug(config.data)
    print(f"# bisect_bs16 variant={variant} bs={bs} backend="
          f"{jax.default_backend()}", flush=True)

    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init.items()})
    device_batch = jax.device_put({k: jnp.asarray(v) for k, v in raw.items()})

    if variant in ("frontend", "encoder", "model", "ctc", "att", "sync", "dec",
                   "lsm", "att_barrier", "modelmetrics"):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def one_loss(m, batch, which):
            """encode + exactly ONE of the three loss branches (the model
            variant's crash means the fault is among them)."""
            from syncvsr_tpu.ops.ctc import ctc_loss
            from syncvsr_tpu.ops.masking import (
                add_sos_eos,
                label_smoothing_kl,
                length_mask,
            )

            x = m.encode(batch["videos"], batch["lengths"], det=False)
            t = x.shape[1]
            lengths = m.frame_lengths(batch["videos"], batch["lengths"])
            pad_mask = length_mask(lengths, t)
            if which == "sync":
                at = batch["audio_tokens"][:, : t * m.cfg.codec.audio_alignment]
                fv = jnp.repeat(pad_mask, m.cfg.codec.audio_alignment, axis=1)
                mt = jnp.where(fv[:, :, None], at, -1)
                return m.audio_classifier(x.astype(jnp.float32), mt,
                                          chunk=128 if t > 256 else None)
            if which == "ctc":
                ll = (batch["labels"] != -1).sum(axis=1)
                logits = m.ctc_head(x.astype(jnp.float32))
                return ctc_loss(logits, lengths, batch["labels"], ll,
                                blank_id=0)
            if which == "lsm":
                # the KL/softmax at att's exact [B, U, 5049] shape and
                # targets, WITHOUT the decoder stack (the vocab-5049
                # projection itself is exonerated by the ctc variant)
                _, ys_out, _ = add_sos_eos(batch["labels"], m.sos, m.eos, -1)
                logits = m.ctc_head(
                    x.astype(jnp.float32)[:, : ys_out.shape[1]])
                return label_smoothing_kl(logits, ys_out, m.cfg.labels,
                                          m.cfg.lsm_weight, ignore_id=-1)
            memory = m.proj_decoder(x) if m.proj_decoder is not None else x
            ys_in, ys_out, ys_lengths = add_sos_eos(batch["labels"], m.sos,
                                                    m.eos, -1)
            dl = m.decoder(ys_in, ys_lengths, memory, pad_mask, det=False)
            if which == "dec":
                # decoder stack fwd+bwd WITHOUT the label-smoothing KL
                return jnp.sum(dl.astype(jnp.float32) ** 2)
            if which == "att_barrier":
                # att, but forbid XLA from fusing the KL into the decoder
                # output projection — if dec and lsm pass alone and this
                # passes too, the fused boundary is the faulting kernel AND
                # the barrier is the production workaround for bs16.
                dl = jax.lax.optimization_barrier(dl)
            return label_smoothing_kl(dl, ys_out, m.cfg.labels,
                                      m.cfg.lsm_weight, ignore_id=-1)

        @jax.jit
        def step(variables, batch):
            rng = jax.random.PRNGKey(0)
            batch = aug(rng, batch)

            def loss(params):
                v = {"params": params, "batch_stats": variables["batch_stats"]}
                if variant == "frontend":
                    feats, _ = model.apply(
                        v, batch["videos"], True, mutable=["batch_stats"],
                        method=lambda m, x, train: m.frontend(x, train=train))
                    return jnp.sum(feats.astype(jnp.float32) ** 2)
                if variant == "encoder":
                    feats, _ = model.apply(
                        v, batch["videos"], batch["lengths"], det=False,
                        mutable=["batch_stats"], rngs={"dropout": rng},
                        method="encode")
                    return jnp.sum(feats.astype(jnp.float32) ** 2)
                if variant in ("ctc", "att", "sync", "dec", "lsm",
                               "att_barrier"):
                    out, _ = model.apply(
                        v, batch, variant, mutable=["batch_stats"],
                        rngs={"mixup": rng, "dropout": rng},
                        method=one_loss)
                    return out
                out, _ = model.apply(
                    v, **batch, det=False, mutable=["batch_stats"],
                    rngs={"mixup": rng, "dropout": rng})
                if variant == "modelmetrics":
                    return out["loss"], out
                return out["loss"]

            if variant == "modelmetrics":
                grads, out = jax.grad(loss, has_aux=True)(variables["params"])
                # keep every metric output live (the full step does)
                extra = sum(v.astype(jnp.float32)
                            for v in jax.tree_util.tree_leaves(out))
            else:
                grads = jax.grad(loss)(variables["params"])
                extra = 0.0
            # reduce so the grads can't be dead-code-eliminated
            return extra + sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                               for g in jax.tree_util.tree_leaves(grads))

        ms = _time_loop(lambda: step(variables, device_batch))
        print(json.dumps({"variant": variant, "bs": bs,
                          "ms_per_step": round(ms, 1), "ok": True}),
              flush=True)
        return

    if variant == "opt":
        @jax.jit
        def opt_step(st, batch):
            mixup_rng, new_mixup = jax.random.split(st.mixup_rng)
            dropout_rng, new_dropout = jax.random.split(st.dropout_rng)
            aug_rng, mixup_rng = jax.random.split(mixup_rng)
            batch = aug(aug_rng, batch)
            rngs = {"mixup": mixup_rng, "dropout": dropout_rng}

            def loss_fn(params):
                variables = {"params": params, "batch_stats": st.batch_stats}
                out, mutated = st.apply_fn(variables, **batch, det=False,
                                           rngs=rngs, mutable=["batch_stats"])
                return out["loss"], (out, mutated)

            (_, (metrics, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            new_bn = (st.batch_stats
                      if os.environ.get("SYNCVSR_BISECT_STALE_BN")
                      else mutated["batch_stats"])
            if os.environ.get("SYNCVSR_BISECT_SGD"):
                new_params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-3 * g, st.params, grads)
                st = st.replace(params=new_params, step=st.step + 1,
                                mixup_rng=new_mixup, dropout_rng=new_dropout,
                                batch_stats=new_bn)
            else:
                st = st.apply_gradients(
                    grads=grads, mixup_rng=new_mixup,
                    dropout_rng=new_dropout, batch_stats=new_bn)
            return st, metrics

        holder = {"state": state}

        def one_opt():
            holder["state"], metrics = opt_step(holder["state"], device_batch)
            return metrics["loss"]

        ms = _time_loop(one_opt)
        print(json.dumps({"variant": variant, "bs": bs,
                          "ms_per_step": round(ms, 1),
                          "frames_per_sec": round(bs * frames / (ms / 1e3), 1),
                          "ok": True}), flush=True)
        return

    # full / bs12: the real train step, donation + scoped-vmem as in bench.py
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(config.train.scoped_vmem_kib)}
            if config.train.scoped_vmem_kib
            and jax.default_backend() != "cpu" else None)
    donate = not os.environ.get("SYNCVSR_BISECT_NO_DONATE")
    step = build_train_step(mesh=None, donate=donate, aug_fn=aug,
                            compiler_options=opts)

    holder = {"state": state}

    def one():
        holder["state"], metrics = step(holder["state"], device_batch)
        return metrics["loss"]

    ms = _time_loop(one)
    print(json.dumps({"variant": variant, "bs": bs, "ms_per_step": round(ms, 1),
                      "frames_per_sec": round(bs * frames / (ms / 1e3), 1),
                      "ok": True}), flush=True)


if __name__ == "__main__":
    main()

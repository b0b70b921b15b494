"""Evaluation driver.

Word-level: top-1/top-5 accuracy over the test split (reference
LRW/video/src/inference.py). Sentence-level: per-utterance beam-search WER
(reference LRS/video/lightning.py:114-129,224-234) with the jittable hybrid
decoder, or fast greedy-CTC WER with decode=greedy.

Evaluates the **test** split by default (override with ``data.split=val``),
matching the reference drivers. Optional LM shallow fusion mirrors the
reference's config-built LM scorer (LRS/video/lightning.py:243-279,
config/lrs3.yaml:64-71): pass ``lm_ckpt=<msgpack>`` and ``lm_weight=0.1``.

Usage:
    python -m syncvsr_tpu.evaluate preset=lrs3 data.root=/data \
        ckpt=best.msgpack decode=beam beam_size=40 \
        [lm_ckpt=lm.msgpack lm_weight=0.1] [data.split=val]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from syncvsr_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from syncvsr_tpu.config import PRESETS, Config, parse_cli_overrides
from syncvsr_tpu.data.factory import build_loaders
from syncvsr_tpu.decode import BeamSearchConfig
from syncvsr_tpu.decode.api import (
    make_batched_beam_decoder,
    make_beam_decoder,
    make_greedy_ctc_decoder,
)
from syncvsr_tpu.engine import build_eval_step, create_train_state
from syncvsr_tpu.models import build_model
from syncvsr_tpu.ops.image import (
    build_eval_transform,
    build_sentence_eval_transform,
)
from syncvsr_tpu.parallel import create_mesh, shard_batch
from syncvsr_tpu.utils import checkpoint as ckpt
from syncvsr_tpu.utils.metrics import AverageMeter, split_eval_weights
from syncvsr_tpu.utils.text import WordErrorRate


def _eval_mesh(config):
    """Data-sharding mesh for sentence-level decode, or None.

    Eval decoding shards only the batch (weights replicated), so a mesh
    config that doesn't match the local device count — e.g. pod-training
    overrides (mesh.data=8) reused on a 1-chip box — degrades to unsharded
    decoding instead of aborting before the first utterance."""
    try:
        mesh = create_mesh(config.mesh.data, config.mesh.model,
                           config.mesh.seq)
    except AssertionError as e:
        print(f"eval: mesh config unusable here ({e}); decoding unsharded",
              file=sys.stderr)
        return None
    return mesh if mesh.shape.get("data", 1) > 1 else None


def main():
    overrides = parse_cli_overrides(sys.argv[1:])
    preset = overrides.pop("preset", None)
    ckpt_path = overrides.pop("ckpt", None)
    decode_mode = overrides.pop("decode", "beam")
    beam_size = int(overrides.pop("beam_size", 40))
    # length bonus (reference beam-search "penalty" weight,
    # LRS/video/lightning.py:261-266; 0.0 in the published configs)
    penalty = float(overrides.pop("penalty", 0.0))
    # beam_batched compile amortization: "max" (default) pads every bucket to
    # the largest eval bucket -> ONE compiled decoder for the whole test set;
    # "bucket" keeps one compile per distinct bucket length
    decode_pad = str(overrides.pop("decode_pad", "max"))
    lm_ckpt = overrides.pop("lm_ckpt", None)
    lm_weight = float(overrides.pop("lm_weight", 0.0))
    # lm_kind=transformer|rnn (espnet TransformerLM / RNNLM scorers,
    # lm/transformer.py, lm/default.py); lm_ckpt may be our msgpack or an
    # espnet torch checkpoint (converted on load)
    lm_kind = str(overrides.pop("lm_kind", "transformer"))
    # LM shape defaults per kind: transformer follows the reference
    # lrs3.yaml language_model (16L, att 512, 8 heads, unit 2048, embed 128);
    # rnn follows espnet lm/default.py's RNNLM defaults (2 layers x 650 units,
    # embedding = unit width). Override with lm_layers=/lm_dim=/...
    lm_defaults = (
        (("layers", 2), ("dim", 650), ("heads", 1),
         ("hidden", 650), ("embed_dim", 650)) if lm_kind == "rnn" else
        (("layers", 16), ("dim", 512), ("heads", 8),
         ("hidden", 2048), ("embed_dim", 128)))
    lm_shape = {k: int(overrides.pop(f"lm_{k}", d)) for k, d in lm_defaults}
    # espnet BeamSearch length-ratio knobs (beam_search.py:330-360);
    # the published configs use 0.0/0.0
    maxlenratio = float(overrides.pop("maxlenratio", 0.0))
    minlenratio = float(overrides.pop("minlenratio", 0.0))
    config = (PRESETS[preset]() if preset else Config()).override(**overrides)
    split = config.data.split or "test"

    model = build_model(config)
    _, eval_loader = build_loaders(config, eval_split=split)
    example = next(iter(eval_loader))
    if config.model.task == "word":
        eval_transform = build_eval_transform(config.data)
    else:
        eval_transform = build_sentence_eval_transform(config.data,
                                                       config.data.dataset)
    init_example = eval_transform(example)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in init_example.items()})
    if ckpt_path:
        payload = ckpt.load_msgpack(ckpt_path)
        params, _ = ckpt.partial_load(state.params, payload.get("params", payload))
        state = state.replace(params=params,
                              batch_stats=payload.get("batch_stats",
                                                      state.batch_stats))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    if config.model.task == "word":
        try:
            mesh = create_mesh(config.mesh.data, config.mesh.model,
                               config.mesh.seq)
        except AssertionError as e:  # pod overrides on a smaller box
            print(f"eval: mesh config unusable here ({e}); "
                  "using all local devices", file=sys.stderr)
            mesh = create_mesh()
        eval_step = build_eval_step(mesh)
        meter = AverageMeter()
        for batch in eval_loader:
            batch = eval_transform(batch)
            # exact accuracy over every test clip: the loader repeat-pads the
            # tail batch and marks real rows in sample_weight; the model
            # computes weighted means, the step returns the GLOBAL real count
            # and the token/slot denominators for cross-batch aggregation
            m = jax.device_get(eval_step(state, shard_batch(mesh, batch)))
            m, w = split_eval_weights(m)
            meter.update(m, weight=w)
        print(json.dumps(meter.summary(f"{split}/")))
        return

    # sentence-level: WER
    from syncvsr_tpu.data.tokenizer import build_text_transform

    tt = build_text_transform(config.data.spm_vocab)
    wer = WordErrorRate()
    hyp_records = []

    def record(ref, hyp, score=None):
        wer.update(ref, hyp)
        hyp_records.append({"ref": ref, "hyp": hyp,
                            **({"score": score} if score is not None else {})})

    def valid_rows(batch):
        """Real rows of a bucket batch (sample_weight marks repeat-padding,
        which may interleave under strided multi-host slices). Scoring only
        these keeps WER invariant to eval_batch_size (each utterance counted
        exactly once, reference LRS/video/lightning.py:114-129)."""
        if "sample_weight" in batch:
            return [int(i) for i in np.flatnonzero(
                np.asarray(batch["sample_weight"]) > 0)]
        return list(range(batch["videos"].shape[0]))

    lm = lm_variables = None
    if lm_ckpt and lm_weight != 0.0:
        from syncvsr_tpu.models.lm import RNNLM, TransformerLM

        if lm_kind == "rnn":
            lm = RNNLM(vocab=config.model.labels, layers=lm_shape["layers"],
                       dim=lm_shape["dim"], embed_dim=lm_shape["embed_dim"])
        else:
            lm = TransformerLM(vocab=config.model.labels, **lm_shape)
        # sniff the checkpoint format by content, not extension: a converted
        # msgpack saved under any other name must not fall through to
        # torch.load and die with a confusing unpickling error. Magic bytes
        # decide without parsing the body (a 16L espnet LM is 100s of MB):
        # torch saves are zip ("PK") or legacy pickle (0x80); flax msgpack
        # payloads are msgpack maps (0x8N fixmap / 0xde / 0xdf).
        with open(lm_ckpt, "rb") as _f:
            magic = _f.read(2)
        looks_torch = magic[:2] == b"PK" or (magic and magic[0] == 0x80)
        lm_payload = None
        if not looks_torch:
            try:
                lm_payload = ckpt.load_msgpack(lm_ckpt)
            except Exception:
                if lm_ckpt.endswith(".msgpack"):
                    raise  # named msgpack but unreadable: surface the error
        if lm_payload is not None:
            pre = lm_payload.get("params", lm_payload)
            if lm_kind != "rnn" and not any(
                    "input_norm" in k for k in ckpt.flatten(pre)):
                # checkpoints predating TransformerLM's input_norm load via
                # partial_load (fresh identity LayerNorm fills the gap), but
                # the ReLU added alongside it still changes the function the
                # checkpoint was trained with — don't re-score silently
                print("[lm] WARNING: LM checkpoint has no input_norm subtree "
                      "(predates the espnet embed LayerNorm+ReLU); its fusion "
                      "scores will differ from training time — re-convert or "
                      "re-train the LM.", file=sys.stderr)
            # merge onto a fresh init (partial_load): checkpoints predating
            # an architecture addition still load instead of raising on the
            # missing subtree
            lm_init = lm.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))["params"]
            lm_params, _ = ckpt.partial_load(lm_init, pre)
            lm_variables = {"params": lm_params}
        else:
            # espnet-trained torch LM: convert layouts + names on load
            import torch

            from syncvsr_tpu.utils.torch_convert import convert_lm

            sd = torch.load(lm_ckpt, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            lm_variables = {"params": convert_lm(
                sd, lm_kind, lm_shape["dim"], lm_shape["heads"],
                lm_shape["layers"])}

    if decode_mode == "beam":
        decode = make_beam_decoder(
            model, variables,
            BeamSearchConfig(beam_size=beam_size,
                             ctc_weight=config.model.mtlalpha,
                             lm_weight=lm_weight, penalty=penalty,
                             maxlenratio=maxlenratio, minlenratio=minlenratio),
            lm=lm, lm_variables=lm_variables)
        for batch in eval_loader:
            batch = eval_transform(batch)
            for i in valid_rows(batch):
                toks, n, score = decode(jnp.asarray(batch["videos"][i:i + 1]),
                                        jnp.asarray(batch["lengths"][i]))
                hyp = tt.post_process(np.asarray(toks)[: int(n)])
                ref = tt.post_process(np.asarray(batch["labels"][i]))
                record(ref, hyp, float(score))
    elif decode_mode == "beam_batched":
        # one XLA program decodes a whole padded bucket (vmap'd beam search);
        # decode_pad=max pads time to the largest eval bucket so the whole
        # test set reuses ONE compiled program (padding is masked by lengths)
        bs_config = BeamSearchConfig(beam_size=beam_size,
                                     ctc_weight=config.model.mtlalpha,
                                     lm_weight=lm_weight, penalty=penalty,
                                     maxlenratio=maxlenratio,
                                     minlenratio=minlenratio)
        from syncvsr_tpu.data.lrs import bucket_for_length

        t_max = bucket_for_length(config.data.max_frames_val,
                                  config.data.length_buckets)
        mesh = _eval_mesh(config)
        n_data = mesh.shape["data"] if mesh is not None else 1
        decoders = {}
        for batch in eval_loader:
            batch = eval_transform(batch)
            v = np.asarray(batch["videos"])
            audio_mode = v.ndim == 2  # waveform [B, S]: 640 samples/frame
            tf = v.shape[1] // 640 if audio_mode else v.shape[1]
            if decode_pad == "max":
                tf = t_max
            want = tf * 640 if audio_mode else tf
            if v.shape[1] < want:
                pad = [(0, 0), (0, want - v.shape[1])] + \
                      [(0, 0)] * (v.ndim - 2)
                v = np.pad(v, pad)
            # shard the bucket over the data axis when THIS batch divides
            # the mesh, else decode unsharded — decided per batch (buckets
            # under data.max_batch_frames have different fixed batch sizes,
            # and decode_pad=max funnels them all to one tf)
            sharded = mesh is not None and v.shape[0] % n_data == 0
            if (tf, sharded) not in decoders:
                decoders[tf, sharded] = make_batched_beam_decoder(
                    model, variables, bs_config, max_len=tf,
                    lm=lm, lm_variables=lm_variables,
                    mesh=mesh if sharded else None)
            toks, ns, scores = decoders[tf, sharded](
                jnp.asarray(v), jnp.asarray(batch["lengths"]))
            for i in valid_rows(batch):
                hyp = tt.post_process(np.asarray(toks)[i][: int(ns[i])])
                ref = tt.post_process(np.asarray(batch["labels"][i]))
                record(ref, hyp, float(scores[i]))
    elif decode_mode == "align":
        # CTC forced alignment of the ground-truth transcripts (the reference
        # CTC class's forced_align capability, espnet ctc.py:181-245 — no
        # reference config calls it; exposed here as its own mode). Emits
        # per-frame token ids + [token, start, end) segments per utterance.
        from syncvsr_tpu.decode.api import make_forced_aligner

        mesh = _eval_mesh(config)
        n_data = mesh.shape["data"] if mesh is not None else 1
        align = make_forced_aligner(model, variables, mesh=mesh)
        align_plain = None
        for batch in eval_loader:
            batch = eval_transform(batch)
            if n_data > 1 and batch["videos"].shape[0] % n_data != 0:
                if align_plain is None:
                    align_plain = make_forced_aligner(model, variables)
                al_fn = align_plain
            else:
                al_fn = align
            al = np.asarray(al_fn(jnp.asarray(batch["videos"]),
                                  jnp.asarray(batch["lengths"]),
                                  jnp.asarray(batch["labels"])))
            for i in valid_rows(batch):
                frames = al[i][al[i] >= 0]
                segments = []
                for t0, tok in enumerate(frames.tolist()):
                    if tok != 0 and (not segments or segments[-1][0] != tok
                                     or segments[-1][2] != t0):
                        segments.append([tok, t0, t0 + 1])
                    elif tok != 0:
                        segments[-1][2] = t0 + 1
                ref = tt.post_process(np.asarray(batch["labels"][i]))
                hyp_records.append({
                    "ref": ref,
                    "alignment": frames.tolist(),
                    "segments": [[tt.post_process(np.asarray([tok])), a, b]
                                 for tok, a, b in segments]})
    else:
        mesh = _eval_mesh(config)
        n_data = mesh.shape["data"] if mesh is not None else 1
        decode = make_greedy_ctc_decoder(model, variables, mesh=mesh)
        decode_plain = None
        for batch in eval_loader:
            batch = eval_transform(batch)
            if n_data > 1 and batch["videos"].shape[0] % n_data != 0:
                # odd tail batch: fall back to the unsharded program
                if decode_plain is None:
                    decode_plain = make_greedy_ctc_decoder(model, variables)
                dec = decode_plain
            else:
                dec = decode
            toks, lens = dec(jnp.asarray(batch["videos"]),
                             jnp.asarray(batch["lengths"]))
            for i in valid_rows(batch):
                hyp = tt.post_process(np.asarray(toks)[i][: int(lens[i])])
                ref = tt.post_process(np.asarray(batch["labels"][i]))
                record(ref, hyp)
    # per-utterance hypothesis dump (asr_utils.add_results_to_json role)
    with open("hypotheses.jsonl", "w") as f:
        for r in hyp_records:
            f.write(json.dumps(r) + "\n")
    if decode_mode == "align":
        summary = {f"{split}/aligned_utts": len(hyp_records),
                   "hypotheses": "hypotheses.jsonl"}
    else:
        summary = {f"{split}/wer": wer.wer,
                   f"{split}/edit_distance": wer.total_edit_distance,
                   f"{split}/words": wer.total_length,
                   "hypotheses": "hypotheses.jsonl"}
    if decode_mode == "beam_batched":
        summary["decode_compiles"] = len(decoders)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

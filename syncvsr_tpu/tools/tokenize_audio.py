"""Offline audio tokenizer: raw waveforms -> quantized audio-token pkls.

The reference quantizes audio *inside the train step* with a frozen
vq-wav2vec / wav2vec2 quantizer (LRW/video/src/lightning.py:69-79,121-131;
LRS/video/espnet/nets/pytorch_backend/e2e_asr_transformer.py:145-180). On TPU
the quantizers never belong in the compiled step (frozen torch models, CPU-
friendly, run once per dataset), so this tool reproduces their *math* offline
and writes `{codec}_tokens` pkls in the released-token layout that
``data.audio_root`` maps back onto the video pkls
(LRW/video/src/data.py:49-55).

Codecs (constants per LRW/video/src/lightning.py:57-67):
  * ``wav2vec2``: HF ``Wav2Vec2ForPreTraining`` (local path; the transformer
    encoder is discarded). Tokens are the per-group argmax indices of the
    Gumbel quantizer's codebook logits — numerically identical to the
    reference's arange-codevectors trick (lightning.py:72-79) except that the
    reference's flattened indices carry a ``group * vocab`` offset for group
    g>0, which its own 640-way CE could never score; we emit per-group indices
    in [0, vocab), matching the sync-loss contract.
  * ``vq``: fairseq vq-wav2vec kmeans checkpoint, loaded WITHOUT fairseq —
    the .pt file is a plain torch pickle holding ``args`` + ``model`` state
    dict; the conv feature extractor and kmeans quantizer are re-implemented
    here (wav2vec paper, arXiv:1904.05862, §2; fairseq wav2vec.py semantics)
    and the weights loaded strictly.

Audio input: 16 kHz mono waveforms from ``.wav`` files (scipy) or from the
``audio`` key of video pkls as written by our preprocessing tools (int16 or
float numpy array, or ``{"array": ..., "sample_rate": ...}``).

Usage:
    python -m syncvsr_tpu.tools.tokenize_audio \
        --src /data/LRW --dst /data/LRW_tokens \
        --codec wav2vec2 --model /models/wav2vec2-large-xlsr-53
"""

from __future__ import annotations

import argparse
import ast
import glob
import math
import os
from typing import Iterable, List, Tuple

import numpy as np

SAMPLE_RATE = 16_000


# ---------------------------------------------------------------------------
# Waveform IO
# ---------------------------------------------------------------------------

def to_waveform(obj) -> np.ndarray:
    """Any supported audio payload -> float32 mono waveform at 16 kHz."""
    if isinstance(obj, dict) and "array" in obj:
        sr = int(obj.get("sample_rate", SAMPLE_RATE))
        if sr != SAMPLE_RATE:
            raise ValueError(f"expected {SAMPLE_RATE} Hz audio, got {sr}")
        obj = obj["array"]
    wav = np.asarray(obj)
    # int16 scaling BEFORE the stereo downmix (mean() promotes to float64 and
    # would skip the 1/32768 normalization for stereo int16 input)
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype != np.float32:
        wav = wav.astype(np.float32)
    if wav.ndim == 2:  # [C, S] or [S, C] -> mono
        wav = wav.mean(axis=0 if wav.shape[0] <= 2 else 1)
    return wav


def read_wav(path: str) -> np.ndarray:
    from scipy.io import wavfile

    sr, wav = wavfile.read(path)
    if sr != SAMPLE_RATE:
        raise ValueError(f"{path}: expected {SAMPLE_RATE} Hz, got {sr}")
    return to_waveform(wav)


# ---------------------------------------------------------------------------
# wav2vec2 (HF transformers)
# ---------------------------------------------------------------------------

def load_wav2vec2(model_path: str):
    """Local HF Wav2Vec2ForPreTraining with the transformer encoder dropped
    (reference lightning.py:72-76 — only feature extractor + quantizer are
    needed to emit tokens)."""
    import torch
    from transformers import Wav2Vec2ForPreTraining

    model = Wav2Vec2ForPreTraining.from_pretrained(model_path)
    del model.wav2vec2.encoder
    return model.requires_grad_(False).eval()


def quantize_wav2vec2(model, wav: np.ndarray) -> np.ndarray:
    """float32 [S] (or [B, S]) -> int32 tokens [T', G], G=2, values in
    [0, num_codevectors_per_group).

    Math per reference forward_audios (lightning.py:121-131): conv feature
    extractor -> feature_projection layer-norm branch -> quantizer codebook
    argmax per group (deterministic eval path of the Gumbel quantizer).
    """
    import torch

    x = torch.as_tensor(wav, dtype=torch.float32)
    if x.ndim == 1:
        x = x[None]
    with torch.no_grad():
        feats = model.wav2vec2.feature_extractor(x).transpose(1, 2)
        _, feats = model.wav2vec2.feature_projection(feats)
        q = model.quantizer
        logits = q.weight_proj(feats)                     # [B, T, G*V]
        b, t, _ = logits.shape
        idx = logits.view(b, t, q.num_groups, -1).argmax(-1)
    out = idx.to(torch.int32).numpy()
    return out[0] if np.asarray(wav).ndim == 1 else out


# ---------------------------------------------------------------------------
# vq-wav2vec (fairseq checkpoint, loaded without fairseq)
# ---------------------------------------------------------------------------

class VQWav2Vec:
    """Inference-only vq-wav2vec (kmeans variant) rebuilt from a fairseq
    checkpoint's args + state dict. Implements exactly the two submodules the
    reference calls (lightning.py:126-128): ``feature_extractor`` and
    ``vector_quantizer.forward_idx``."""

    def __init__(self, ckpt_path: str):
        import torch
        import torch.nn as nn

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        args = ckpt.get("args")
        sd = ckpt.get("model", ckpt)
        conv_layers = ast.literal_eval(
            getattr(args, "conv_feature_layers",
                    "[(512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2),"
                    " (512, 4, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1)]"))
        act = nn.GELU() if getattr(args, "activation", "relu") == "gelu" \
            else nn.ReLU()
        self.log_compression = bool(getattr(args, "log_compression", True))
        self.skip_connections = bool(getattr(args, "skip_connections_feat",
                                             False))
        self.residual_scale = math.sqrt(
            float(getattr(args, "residual_scale", 0.5)))

        convs = []
        in_d = 1
        for dim, k, stride in conv_layers:
            convs.append(nn.Sequential(
                nn.Conv1d(in_d, dim, k, stride=stride, bias=False),
                nn.Dropout(0.0),
                nn.GroupNorm(1, dim, affine=not getattr(
                    args, "non_affine_group_norm", False)),
                act))
            in_d = dim
        self.conv_layers = nn.ModuleList(convs)
        self.conv_strides = [s for _, _, s in conv_layers]

        self.groups = int(getattr(args, "vq_groups", 2))
        self.num_vars = int(getattr(args, "vq_vars", 320))
        vq_dim = int(getattr(args, "vq_dim", in_d))
        self.var_dim = vq_dim // self.groups
        self.projection = nn.Sequential(
            nn.Conv1d(in_d, in_d, kernel_size=1, groups=self.groups,
                      bias=False),
            nn.GroupNorm(self.groups, in_d))
        self.embedding = nn.Parameter(
            torch.zeros(self.num_vars, self.groups, self.var_dim))

        holder = nn.Module()
        holder.conv_layers = self.conv_layers
        loaded = holder.load_state_dict(
            {k[len("feature_extractor."):]: v for k, v in sd.items()
             if k.startswith("feature_extractor.")}, strict=False)
        if loaded.missing_keys:
            raise ValueError(
                f"feature_extractor keys missing from checkpoint: "
                f"{loaded.missing_keys}")
        vq_sd = {k[len("vector_quantizer."):]: v for k, v in sd.items()
                 if k.startswith("vector_quantizer.")}
        with torch.no_grad():
            self.projection[0].weight.copy_(vq_sd["projection.0.weight"])
            if "projection.1.weight" in vq_sd:
                self.projection[1].weight.copy_(vq_sd["projection.1.weight"])
                self.projection[1].bias.copy_(vq_sd["projection.1.bias"])
            emb = vq_sd["embedding"]
            if emb.shape[1] == 1 and self.groups > 1:  # combine_groups
                emb = emb.expand(-1, self.groups, -1)
            self.embedding.copy_(emb)
        for p in list(holder.parameters()) + list(self.projection.parameters()):
            p.requires_grad_(False)

    def feature_extractor(self, wav):
        """[B, S] -> [B, C, T'] (hop = prod strides = 160 -> 100 Hz)."""
        x = wav.unsqueeze(1)
        for conv in self.conv_layers:
            residual = x
            x = conv(x)
            if self.skip_connections and x.size(1) == residual.size(1):
                tsz, r_tsz = x.size(2), residual.size(2)
                residual = residual[..., :: r_tsz // tsz][..., :tsz]
                x = (x + residual) * self.residual_scale
        if self.log_compression:
            x = (x.abs() + 1).log()
        return x

    def forward_idx(self, feats):
        """[B, C, T'] -> int tokens [B, T', G]: per-group argmin L2 distance
        to the kmeans codebook after the grouped 1x1 projection."""
        b, c, t = feats.shape
        ze = self.projection(feats)
        ze = ze.view(b, self.groups, self.var_dim, t).permute(0, 3, 1, 2)
        # [B, T, G, 1, d] - [G, V, d] -> argmin over V
        emb = self.embedding.permute(1, 0, 2)             # [G, V, d]
        d = ((ze.unsqueeze(3) - emb.unsqueeze(0).unsqueeze(0)) ** 2).sum(-1)
        return d.argmin(dim=-1)                            # [B, T, G]


def quantize_vq(model: VQWav2Vec, wav: np.ndarray) -> np.ndarray:
    import torch

    x = torch.as_tensor(wav, dtype=torch.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    with torch.no_grad():
        idx = model.forward_idx(model.feature_extractor(x))
    out = idx.to(torch.int32).numpy()
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Dataset-level tokenization
# ---------------------------------------------------------------------------

def build_quantizer(codec: str, model_path: str):
    if codec == "wav2vec2":
        model = load_wav2vec2(model_path)
        return lambda wav: quantize_wav2vec2(model, wav)
    if codec == "vq":
        model = VQWav2Vec(model_path)
        return lambda wav: quantize_vq(model, wav)
    raise ValueError(f"unknown codec {codec!r} (want 'vq' or 'wav2vec2')")


def tokenize_waveform(quantize, wav: np.ndarray, num_frames: int,
                      alignment: int) -> np.ndarray:
    """Pad 0.5 s (reference e2e_asr_transformer.py:168-170, to avoid boundary
    mismatch), quantize, truncate/pad to num_frames*alignment rows (pad value
    -1 = ignored by the sync loss)."""
    wav = np.concatenate([wav, np.zeros(SAMPLE_RATE // 2, np.float32)])
    tokens = quantize(wav)
    need = num_frames * alignment
    if tokens.shape[0] >= need:
        return tokens[:need]
    pad = np.full((need - tokens.shape[0], tokens.shape[1]), -1, np.int32)
    return np.concatenate([tokens, pad], axis=0)


def iter_audio_files(src: str) -> Iterable[Tuple[str, str]]:
    """Yields (path, kind) for every pkl/wav under src."""
    for path in sorted(glob.glob(os.path.join(src, "**", "*.pkl"),
                                 recursive=True)):
        yield path, "pkl"
    for path in sorted(glob.glob(os.path.join(src, "**", "*.wav"),
                                 recursive=True)):
        yield path, "wav"


def tokenize_tree(src: str, dst: str, codec: str, model_path: str,
                  num_frames: int = 0, alignment: int = 0,
                  overwrite: bool = False) -> List[str]:
    """Tokenize every audio-bearing file under ``src`` into token pkls under
    ``dst`` (same relative layout — the ``data.audio_root`` convention).
    Returns written paths. Resumable: existing outputs are skipped."""
    import torch

    from syncvsr_tpu.config import CodecConfig

    cc = CodecConfig.vq() if codec == "vq" else CodecConfig.wav2vec2()
    alignment = alignment or cc.audio_alignment
    quantize = build_quantizer(codec, model_path)
    written = []
    for path, kind in iter_audio_files(src):
        rel = os.path.relpath(path, src)
        out = os.path.join(dst, os.path.splitext(rel)[0] + ".pkl")
        if os.path.exists(out) and not overwrite:
            continue
        if kind == "pkl":
            data = torch.load(path, map_location="cpu", weights_only=False)
            if "audio" not in data:
                continue
            wav = to_waveform(data["audio"])
            frames = num_frames or len(data.get("video", [])) or 0
        else:
            wav = read_wav(path)
            frames = num_frames
        if not frames:  # infer from duration at 25 fps
            frames = int(round(len(wav) / SAMPLE_RATE * 25))
        tokens = tokenize_waveform(quantize, wav, frames, alignment)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        torch.save({f"{codec}_tokens": tokens}, out)
        written.append(out)
    return written


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="tree of pkls (with 'audio' "
                   "key) or wavs")
    p.add_argument("--dst", required=True, help="output token-pkl root "
                   "(point data.audio_root here)")
    p.add_argument("--codec", default="wav2vec2", choices=["vq", "wav2vec2"])
    p.add_argument("--model", required=True,
                   help="HF model dir (wav2vec2) or fairseq .pt (vq)")
    p.add_argument("--num-frames", type=int, default=0,
                   help="video frames per clip (default: infer per file)")
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args()
    written = tokenize_tree(args.src, args.dst, args.codec, args.model,
                            num_frames=args.num_frames,
                            overwrite=args.overwrite)
    print(f"wrote {len(written)} token pkls under {args.dst}")


if __name__ == "__main__":
    main()

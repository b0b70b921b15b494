"""In-step frozen vq-wav2vec tokenizer (JAX inference path).

The reference quantizes raw audio INSIDE the train step with a frozen
vq-wav2vec quantizer (e2e_asr_transformer.py:167-174,195-196: pad 0.5 s,
conv feature extractor, kmeans ``forward_idx``, truncate to
``T * alignment``). The rebuild's default stays offline tokenization
(``tools/tokenize_audio.py`` — the right call for a fixed dataset), but this
module provides the same in-step capability TPU-natively: the 512-wide conv
stack and the codebook search are plain matmuls (MXU), the codec weights are
a frozen pytree passed around the optimizer (never trained, no
stop_gradient needed — tokens are integer argmins with no grad path).

Math mirrors ``tools/tokenize_audio.VQWav2Vec`` (fairseq wav2vec kmeans
semantics, arXiv:1904.05862 §2), which is oracle-pinned against it in
``tests/test_codec_instep.py``. Batched padding semantics match the
reference exactly: GroupNorm statistics span the padded time axis, because
the reference feeds the padded batch too (e2e_asr_transformer.py:195).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

SAMPLE_RATE = 16_000
# (dim, kernel, stride) — fairseq wav2vec default conv_feature_layers; total
# hop 160 samples -> 100 Hz token rate, 4 tokens per 25 fps video frame
VQ_CONV_LAYERS = ((512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2),
                  (512, 4, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1))


def _conv1d(x: Array, w: Array, stride: int) -> Array:
    """x [B, T, Cin], w [K, Cin, Cout] -> [B, T', Cout] (VALID)."""
    return jax.lax.conv_general_dilated(
        x, w, (stride,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"))


def _group_norm(x: Array, scale: Optional[Array], bias: Optional[Array],
                groups: int, eps: float = 1e-5) -> Array:
    """torch GroupNorm semantics on [B, T, C]: per-sample statistics over
    (time, channels-in-group); affine per channel."""
    b, t, c = x.shape
    xg = x.reshape(b, t, groups, c // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, t, c)
    if scale is not None:
        x = x * scale + bias
    return x


_DEFAULT_STRIDES = tuple(s for _, _, s in VQ_CONV_LAYERS)


def vq_feature_extractor(params: Dict[str, Any], wav: Array,
                         log_compression: bool = True,
                         strides: Tuple[int, ...] = _DEFAULT_STRIDES) -> Array:
    """[B, S] float32 -> [B, T', 512] features (100 Hz)."""
    x = wav.astype(jnp.float32)[..., None]               # [B, S, 1]
    for i, stride in enumerate(strides):
        layer = params[f"conv_{i}"]
        x = _conv1d(x, layer["kernel"], stride)
        x = _group_norm(x, layer.get("scale"), layer.get("bias"), groups=1)
        x = jax.nn.relu(x)
    if log_compression:
        x = jnp.log1p(jnp.abs(x))
    return x


def vq_tokens(params: Dict[str, Any], wav: Array,
              strides: Tuple[int, ...] = _DEFAULT_STRIDES) -> Array:
    """[B, S] waveform -> [B, T', G] int32 kmeans codebook indices.

    Codebook search as a dot-product: argmin_v ||z - e_v||^2 =
    argmin_v (||e_v||^2 - 2 z.e_v) — one [B*T', d] x [d, V] matmul per group
    instead of materializing [B, T', G, V, d] differences."""
    feats = vq_feature_extractor(params, wav, strides=strides)  # [B, T', C]
    b, t, c = feats.shape
    proj = params["projection"]
    groups, var_dim = proj["kernel"].shape[0], proj["kernel"].shape[2]
    zg = feats.reshape(b, t, groups, c // groups)
    ze = jnp.einsum("btgi,gio->btgo", zg, proj["kernel"])
    ze = ze.reshape(b, t, groups * var_dim)
    ze = _group_norm(ze, proj.get("scale"), proj.get("bias"), groups=groups)
    ze = ze.reshape(b, t, groups, var_dim)

    emb = params["embedding"].astype(jnp.float32)        # [V, G, d]
    dots = jnp.einsum("btgd,vgd->btgv", ze, emb)
    sq = jnp.sum(emb * emb, axis=-1).T                   # [G, V]
    return jnp.argmin(sq[None, None] - 2.0 * dots, axis=-1).astype(jnp.int32)


def make_instep_tokenizer(codec_params: Dict[str, Any], alignment: int = 4,
                          audio_key: str = "audio",
                          lengths_key: str = "lengths",
                          strides: Tuple[int, ...] = _DEFAULT_STRIDES
                          ) -> Callable:
    """Batch hook: replace the raw ``audio`` waveform [B, S] with in-step
    ``audio_tokens`` [B, Tframes*alignment, G] (reference
    e2e_asr_transformer.py:167-174 + the :195-196 truncation). Tokens past a
    sample's real frame length are -1 (ignored by the sync loss — the
    rebuild's documented improvement over the reference's score-the-padding).
    Compose with the augmentation hook:
    ``aug_fn=lambda rng, b: aug(rng, tokenize(b))``.
    """
    pad = jnp.zeros((1, SAMPLE_RATE // 2), jnp.float32)  # reference 0.5 s

    def tokenize(batch: Dict[str, Any]) -> Dict[str, Any]:
        batch = dict(batch)
        wav = batch.pop(audio_key).astype(jnp.float32)   # [B, S]
        b, s = wav.shape
        num_frames = batch["videos"].shape[1] if "videos" in batch \
            else batch["inputs"].shape[1]
        wav = jnp.concatenate([wav, jnp.broadcast_to(pad, (b, pad.shape[1]))],
                              axis=1)
        toks = vq_tokens(codec_params, wav, strides=strides)  # [B, T', G]
        need = num_frames * alignment
        toks = toks[:, :need]
        if toks.shape[1] < need:  # static shapes: conv arithmetic shortfall
            toks = jnp.pad(toks, ((0, 0), (0, need - toks.shape[1]), (0, 0)),
                           constant_values=-1)
        if lengths_key in batch:
            valid = jnp.arange(need)[None, :] < (
                batch[lengths_key][:, None] * alignment)
            toks = jnp.where(valid[..., None], toks, -1)
        batch["audio_tokens"] = toks
        return batch

    return tokenize


def load_vq_codec(ckpt_path: str) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Load a fairseq vq-wav2vec checkpoint into the JAX param tree (torch
    required at load time only). Returns (params, geometry)."""
    import torch

    from syncvsr_tpu.utils.torch_convert import convert_vq_wav2vec

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    args = ckpt.get("args")
    sd = ckpt.get("model", ckpt)
    return convert_vq_wav2vec(sd, args)

"""Sentence-level VSR model: Conformer encoder + CTC + attention decoder + sync.

Loss algebra matches the reference E2E (e2e_asr_transformer.py:186-227):
    loss = mtlalpha * ctc + (1 - mtlalpha) * att + sync_lambda * audio
with att = label-smoothed KL divided by batch (lsm_weight 0.1,
length_normalized_loss False), ctc batch-averaged, and the per-frame audio
sync CE computed on encoder outputs. Token conventions: blank = 0,
sos = eos = vocab - 1, ignore_id = -1.

Improvement over the reference: padded frames are excluded from the sync loss
(the reference computes CE on padding positions too).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.config import ModelConfig
from syncvsr_tpu.models.conformer import ConformerEncoder
from syncvsr_tpu.models.decoder import TransformerDecoder
from syncvsr_tpu.models.frontend import build_frontend
from syncvsr_tpu.models.word import SyncHead
from syncvsr_tpu.ops.ctc import ctc_loss
from syncvsr_tpu.ops.masking import (
    add_sos_eos,
    decoder_accuracy,
    label_smoothing_kl,
    length_mask,
)

Array = jax.Array


class SentenceVSRModel(nn.Module):
    cfg: ModelConfig

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.dtype)

    @property
    def sos(self) -> int:
        return self.cfg.labels - 1

    @property
    def eos(self) -> int:
        return self.cfg.labels - 1

    def setup(self):
        cfg = self.cfg
        enc = cfg.encoder
        self.frontend = build_frontend(cfg.frontend, self.dtype, name="frontend")
        self.encoder = ConformerEncoder(
            layers=enc.layers, dim=enc.dim, heads=enc.heads,
            hidden=int(enc.hidden_ratio * enc.dim), conv_kernel=enc.conv_kernel,
            macaron=enc.macaron, dropout=enc.mlp_dropout,
            attn_dropout=enc.msa_dropout, remat=cfg.remat, dtype=self.dtype,
            name="encoder")
        self.ctc_head = nn.Dense(cfg.labels, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="ctc_head")
        self.decoder = TransformerDecoder(
            vocab=cfg.labels, layers=cfg.decoder.layers, dim=cfg.decoder.dim,
            heads=cfg.decoder.heads, hidden=cfg.decoder.hidden,
            dropout=cfg.decoder.dropout, dtype=self.dtype, name="decoder")
        self.audio_classifier = SyncHead(
            cfg.codec.audio_alignment, cfg.codec.vq_groups,
            cfg.codec.audio_vocab_size, name="audio_classifier")
        self.proj_decoder = None
        if cfg.encoder.dim != cfg.decoder.dim:
            self.proj_decoder = nn.Dense(cfg.decoder.dim, dtype=self.dtype,
                                         param_dtype=jnp.float32, name="proj_decoder")
        self.ctc_dropout = nn.Dropout(enc.mlp_dropout)

    def frame_lengths(self, inputs: Array, lengths: Array) -> Array:
        """Sample counts -> frame counts for the raw-audio frontend
        (reference divides by 640 at 16 kHz, e2e_asr_transformer.py:187-188)."""
        if self.cfg.frontend.kind == "conv1d_resnet":
            return lengths // 640
        return lengths

    def encode(self, videos: Array, lengths: Array, det: bool = True) -> Array:
        """Frontend + conformer; returns [B, T, adim] (decoding entry point)."""
        if self.cfg.remat and not det:
            # At the 1800-frame bucket the ResNet frontend's per-frame
            # activations (not the conformer's) dominate HBM; recompute them
            # in the backward pass like the encoder blocks.
            feats = nn.remat(lambda mdl, v: mdl(v, train=True))(
                self.frontend, videos)
        else:
            feats = self.frontend(videos, train=not det)
        pad_mask = length_mask(self.frame_lengths(videos, lengths), feats.shape[1])
        return self.encoder(feats, pad_mask, det=det)

    def __call__(self, videos: Array, lengths: Array, labels: Array,
                 audio_tokens: Array, sample_weight: Optional[Array] = None,
                 det: bool = True) -> Dict[str, Array]:
        cfg = self.cfg
        x = self.encode(videos, lengths, det=det)
        t = x.shape[1]  # encoder frames (== samples // 640 for raw audio)
        lengths = self.frame_lengths(videos, lengths)
        pad_mask = length_mask(lengths, t)

        # ---- frame-level audio sync loss (padded frames masked out) --------
        audio_tokens = audio_tokens[:, : t * cfg.codec.audio_alignment]
        frame_valid = jnp.repeat(pad_mask, cfg.codec.audio_alignment, axis=1)
        if sample_weight is not None:
            # repeat-padded tail rows contribute nothing (tokens -> -1 ignore)
            frame_valid = frame_valid & (sample_weight[:, None] > 0)
        masked_tokens = jnp.where(frame_valid[:, :, None], audio_tokens, -1)
        loss_audio = self.audio_classifier(
            x.astype(jnp.float32), masked_tokens,
            chunk=128 if t > 256 else None)

        # ---- CTC -----------------------------------------------------------
        label_lengths = (labels != -1).sum(axis=1)
        ctc_logits = self.ctc_head(self.ctc_dropout(x, deterministic=det)
                                   .astype(jnp.float32))
        loss_ctc = ctc_loss(ctc_logits, lengths, labels, label_lengths,
                            blank_id=0, sample_weight=sample_weight)

        # ---- attention decoder ----------------------------------------------
        memory = self.proj_decoder(x) if self.proj_decoder is not None else x
        ys_in, ys_out, ys_lengths = add_sos_eos(labels, self.sos, self.eos, -1)
        dec_logits = self.decoder(ys_in, ys_lengths, memory, pad_mask, det=det)
        loss_att = label_smoothing_kl(dec_logits, ys_out, cfg.labels,
                                      cfg.lsm_weight, ignore_id=-1,
                                      sample_weight=sample_weight)
        acc = decoder_accuracy(dec_logits, ys_out, ignore_id=-1,
                               sample_weight=sample_weight)

        loss = (cfg.mtlalpha * loss_ctc + (1.0 - cfg.mtlalpha) * loss_att
                + cfg.sync_lambda * loss_audio)
        out = {"loss": loss, "loss_ctc": loss_ctc, "loss_att": loss_att,
               "loss_audio": loss_audio, "decoder_acc": acc}
        if det:
            # true denominators for cross-batch aggregation: decoder_acc is
            # a token mean, loss_audio a sync-slot mean — weighting them by
            # the sample count would break eval_batch_size invariance
            valid_out = ys_out != -1
            if sample_weight is not None:
                valid_out = valid_out & (sample_weight[:, None] > 0)
            out["_tokens"] = valid_out.sum().astype(jnp.float32)
            out["_slots"] = (masked_tokens >= 0).sum().astype(jnp.float32)
        return out

    # ---- decoding hooks (used by syncvsr_tpu.decode) ------------------------
    def ctc_log_probs(self, encoded: Array) -> Array:
        return jax.nn.log_softmax(self.ctc_head(encoded.astype(jnp.float32)), axis=-1)

    def decoder_init_cache(self, batch: int, max_len: int):
        return self.decoder.init_cache(batch, max_len)

    def decoder_step(self, y_prev: Array, pos: Array, cache, memory: Array,
                     memory_mask: Optional[Array], mem_kv=None):
        return self.decoder.step(y_prev, pos, cache, memory, memory_mask,
                                 mem_kv=mem_kv)

    def decoder_precompute_memory(self, memory: Array):
        return self.decoder.precompute_memory(memory)

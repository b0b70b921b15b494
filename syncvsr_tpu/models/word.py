"""Word-level VSR task module: frontend + encoder + word/sync heads + loss.

One module serves the reference's three word-level stacks:
  * landmark transformer (LRW/landmark/src/training.py:36-84, modeling.py:113-136)
  * video transformer (LRW/video/src/lightning.py:36-223)
  * DC-TCN (LRW/video/src/lightning.py:226-334) via ``encoder.kind=dense_tcn``

Loss algebra (shared): word CE (optionally label-smoothed, soft under CutMix)
+ sync_lambda * per-frame audio-token CE. CutMix runs *inside* the jitted step
using the "mixup" RNG stream.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from syncvsr_tpu.config import ModelConfig
from syncvsr_tpu.models.dense_tcn import DenseTCN
from syncvsr_tpu.models.frontend import build_frontend
from syncvsr_tpu.models.layers import trunc_normal
from syncvsr_tpu.models.transformer import TransformerEncoder
from syncvsr_tpu.ops.cutmix import batch_mixup, temporal_cutmix
from syncvsr_tpu.ops.masking import weighted_mean
from syncvsr_tpu.ops.sync_loss import sync_cross_entropy

Array = jax.Array


def smooth_labels(onehot: Array, smoothing: float) -> Array:
    if smoothing == 0.0:
        return onehot
    n = onehot.shape[-1]
    return onehot * (1.0 - smoothing) + smoothing / n


class SyncHead(nn.Module):
    """Per-frame audio-token head. Holds the raw projection so the fused CE
    ops can consume kernel/bias directly. On TPU the forward runs the Pallas
    fused projection+CE kernel (logits never reach HBM); elsewhere the
    jnp/chunked implementation."""

    alignment: int
    groups: int
    vocab: int

    @nn.compact
    def loss(self, features: Array, tokens: Array, chunk: Optional[int] = None) -> Array:
        import os

        out = self.alignment * self.groups * self.vocab
        kernel = self.param("kernel", trunc_normal(), (features.shape[-1], out))
        bias = self.param("bias", nn.initializers.zeros, (out,))
        # SYNCVSR_SYNC_PALLAS=0 forces the chunked XLA path (kernel triage)
        if (jax.default_backend() in ("tpu", "axon")
                and os.environ.get("SYNCVSR_SYNC_PALLAS", "1") != "0"):
            from syncvsr_tpu.ops.pallas_sync import pallas_sync_cross_entropy

            bwd_chunk = chunk or min(max(features.shape[1], 8), 128)
            return pallas_sync_cross_entropy(
                features, kernel, bias, tokens, self.alignment, self.groups,
                self.vocab, bwd_chunk)
        return sync_cross_entropy(features, kernel, bias, tokens,
                                  self.alignment, self.groups, self.vocab,
                                  chunk=chunk)

    def __call__(self, features: Array, tokens: Array, chunk: Optional[int] = None) -> Array:
        return self.loss(features, tokens, chunk)


class WordVSRModel(nn.Module):
    cfg: ModelConfig
    cutmix_alpha: float = 1.0
    use_cutmix: bool = True

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.dtype)

    @nn.compact
    def __call__(self, inputs: Array, labels: Array, audio_tokens: Array,
                 word_mask: Optional[Array] = None,
                 attention_mask: Optional[Array] = None,
                 sample_weight: Optional[Array] = None,
                 det: bool = True) -> Dict[str, Array]:
        cfg = self.cfg
        enc = cfg.encoder
        codec = cfg.codec
        dtype = self.dtype

        # landmark pad sentinel (-100) -> 0 (LRW/landmark/src/training.py:52)
        if inputs.ndim == 3:
            inputs = jnp.where(inputs == -100.0, 0.0, inputs)

        onehot = nn.one_hot(labels, cfg.labels) if labels.ndim == 1 else labels
        # truncate tokens to the temporally aligned window before any mixing
        # (reference training.py:54)
        t_in = inputs.shape[1]
        need = t_in * codec.audio_alignment
        if audio_tokens.shape[1] < need:
            raise ValueError(
                f"audio_tokens has {audio_tokens.shape[1]} rows but "
                f"{need} are required ({t_in} frames x alignment "
                f"{codec.audio_alignment}); check the codec config against "
                f"the token pkls")
        audio_tokens = audio_tokens[:, :need]
        if sample_weight is not None:
            # padded rows contribute nothing to the sync loss (-1 = ignore)
            audio_tokens = jnp.where(sample_weight[:, None, None] > 0,
                                     audio_tokens, -1)

        if enc.kind in ("dense_tcn", "tcn", "mstcn"):
            return self._dense_tcn_path(inputs, onehot, audio_tokens,
                                        word_mask, attention_mask,
                                        sample_weight, det)
        if not det:
            onehot = smooth_labels(onehot, cfg.label_smoothing)
            if self.use_cutmix and self.cutmix_alpha > 0:
                inputs, onehot, audio_tokens, word_mask = temporal_cutmix(
                    self.make_rng("mixup"), inputs, onehot, audio_tokens,
                    word_mask, self.cutmix_alpha)

        frontend = build_frontend(cfg.frontend, dtype, embed_dim=enc.dim,
                                  name="frontend")
        hidden = frontend(inputs, train=not det)  # [B, T, D]
        if hidden.shape[-1] != enc.dim:
            hidden = nn.Dense(enc.dim, kernel_init=trunc_normal(), dtype=dtype,
                              param_dtype=jnp.float32, name="frontend_proj")(hidden)

        # word-boundary channel widens the stream by 1 (modeling.py:44-48)
        if cfg.use_word_boundary:
            assert word_mask is not None
            hidden = jnp.concatenate(
                (hidden, word_mask[:, :, None].astype(dtype)), axis=-1)
        dim_backbone = hidden.shape[-1]

        cls = self.param("cls_token", trunc_normal(), (1, 1, dim_backbone))
        if cfg.use_word_boundary:
            cls = cls.at[:, :, -1].set(0.0)  # CLS carries no boundary bit
        b, t = hidden.shape[0], hidden.shape[1]
        hidden = jnp.concatenate(
            (jnp.broadcast_to(cls.astype(dtype), (b, 1, dim_backbone)), hidden), axis=1)
        hidden = nn.Dropout(enc.emb_dropout)(hidden, deterministic=det)

        encoded = TransformerEncoder(
            layers=enc.layers, dim=enc.dim, heads=enc.heads,
            hidden=enc.hidden or int(enc.hidden_ratio * enc.dim),
            use_rmsnorm=enc.use_rmsnorm, use_glu=enc.use_glu, rope=enc.rope,
            rope_dim=enc.rope_dim,
            msa_dropout=enc.msa_dropout, mlp_dropout=enc.mlp_dropout,
            droppath=enc.droppath, remat=cfg.remat, dtype=dtype,
            name="encoder")(hidden, det=det)

        logits = nn.Dense(cfg.labels, kernel_init=trunc_normal(), dtype=jnp.float32,
                          param_dtype=jnp.float32, name="category_classifier")(
                              encoded[:, 0].astype(jnp.float32))
        loss_word = weighted_mean(
            -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1), sample_weight)

        sync = SyncHead(codec.audio_alignment, codec.vq_groups,
                        codec.audio_vocab_size, name="audio_classifier")
        loss_audio = sync(encoded[:, 1:].astype(jnp.float32), audio_tokens)

        loss = loss_word + cfg.sync_lambda * loss_audio
        hard = jnp.argmax(onehot, axis=-1)
        acc1 = weighted_mean(
            (jnp.argmax(logits, axis=-1) == hard).astype(jnp.float32), sample_weight)
        k5 = min(5, logits.shape[-1])
        acc5 = weighted_mean(
            (jax.lax.top_k(logits, k=k5)[1] == hard[:, None]).any(axis=1)
            .astype(jnp.float32), sample_weight)
        out = {"loss": loss, "loss_word": loss_word, "loss_audio": loss_audio,
               "acc1": acc1, "acc5": acc5}
        if det:
            # loss_audio is a sync-slot mean: give eval aggregation its true
            # denominator (batch-size-invariant cross-batch averaging)
            out["_slots"] = (audio_tokens >= 0).sum().astype(jnp.float32)
        return out

    def _dense_tcn_path(self, inputs, onehot, audio_tokens, word_mask,
                        attention_mask, sample_weight, det):
        """TCN family (reference DCTCNLightningModule,
        LRW/video/src/lightning.py:226-312, and the Lipreading wrapper's
        tcn_options back ends, tcn/model.py:93-177): batch mixup on raw
        videos (word boundaries NOT mixed), frontend + boundary-concat +
        DenseTCN / TemporalConvNet / MultibranchTemporalConvNet,
        attention-masked mean pooling, and both word/audio losses lerped
        between own and rolled-batch targets by the mixup weight."""
        cfg = self.cfg
        enc = cfg.encoder
        codec = cfg.codec
        dtype = self.dtype

        lam = jnp.asarray(0.0, jnp.float32)
        if not det and self.cutmix_alpha > 0:
            inputs, lam = batch_mixup(self.make_rng("mixup"), inputs,
                                      self.cutmix_alpha)

        frontend = build_frontend(cfg.frontend, dtype, embed_dim=enc.dim,
                                  name="frontend")
        hidden = frontend(inputs, train=not det)  # [B, T, D]
        if cfg.use_word_boundary and word_mask is not None:
            hidden = jnp.concatenate(
                (hidden, word_mask[:, :, None].astype(dtype)), axis=-1)
        if enc.kind == "tcn":
            from syncvsr_tpu.models.tcn import TemporalConvNet

            feats = TemporalConvNet(
                channels=enc.tcn_channels, kernel=enc.tcn_kernel,
                dropout=enc.tcn_dropout, dwpw=enc.tcn_dwpw,
                dtype=dtype, name="encoder")(hidden, train=not det)
        elif enc.kind == "mstcn":
            from syncvsr_tpu.models.tcn import MultibranchTemporalConvNet

            feats = MultibranchTemporalConvNet(
                channels=enc.tcn_channels, kernel_sizes=enc.tcn_kernel_sizes,
                dropout=enc.tcn_dropout, dwpw=enc.tcn_dwpw,
                dtype=dtype, name="encoder")(hidden, train=not det)
        else:
            feats = DenseTCN(
                growth_rates=enc.tcn_growth_rates, blocks=enc.tcn_blocks,
                kernel_sizes=enc.tcn_kernel_sizes, dilations=enc.tcn_dilations,
                reduced_size=enc.tcn_reduced_size, use_se=enc.tcn_se,
                dtype=dtype, name="encoder")(hidden, train=not det)  # [B, T, C]

        if attention_mask is None:
            attention_mask = jnp.ones(feats.shape[:2], jnp.float32)
        am = attention_mask.astype(jnp.float32)[:, :, None]
        pooled = (feats.astype(jnp.float32) * am).sum(1) / (am.sum(1) + 1e-6)
        logits = nn.Dense(cfg.labels, kernel_init=trunc_normal(), dtype=jnp.float32,
                          param_dtype=jnp.float32, name="category_classifier")(pooled)

        logp = jax.nn.log_softmax(logits)
        ce = lambda tgt: weighted_mean(-jnp.sum(tgt * logp, axis=-1),
                                       sample_weight)
        sync = SyncHead(codec.audio_alignment, codec.vq_groups,
                        codec.audio_vocab_size, name="audio_classifier")
        f32 = feats.astype(jnp.float32)
        mixing = (not det) and self.cutmix_alpha > 0
        if mixing:
            loss_word = ((1.0 - lam) * ce(onehot)
                         + lam * ce(jnp.roll(onehot, 1, axis=0)))
            loss_audio = ((1.0 - lam) * sync(f32, audio_tokens)
                          + lam * sync(f32, jnp.roll(audio_tokens, 1, axis=0)))
        else:
            loss_word = ce(onehot)
            loss_audio = sync(f32, audio_tokens)

        loss = loss_word + cfg.sync_lambda * loss_audio
        hard = jnp.argmax(onehot, axis=-1)
        acc1 = weighted_mean(
            (jnp.argmax(logits, axis=-1) == hard).astype(jnp.float32),
            sample_weight)
        k5 = min(5, logits.shape[-1])
        acc5 = weighted_mean(
            (jax.lax.top_k(logits, k=k5)[1] == hard[:, None]).any(axis=1)
            .astype(jnp.float32), sample_weight)
        out = {"loss": loss, "loss_word": loss_word, "loss_audio": loss_audio,
               "acc1": acc1, "acc5": acc5}
        if det:
            out["_slots"] = (audio_tokens >= 0).sum().astype(jnp.float32)
        return out

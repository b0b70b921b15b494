"""Released-LRW-checkpoint import (x-transformers flavour).

x_transformers is not installed here, so the oracle is a handwritten torch
implementation of its documented math (RMSNorm g, partial split-halves rotary
over max(32, head_dim//2) dims, GLU value*gelu(gate), pre-norm residuals) fed
from a synthetic state dict in the released checkpoint's key layout
(LRW/video/src/lightning.py:96-105)."""

import numpy as np
import pytest
import torch

from syncvsr_tpu.utils.torch_convert import (
    convert_lrw_word_model,
    convert_xtransformers_encoder,
)

DEPTH, DIM, HEADS, HIDDEN, ROPE_DIM = 2, 64, 2, 96, 16
DK = DIM // HEADS


def xt_state_dict(rng, depth=DEPTH, dim=DIM, hidden=HIDDEN, prefix="",
                  inner=None):
    """x-transformers Encoder keys; ``dim`` is the (possibly WB-widened)
    stream width, ``inner`` = heads * dim_head of the attention."""
    inner = inner or dim
    t = lambda *s: torch.tensor(rng.randn(*s) * 0.2, dtype=torch.float32)
    sd = {}
    for i in range(depth):
        a, f = f"{prefix}layers.{2 * i}", f"{prefix}layers.{2 * i + 1}"
        sd[f"{a}.0.0.g"] = t(dim)
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{a}.1.{n}.weight"] = t(inner, dim)
        sd[f"{a}.1.to_out.weight"] = t(dim, inner)
        sd[f"{a}.1.to_out.bias"] = t(dim)
        sd[f"{f}.0.0.g"] = t(dim)
        sd[f"{f}.1.ff.0.proj.weight"] = t(2 * hidden, dim)
        sd[f"{f}.1.ff.0.proj.bias"] = t(2 * hidden)
        sd[f"{f}.1.ff.2.weight"] = t(dim, hidden)
        sd[f"{f}.1.ff.2.bias"] = t(dim)
    sd[f"{prefix}final_norm.g"] = t(dim)
    return sd


def xt_rmsnorm(x, g):
    norm = x.norm(dim=-1, keepdim=True) * (x.shape[-1] ** -0.5)
    return x / norm.clamp(min=1e-8) * g


def xt_rotary(t, rot_dim):
    """Split-halves rotary over the first rot_dim dims (x-transformers
    RotaryEmbedding + rotate_half conventions)."""
    seq = t.shape[-2]  # t: [B, H, T, D]
    inv = 1.0 / (10000 ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    freqs = torch.arange(seq).float()[:, None] * inv[None]
    emb = torch.cat((freqs, freqs), dim=-1)              # [T, rot_dim]
    cos, sin = emb.cos()[None, None], emb.sin()[None, None]
    tr, tu = t[..., :rot_dim], t[..., rot_dim:]
    x1, x2 = tr.chunk(2, dim=-1)
    rotated = tr * cos + torch.cat((-x2, x1), dim=-1) * sin
    return torch.cat((rotated, tu), dim=-1)


def xt_forward(sd, x, depth=DEPTH, dim=DIM, heads=HEADS, rope_dim=ROPE_DIM,
               inner=None):
    inner = inner or dim  # attention width (< dim when WB widens the stream)
    lin = lambda w, v, b=None: torch.nn.functional.linear(v, w, b)
    for i in range(depth):
        a, f = f"layers.{2 * i}", f"layers.{2 * i + 1}"
        h = xt_rmsnorm(x, sd[f"{a}.0.0.g"])
        q = lin(sd[f"{a}.1.to_q.weight"], h)
        k = lin(sd[f"{a}.1.to_k.weight"], h)
        v = lin(sd[f"{a}.1.to_v.weight"], h)
        b, t, _ = q.shape
        dk = inner // heads
        split = lambda z: z.view(b, t, heads, dk).transpose(1, 2)  # [B,H,T,D]
        q, k, v = split(q), split(k), split(v)
        q, k = xt_rotary(q, rope_dim), xt_rotary(k, rope_dim)
        att = torch.softmax(q @ k.transpose(-1, -2) * dk ** -0.5, dim=-1)
        o = (att @ v).transpose(1, 2).reshape(b, t, inner)
        x = x + lin(sd[f"{a}.1.to_out.weight"], o, sd[f"{a}.1.to_out.bias"])

        h = xt_rmsnorm(x, sd[f"{f}.0.0.g"])
        proj = lin(sd[f"{f}.1.ff.0.proj.weight"], h, sd[f"{f}.1.ff.0.proj.bias"])
        val, gate = proj.chunk(2, dim=-1)
        h = val * torch.nn.functional.gelu(gate)
        x = x + lin(sd[f"{f}.1.ff.2.weight"], h, sd[f"{f}.1.ff.2.bias"])
    return xt_rmsnorm(x, sd["final_norm.g"])


def test_xtransformers_encoder_oracle():
    import jax.numpy as jnp

    from syncvsr_tpu.models.transformer import TransformerEncoder

    rng = np.random.RandomState(0)
    sd = xt_state_dict(rng)
    params = convert_xtransformers_encoder(sd, "", DEPTH, DIM, HEADS)
    model = TransformerEncoder(layers=DEPTH, dim=DIM, heads=HEADS,
                               hidden=HIDDEN, use_rmsnorm=True, use_glu=True,
                               rope=True, rope_dim=ROPE_DIM,
                               dtype=jnp.float32)
    x = rng.randn(2, 7, DIM).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x), det=True)
    theirs = xt_forward(sd, torch.tensor(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-4, atol=2e-4)


def _timm_resnet18_sd(rng, prefix="resnet."):
    t = lambda *s: torch.tensor(rng.randn(*s) * 0.05, dtype=torch.float32)
    sd = {}
    widths = [64, 128, 256, 512]
    in_c = 64
    for layer, w in enumerate(widths, start=1):
        for blk in range(2):
            base = f"{prefix}layer{layer}.{blk}"
            stride_in = in_c if blk == 0 else w
            sd[f"{base}.conv1.weight"] = t(w, stride_in, 3, 3)
            sd[f"{base}.conv2.weight"] = t(w, w, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{base}.{bn}.weight"] = t(w)
                sd[f"{base}.{bn}.bias"] = t(w)
                sd[f"{base}.{bn}.running_mean"] = t(w)
                sd[f"{base}.{bn}.running_var"] = torch.ones(w)
            if blk == 0 and layer > 1:
                sd[f"{base}.downsample.0.weight"] = t(w, in_c, 1, 1)
                sd[f"{base}.downsample.1.weight"] = t(w)
                sd[f"{base}.downsample.1.bias"] = t(w)
                sd[f"{base}.downsample.1.running_mean"] = t(w)
                sd[f"{base}.downsample.1.running_var"] = torch.ones(w)
        in_c = w
    return sd


def test_lrw_word_model_import_structure(mesh8):
    """Full released-layout state dict covers every leaf of the flax model."""
    import jax
    import jax.numpy as jnp

    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.utils.checkpoint import partial_load

    rng = np.random.RandomState(1)
    t = lambda *s: torch.tensor(rng.randn(*s) * 0.05, dtype=torch.float32)
    dim, heads, depth = 512, 8, 2
    dim_in = dim + 1  # word boundary widens the stream
    sd = {"stem3d.0.weight": t(64, 1, 5, 7, 7),
          "stem3d.1.weight": t(64), "stem3d.1.bias": t(64),
          "stem3d.1.running_mean": t(64),
          "stem3d.1.running_var": torch.ones(64),
          "cls_token": t(1, 1, dim_in),
          "category_classifier.weight": t(500, dim_in),
          "category_classifier.bias": t(500),
          "audio_projection.weight": t(4 * 2 * 320, dim_in),
          "audio_projection.bias": t(4 * 2 * 320)}
    sd.update(_timm_resnet18_sd(rng))
    sd.update(xt_state_dict(rng, depth=depth, dim=dim_in,
                            hidden=4 * dim_in, prefix="encoder.",
                            inner=dim))

    params, stats = convert_lrw_word_model(sd, depth=depth, dim=dim,
                                           heads=heads)

    config = lrw_video_config().override(**{
        "model.encoder.layers": depth, "model.encoder.rope_dim": 32,
        "model.encoder.hidden": 4 * dim_in, "model.dtype": "float32",
        "data.batch_size": 8, "data.crop_size": 32})
    model = build_model(config)
    from syncvsr_tpu.data.synthetic import word_batch

    batch = word_batch(config, 8)
    batch["inputs"] = np.zeros((8, 29, 32, 32, 1), np.float32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in batch.items()})

    merged, n = partial_load(state.params, params, verbose=False)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_model = len(jax.tree_util.tree_leaves(state.params))
    assert n == n_leaves, f"loaded {n} of {n_leaves} converted leaves"
    assert n == n_model, f"model has {n_model} leaves, ckpt covered {n}"
    # batch_stats cover the BN collections too
    merged_bs, nbs = partial_load(state.batch_stats, stats, verbose=False)
    assert nbs == len(jax.tree_util.tree_leaves(stats))

    # imported model runs
    merged = jax.tree.map(jnp.asarray, merged)
    merged_bs = jax.tree.map(jnp.asarray, merged_bs)
    metrics = model.apply({"params": merged, "batch_stats": merged_bs},
                          **{k: jnp.asarray(v) for k, v in batch.items()},
                          det=True)
    assert np.isfinite(float(metrics["loss"]))

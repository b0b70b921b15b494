"""Numerical parity of the Conformer block and decoder against the reference's
own espnet torch modules (loaded read-only as oracles).

Random torch weights are converted with utils.torch_convert-style rules into
the Flax modules; outputs must match in eval mode. This pins the rel-shift,
macaron ordering, conv-module wiring, sinusoidal tables, and decoder layout.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/LRS/video"


@pytest.fixture(scope="module")
def espnet():
    import types

    if "timm" not in sys.modules:  # encoder.py imports timm for conv3d-lrw only
        import importlib.machinery

        stub = types.ModuleType("timm")
        stub.create_model = lambda *a, **k: None
        stub.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        sys.modules["timm"] = stub
    sys.path.insert(0, REF)
    yield None
    sys.path.remove(REF)


def _np(t):
    return t.detach().numpy()


def test_conformer_block_matches_espnet(espnet):
    from espnet.nets.pytorch_backend.transformer.attention import (
        RelPositionMultiHeadedAttention,
    )
    from espnet.nets.pytorch_backend.transformer.convolution import (
        ConvolutionModule,
    )
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding,
    )
    from espnet.nets.pytorch_backend.transformer.encoder_layer import EncoderLayer
    from espnet.nets.pytorch_backend.transformer.positionwise_feed_forward import (
        PositionwiseFeedForward,
    )

    from syncvsr_tpu.models.conformer import ConformerBlock, rel_sinusoid_table

    torch.manual_seed(0)
    dim, heads, hidden, kernel, t, b = 16, 2, 32, 7, 5, 2

    layer = EncoderLayer(
        dim,
        RelPositionMultiHeadedAttention(heads, dim, 0.0),
        PositionwiseFeedForward(dim, hidden, 0.0),
        ConvolutionModule(dim, kernel),
        dropout_rate=0.0, normalize_before=True, macaron_style=True,
    ).eval()
    pos_enc = RelPositionalEncoding(dim, 0.0).eval()

    rng = np.random.RandomState(0)
    x = rng.randn(b, t, dim).astype(np.float32)
    with torch.no_grad():
        xt, pe = pos_enc(torch.tensor(x))
        # pos_enc scales by sqrt(d); feed the scaled x to both sides
        (out_t, _), _ = layer((xt, pe), None)
        out_t = out_t.numpy()

    # ---- map torch params -> flax block --------------------------------
    sd = layer.state_dict()
    blk = ConformerBlock(dim, heads, hidden, kernel, macaron=True, dropout=0.0,
                         attn_dropout=0.0, dtype=jnp.float32)
    xs = jnp.asarray(np.asarray(xt))
    pos_emb = rel_sinusoid_table(t, dim)
    variables = blk.init(jax.random.PRNGKey(0), xs, pos_emb, None, None, True)
    p = jax.device_get(variables["params"])
    s = jax.device_get(variables.get("batch_stats", {}))

    def lin(dst, src):
        dst["kernel"] = _np(sd[f"{src}.weight"]).T
        if f"{src}.bias" in sd:
            dst["bias"] = _np(sd[f"{src}.bias"])

    def dgen(dst, src, shape):  # DenseGeneral (d, h, dk) from torch [out, in]
        w = _np(sd[f"{src}.weight"]).T.reshape(shape)
        dst["kernel"] = w
        if f"{src}.bias" in sd:
            dst["bias"] = _np(sd[f"{src}.bias"]).reshape(shape[1:])

    dk = dim // heads
    dgen(p["attn"]["wq"], "self_attn.linear_q", (dim, heads, dk))
    dgen(p["attn"]["wk"], "self_attn.linear_k", (dim, heads, dk))
    dgen(p["attn"]["wv"], "self_attn.linear_v", (dim, heads, dk))
    p["attn"]["wo"]["kernel"] = _np(sd["self_attn.linear_out.weight"]).T.reshape(
        heads, dk, dim)
    p["attn"]["wo"]["bias"] = _np(sd["self_attn.linear_out.bias"])
    dgen(p["attn"]["linear_pos"], "self_attn.linear_pos", (dim, heads, dk))
    p["attn"]["pos_bias_u"] = _np(layer.self_attn.pos_bias_u)
    p["attn"]["pos_bias_v"] = _np(layer.self_attn.pos_bias_v)

    for ours, theirs in (("ff", "feed_forward"), ("ff_macaron", "feed_forward_macaron")):
        lin(p[ours]["w1"], f"{theirs}.w_1")
        lin(p[ours]["w2"], f"{theirs}.w_2")

    # conv module: torch conv1d [out, in/groups, k]
    p["conv"]["pw1"]["kernel"] = _np(sd["conv_module.pointwise_cov1.weight"])[:, :, 0].T
    p["conv"]["pw1"]["bias"] = _np(sd["conv_module.pointwise_cov1.bias"])
    p["conv"]["dw"]["kernel"] = _np(sd["conv_module.depthwise_conv.weight"]).transpose(2, 1, 0)
    p["conv"]["dw"]["bias"] = _np(sd["conv_module.depthwise_conv.bias"])
    p["conv"]["pw2"]["kernel"] = _np(sd["conv_module.pointwise_cov2.weight"])[:, :, 0].T
    p["conv"]["pw2"]["bias"] = _np(sd["conv_module.pointwise_cov2.bias"])
    p["conv"]["bn"]["scale"] = _np(sd["conv_module.norm.weight"])
    p["conv"]["bn"]["bias"] = _np(sd["conv_module.norm.bias"])
    s["conv"]["bn"]["mean"] = _np(sd["conv_module.norm.running_mean"])
    s["conv"]["bn"]["var"] = _np(sd["conv_module.norm.running_var"])

    for ours, theirs in (("norm_ff", "norm_ff"), ("norm_mha", "norm_mha"),
                         ("norm_conv", "norm_conv"), ("norm_final", "norm_final"),
                         ("norm_ff_macaron", "norm_ff_macaron")):
        p[ours]["LayerNorm_0"]["scale"] = _np(sd[f"{theirs}.weight"])
        p[ours]["LayerNorm_0"]["bias"] = _np(sd[f"{theirs}.bias"])

    out_j = blk.apply({"params": p, "batch_stats": s}, xs, pos_emb, None, None,
                      True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-5)


def test_decoder_matches_espnet(espnet):
    from espnet.nets.pytorch_backend.transformer.decoder import Decoder
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask

    from syncvsr_tpu.models.decoder import TransformerDecoder

    torch.manual_seed(1)
    vocab, dim, heads, hidden, layers = 13, 16, 2, 32, 2
    dec_t = Decoder(odim=vocab, attention_dim=dim, attention_heads=heads,
                    linear_units=hidden, num_blocks=layers, dropout_rate=0.0,
                    positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
                    src_attention_dropout_rate=0.0).eval()

    b, l, t = 2, 4, 5
    rng = np.random.RandomState(0)
    ys = rng.randint(0, vocab, (b, l))
    memory = rng.randn(b, t, dim).astype(np.float32)
    with torch.no_grad():
        ys_mask = subsequent_mask(l).unsqueeze(0)
        out_t, _ = dec_t(torch.tensor(ys), ys_mask, torch.tensor(memory), None)
        out_t = out_t.numpy()

    dec_j = TransformerDecoder(vocab=vocab, layers=layers, dim=dim, heads=heads,
                               hidden=hidden, dropout=0.0, dtype=jnp.float32)
    variables = dec_j.init(jax.random.PRNGKey(0), jnp.asarray(ys),
                           jnp.full((b,), l), jnp.asarray(memory), None, True)
    p = jax.device_get(variables["params"])
    sd = dec_t.state_dict()

    p["embed"]["embedding"] = _np(sd["embed.0.weight"])
    dk = dim // heads
    for i in range(layers):
        src = f"decoders.{i}"
        dst = p[f"block_{i}"]
        for ours, theirs in (("self_attn", "self_attn"), ("src_attn", "src_attn")):
            for w, tw in (("wq", "linear_q"), ("wk", "linear_k"), ("wv", "linear_v")):
                dst[ours][w]["kernel"] = _np(sd[f"{src}.{theirs}.{tw}.weight"]).T.reshape(dim, heads, dk)
                dst[ours][w]["bias"] = _np(sd[f"{src}.{theirs}.{tw}.bias"]).reshape(heads, dk)
            dst[ours]["wo"]["kernel"] = _np(sd[f"{src}.{theirs}.linear_out.weight"]).T.reshape(heads, dk, dim)
            dst[ours]["wo"]["bias"] = _np(sd[f"{src}.{theirs}.linear_out.bias"])
        dst["ff"]["w1"]["kernel"] = _np(sd[f"{src}.feed_forward.w_1.weight"]).T
        dst["ff"]["w1"]["bias"] = _np(sd[f"{src}.feed_forward.w_1.bias"])
        dst["ff"]["w2"]["kernel"] = _np(sd[f"{src}.feed_forward.w_2.weight"]).T
        dst["ff"]["w2"]["bias"] = _np(sd[f"{src}.feed_forward.w_2.bias"])
        for ours, theirs in (("norm1", "norm1"), ("norm2", "norm2"), ("norm3", "norm3")):
            dst[ours]["LayerNorm_0"]["scale"] = _np(sd[f"{src}.{theirs}.weight"])
            dst[ours]["LayerNorm_0"]["bias"] = _np(sd[f"{src}.{theirs}.bias"])
    p["after_norm"]["LayerNorm_0"]["scale"] = _np(sd["after_norm.weight"])
    p["after_norm"]["LayerNorm_0"]["bias"] = _np(sd["after_norm.bias"])
    p["output"]["kernel"] = _np(sd["output_layer.weight"]).T
    p["output"]["bias"] = _np(sd["output_layer.bias"])

    out_j = dec_j.apply({"params": p}, jnp.asarray(ys), jnp.full((b,), l),
                        jnp.asarray(memory), None, True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-5)


def test_conv3d_frontend_matches_espnet(espnet):
    """Full visual frontend oracle: espnet Conv3dResNet (torch) -> our
    Conv3DResNetFrontend with converted weights, matching outputs."""
    from espnet.nets.pytorch_backend.backbones.conv3d_extractor import Conv3dResNet

    from syncvsr_tpu.models.frontend import Conv3DResNetFrontend
    from syncvsr_tpu.utils.torch_convert import convert_resnet_trunk, convert_stem3d

    torch.manual_seed(3)
    fe_t = Conv3dResNet(relu_type="swish").eval()
    # randomize BN stats so they matter
    for m in fe_t.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 2.0)
    sd = fe_t.state_dict()

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32, 1).astype(np.float32)  # [B, T, H, W, 1]
    with torch.no_grad():
        out_t = fe_t(torch.tensor(x[..., 0])[:, :, None]  # [B, T, 1, H, W]
                     .permute(0, 1, 2, 3, 4)).numpy()

    params, stats = convert_stem3d(sd, "frontend3D.")
    r_params, r_stats = convert_resnet_trunk(sd, "trunk.")
    params["resnet"] = r_params
    stats["resnet"] = r_stats

    fe_j = Conv3DResNetFrontend(relu_type="swish", stem_act="swish",
                                dtype=jnp.float32)
    out_j = fe_j.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=5e-4, atol=5e-4)


def test_full_e2e_encoder_decoder_match(espnet):
    """Whole-model checkpoint import: build the reference torch E2E, convert
    its full state dict with utils.torch_convert.convert_lrs_e2e, and require
    matching encoder memory and decoder logits."""
    from argparse import Namespace

    from espnet.nets.pytorch_backend.e2e_asr_transformer import E2E
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.models import build_model
    from syncvsr_tpu.utils.torch_convert import convert_lrs_e2e

    adim, aheads, eunits, elayers = 16, 2, 32, 2
    dlayers, vocab, kernel = 2, 13, 7
    args = Namespace(
        adim=adim, aheads=aheads, eunits=eunits, elayers=elayers,
        transformer_input_layer="conv3d", dropout_rate=0.0,
        transformer_attn_dropout_rate=0.0,
        transformer_encoder_attn_layer_type="rel_mha", macaron_style=True,
        use_cnn_module=True, cnn_module_kernel=kernel, zero_triu=False,
        a_upsample_ratio=1, relu_type="swish", ddim=adim, dheads=aheads,
        dunits=eunits, dlayers=dlayers, lsm_weight=0.1,
        transformer_length_normalized_loss=False, mtlalpha=0.1,
        ctc_type="builtin", rel_pos_type="latest", codec=None)
    torch.manual_seed(5)
    e2e = E2E(vocab, args).eval()
    for m in e2e.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 2.0)
    sd = e2e.state_dict()

    rng = np.random.RandomState(0)
    b, t, hw = 2, 4, 32
    x = rng.randn(b, t, hw, hw, 1).astype(np.float32)
    ys = rng.randint(1, vocab - 1, (b, 3))
    with torch.no_grad():
        enc_t, _ = e2e.encoder(torch.tensor(x[..., 0])[:, :, None], None)
        ys_mask = subsequent_mask(3).unsqueeze(0)
        dec_t, _ = e2e.decoder(torch.tensor(ys), ys_mask, enc_t, None)
        enc_t, dec_t = enc_t.numpy(), dec_t.numpy()

    config = lrs3_config().override(**{
        "model.encoder.layers": elayers, "model.encoder.dim": adim,
        "model.encoder.heads": aheads, "model.encoder.hidden_ratio": eunits / adim,
        "model.encoder.conv_kernel": kernel,
        "model.decoder.layers": dlayers, "model.decoder.dim": adim,
        "model.decoder.heads": aheads, "model.decoder.hidden": eunits,
        "model.decoder.dropout": 0.0,
        "model.encoder.msa_dropout": 0.0, "model.encoder.mlp_dropout": 0.0,
        "model.labels": vocab, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32"})
    ours = build_model(config)
    batch = {"videos": jnp.asarray(x), "lengths": jnp.full((b,), t),
             "labels": jnp.asarray(np.pad(ys, ((0, 0), (0, 2)),
                                          constant_values=-1)),
             "audio_tokens": jnp.zeros((b, t * 4, 2), jnp.int32)}
    variables = ours.init({"params": jax.random.PRNGKey(0),
                           "mixup": jax.random.PRNGKey(1),
                           "dropout": jax.random.PRNGKey(2)}, **batch, det=True)
    p0 = jax.device_get(variables["params"])
    s0 = jax.device_get(variables["batch_stats"])

    p, s = convert_lrs_e2e(sd, adim, aheads, dlayers, elayers)
    # keep our randomly-initialized sync head (reference has none with codec=None)
    p["audio_classifier"] = p0["audio_classifier"]

    enc_j = ours.apply({"params": p, "batch_stats": s}, batch["videos"],
                       batch["lengths"], det=True, method="encode")
    np.testing.assert_allclose(np.asarray(enc_j), enc_t, rtol=1e-3, atol=1e-3)

    dec_j = ours.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(ys), jnp.full((b,), 3),
        jnp.asarray(enc_t), None, True,
        method=lambda m, *a, **k: m.decoder(*a, **k))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t, rtol=1e-3, atol=1e-3)

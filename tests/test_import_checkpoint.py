"""Dry run of the released-checkpoint import CLI (docs/parity.md).

The real released blobs are absent from this container
(/root/reference/.MISSING_LARGE_BLOBS), so these tests exercise the exact
commands the parity recipe prescribes on synthetic checkpoints saved in each
released FORMAT: a Lightning .ckpt with bare keys (LRW word model,
LRW/video/src/lightning.py:36-110), a Lightning .ckpt with the ``model.``
prefix (LRS E2E, LRS/video/lightning.py self.model), and a bare espnet LM
state dict. Each import must produce a msgpack that covers every leaf of the
corresponding flax model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_lrw_ckpt_import import (  # noqa: E402
    _timm_resnet18_sd,
    xt_state_dict,
)

from syncvsr_tpu.tools.import_checkpoint import main as import_main  # noqa: E402
from syncvsr_tpu.utils import checkpoint as ckpt  # noqa: E402


def _lrw_released_sd(rng, depth=2, dim=64, heads=2):
    t = lambda *s: torch.tensor(rng.randn(*s) * 0.05, dtype=torch.float32)
    dim_in = dim + 1
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
                            hidden=4 * dim_in, prefix="encoder.", inner=dim))
    return sd


def test_import_lrw_lightning_ckpt(tmp_path):
    from syncvsr_tpu.config import lrw_video_config
    from syncvsr_tpu.data.synthetic import word_batch
    from syncvsr_tpu.engine import create_train_state
    from syncvsr_tpu.models import build_model

    # dim must stay 512: the timm trunk's output width is fixed, and the
    # released layout has no frontend projection leaf for other dims
    depth, dim, heads = 2, 512, 8
    sd = _lrw_released_sd(np.random.RandomState(3), depth, dim, heads)
    src = tmp_path / "LRW_CKPT_epoch_167_step_213864.ckpt"
    # Lightning envelope: state_dict + trainer bookkeeping keys
    torch.save({"state_dict": sd, "epoch": 167, "global_step": 213864}, src)
    dst = tmp_path / "lrw.msgpack"

    import_main(["lrw", str(src), str(dst),
                 f"depth={depth}", f"dim={dim}", f"heads={heads}"])

    payload = ckpt.load_msgpack(str(dst))
    config = lrw_video_config().override(**{
        "model.encoder.layers": depth, "model.encoder.dim": dim,
        "model.encoder.heads": heads, "model.encoder.rope_dim": 32,
        "model.encoder.hidden": 4 * (dim + 1), "model.dtype": "float32",
        "data.batch_size": 2, "data.crop_size": 32})
    model = build_model(config)
    batch = word_batch(config, 2)
    batch["inputs"] = np.zeros((2, 29, 32, 32, 1), np.float32)
    state = create_train_state(
        config, model, {k: jnp.asarray(v) for k, v in batch.items()})

    merged, n = ckpt.partial_load(state.params, payload["params"],
                                  verbose=False)
    assert n == len(jax.tree_util.tree_leaves(state.params))
    _, nbs = ckpt.partial_load(state.batch_stats, payload["batch_stats"],
                               verbose=False)
    assert nbs == len(jax.tree_util.tree_leaves(payload["batch_stats"]))


@pytest.fixture(scope="module")
def espnet():
    import importlib.machinery
    import sys
    import types

    if "timm" not in sys.modules:
        stub = types.ModuleType("timm")
        stub.create_model = lambda *a, **k: None
        stub.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        sys.modules["timm"] = stub
    sys.path.insert(0, "/root/reference/LRS/video")
    yield None
    sys.path.remove("/root/reference/LRS/video")


def test_import_lrs_lightning_ckpt(tmp_path, espnet):
    from argparse import Namespace

    from espnet.nets.pytorch_backend.e2e_asr_transformer import E2E

    from syncvsr_tpu.config import lrs3_config
    from syncvsr_tpu.models import build_model

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
    torch.manual_seed(9)
    e2e = E2E(vocab, args).eval()
    # the released ckpt is Lightning-saved with E2E at self.model
    sd = {"model." + k: v for k, v in e2e.state_dict().items()}
    src = tmp_path / "Vox+LRS2+LRS3.ckpt"
    torch.save({"state_dict": sd, "epoch": 0}, src)
    dst = tmp_path / "lrs.msgpack"

    import_main(["lrs", str(src), str(dst), f"adim={adim}",
                 f"aheads={aheads}", f"elayers={elayers}",
                 f"dlayers={dlayers}"])

    payload = ckpt.load_msgpack(str(dst))
    config = lrs3_config().override(**{
        "model.encoder.layers": elayers, "model.encoder.dim": adim,
        "model.encoder.heads": aheads,
        "model.encoder.hidden_ratio": eunits / adim,
        "model.encoder.conv_kernel": kernel,
        "model.decoder.layers": dlayers, "model.decoder.dim": adim,
        "model.decoder.heads": aheads, "model.decoder.hidden": eunits,
        "model.labels": vocab, "model.codec.audio_vocab_size": 11,
        "model.dtype": "float32"})
    model = build_model(config)
    b, t = 2, 4
    batch = {"videos": jnp.zeros((b, t, 32, 32, 1), jnp.float32),
             "lengths": jnp.full((b,), t),
             "labels": jnp.full((b, 3), -1, jnp.int32),
             "audio_tokens": jnp.zeros((b, t * 4, 2), jnp.int32)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "mixup": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)}, **batch,
                           det=True)
    merged, n = ckpt.partial_load(variables["params"], payload["params"],
                                  verbose=False)
    # everything except the sync head (absent with codec=None) must load
    n_expected = len(jax.tree_util.tree_leaves(payload["params"]))
    assert n == n_expected, f"loaded {n}, converted {n_expected}"
    enc = model.apply({"params": merged,
                       "batch_stats": payload["batch_stats"]},
                      batch["videos"], batch["lengths"], det=True,
                      method="encode")
    assert np.all(np.isfinite(np.asarray(enc)))


def test_import_espnet_lm(tmp_path, espnet):
    import argparse

    from espnet.nets.pytorch_backend.lm.transformer import (
        TransformerLM as TorchLM,
    )

    from syncvsr_tpu.models.lm import TransformerLM

    vocab, dim, heads, layers, hidden, embed = 13, 16, 2, 2, 32, 8
    args = argparse.Namespace(
        layer=layers, unit=hidden, att_unit=dim, embed_unit=embed,
        head=heads, dropout_rate=0.0, att_dropout_rate=0.0,
        emb_dropout_rate=0.0, tie_weights=False, pos_enc="none")
    torch.manual_seed(0)
    tlm = TorchLM(vocab, args).eval()
    src = tmp_path / "lm.pth"
    torch.save(tlm.state_dict(), src)  # espnet snapshots save bare sds
    dst = tmp_path / "lm.msgpack"
    import_main(["lm", str(src), str(dst), "kind=transformer",
                 f"dim={dim}", f"heads={heads}", f"layers={layers}"])

    payload = ckpt.load_msgpack(str(dst))
    lm = TransformerLM(vocab=vocab, layers=layers, dim=dim, heads=heads,
                       hidden=hidden, embed_dim=embed, pos_enc="none")
    ys = jnp.array([[12, 3, 4]], jnp.int32)
    init = lm.init(jax.random.PRNGKey(0), ys)
    merged, n = ckpt.partial_load(init["params"], payload["params"],
                                  verbose=False)
    assert n == len(jax.tree_util.tree_leaves(init["params"]))
    logits = lm.apply({"params": merged}, ys)
    assert np.all(np.isfinite(np.asarray(logits)))

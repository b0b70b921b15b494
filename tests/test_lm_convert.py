"""Oracle tests: espnet LM checkpoints import losslessly into the flax LMs.

Reference torch modules (loaded read-only) are initialized with random
weights, converted with utils.torch_convert.convert_lm, and the flax models
must reproduce their log-probabilities — pinning the input-layer Sequential,
pre-LN block order, and LSTM gate layout (lm/transformer.py:18-250,
lm/default.py:326-428, lm/seq_rnn.py:10-178).
"""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/LRS/video"
VOCAB, DIM, HEADS, LAYERS, HIDDEN, EMBED = 13, 16, 2, 2, 32, 8


@pytest.fixture(scope="module")
def espnet():
    import importlib.machinery
    import types

    if "timm" not in sys.modules:  # encoder.py imports timm for conv3d-lrw only
        stub = types.ModuleType("timm")
        stub.create_model = lambda *a, **k: None
        stub.__spec__ = importlib.machinery.ModuleSpec("timm", None)
        sys.modules["timm"] = stub
    sys.path.insert(0, REF)
    yield None
    sys.path.remove(REF)


def _torch_transformer_lm():
    from espnet.nets.pytorch_backend.lm.transformer import TransformerLM as TorchLM

    args = argparse.Namespace(
        layer=LAYERS, unit=HIDDEN, att_unit=DIM, embed_unit=EMBED,
        head=HEADS, dropout_rate=0.0, att_dropout_rate=0.0,
        emb_dropout_rate=0.0, tie_weights=False, pos_enc="none")
    torch.manual_seed(0)
    return TorchLM(VOCAB, args).eval()


def test_transformer_lm_oracle(espnet):
    from syncvsr_tpu.models.lm import TransformerLM
    from syncvsr_tpu.utils.torch_convert import convert_lm

    tlm = _torch_transformer_lm()
    ys = np.array([[12, 3, 4, 5, 6], [12, 7, 8, 9, 10]], np.int64)
    with torch.no_grad():
        # espnet forward: embed -> encoder(causal mask) -> decoder linear
        emb = tlm.embed(torch.tensor(ys))
        h, _ = tlm.encoder(emb, tlm._target_mask(torch.tensor(ys)))
        ref_logits = tlm.decoder(h).numpy()

    lm = TransformerLM(vocab=VOCAB, layers=LAYERS, dim=DIM, heads=HEADS,
                       hidden=HIDDEN, embed_dim=EMBED, pos_enc="none")
    params = convert_lm(tlm.state_dict(), "transformer", DIM, HEADS, LAYERS)
    ours = np.asarray(lm.apply({"params": params}, jnp.asarray(ys)))
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-4, atol=2e-4)


def test_rnn_lm_oracle_seq_rnn(espnet):
    from espnet.nets.pytorch_backend.lm.seq_rnn import SequentialRNNLM

    from syncvsr_tpu.models.lm import RNNLM
    from syncvsr_tpu.utils.torch_convert import convert_lm

    # SequentialRNNLM ties ninp = nhid = args.unit (seq_rnn.py:50-56)
    args = argparse.Namespace(type="lstm", layer=LAYERS, unit=DIM,
                              dropout_rate=0.0, tie_weights=False)
    torch.manual_seed(1)
    tlm = SequentialRNNLM(VOCAB, args).eval()

    ys = np.array([[12, 3, 4, 5, 6]], np.int64)
    with torch.no_grad():
        emb = tlm.encoder(torch.tensor(ys))
        out, _ = tlm.rnn(emb.transpose(0, 1))  # seq-first
        ref_logits = tlm.decoder(out.transpose(0, 1)).numpy()

    lm = RNNLM(vocab=VOCAB, layers=LAYERS, dim=DIM, embed_dim=DIM)
    params = convert_lm(tlm.state_dict(), "rnn", DIM, 1, LAYERS)
    ours_logp = np.asarray(lm.apply({"params": params}, jnp.asarray(ys)))
    ref_logp = torch.log_softmax(torch.tensor(ref_logits), dim=-1).numpy()
    np.testing.assert_allclose(ours_logp, ref_logp, rtol=1e-4, atol=1e-4)


def test_rnn_lm_oracle_default_layout():
    """DefaultRNNLM layout (predictor.rnn.{k} nn.LSTMCell list) converts via
    the same gate mapping — emulated with plain torch modules to avoid the
    espnet DefaultRNNLM's chainer-era scaffolding."""
    from syncvsr_tpu.models.lm import RNNLM
    from syncvsr_tpu.utils.torch_convert import convert_lm

    torch.manual_seed(2)
    embed = torch.nn.Embedding(VOCAB, EMBED)
    cells = [torch.nn.LSTMCell(EMBED, DIM), torch.nn.LSTMCell(DIM, DIM)]
    lo = torch.nn.Linear(DIM, VOCAB)
    sd = {"predictor.embed.weight": embed.weight}
    for k, c in enumerate(cells):
        for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"predictor.rnn.{k}.{n}"] = getattr(c, n)
    sd["predictor.lo.weight"] = lo.weight
    sd["predictor.lo.bias"] = lo.bias

    ys = np.array([[12, 3, 4, 5]], np.int64)
    with torch.no_grad():
        x = embed(torch.tensor(ys))
        states = [None, None]
        outs = []
        for i in range(ys.shape[1]):
            h = x[:, i]
            for k, c in enumerate(cells):
                states[k] = c(h, states[k])
                h = states[k][0]
            outs.append(lo(h))
        ref_logp = torch.log_softmax(torch.stack(outs, 1), dim=-1).numpy()

    lm = RNNLM(vocab=VOCAB, layers=2, dim=DIM, embed_dim=EMBED)
    params = convert_lm(sd, "rnn", DIM, 1, 2)
    ours = np.asarray(lm.apply({"params": params}, jnp.asarray(ys)))
    np.testing.assert_allclose(ours, ref_logp, rtol=1e-4, atol=1e-4)


SENT_ARGS = [
    "preset=lrs3", 'model.frontend.kind="landmark"',
    "model.frontend.input_features=8", "model.encoder.layers=1",
    "model.encoder.dim=16", "model.encoder.heads=2",
    "model.encoder.conv_kernel=7", "model.decoder.layers=1",
    "model.decoder.dim=16", "model.decoder.heads=2",
    "model.decoder.hidden=32", "model.labels=13",
    "model.codec.audio_vocab_size=11", 'model.dtype="float32"',
    'data.dataset="synthetic"', "data.batch_size=2", "beam_size=4"]


def _run_main(monkeypatch, capsys, args):
    from syncvsr_tpu import evaluate

    monkeypatch.setattr(sys, "argv", ["evaluate"] + args)
    evaluate.main()
    capsys.readouterr()


def test_torch_lm_fusion_cli(espnet, monkeypatch, capsys, tmp_path):
    """A converted espnet torch LM at lm_weight>0 deterministically changes
    the beam hypotheses (reference LM wiring, lrs3.yaml:64-71)."""
    import json

    tlm = _torch_transformer_lm()
    torch.save(tlm.state_dict(), tmp_path / "lm.pth")
    monkeypatch.chdir(tmp_path)

    def hyps(args):
        _run_main(monkeypatch, capsys, args)
        return [json.loads(l) for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]

    lm_args = [f'lm_ckpt="{tmp_path / "lm.pth"}"', "lm_weight=0.7",
               "lm_layers=2", "lm_dim=16", "lm_heads=2", "lm_hidden=32",
               "lm_embed_dim=8"]
    base = hyps(SENT_ARGS)
    fused = hyps(SENT_ARGS + lm_args)
    fused2 = hyps(SENT_ARGS + lm_args)
    assert fused == fused2  # deterministic
    assert [h["score"] for h in base] != [h["score"] for h in fused]


def test_rnn_lm_fusion_cli(monkeypatch, capsys, tmp_path):
    """lm_kind=rnn reaches the RNNLM scorer from the CLI."""
    import json

    from syncvsr_tpu.models.lm import RNNLM
    from syncvsr_tpu.utils import checkpoint as ckpt

    lm = RNNLM(vocab=13, layers=1, dim=16, embed_dim=8)
    params = lm.init(jax.random.PRNGKey(3),
                     jnp.zeros((1, 4), jnp.int32))["params"]
    ckpt.save_msgpack(str(tmp_path / "rnnlm.msgpack"),
                      {"params": jax.device_get(params)})
    monkeypatch.chdir(tmp_path)

    def hyps(args):
        _run_main(monkeypatch, capsys, args)
        return [json.loads(l) for l in
                open(tmp_path / "hypotheses.jsonl").read().splitlines()]

    lm_args = [f'lm_ckpt="{tmp_path / "rnnlm.msgpack"}"', "lm_weight=0.7",
               'lm_kind="rnn"', "lm_layers=1", "lm_dim=16", "lm_embed_dim=8"]
    base = hyps(SENT_ARGS)
    fused = hyps(SENT_ARGS + lm_args)
    assert [h["score"] for h in base] != [h["score"] for h in fused]

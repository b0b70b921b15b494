"""Numerical parity against the reference's own Flax landmark model.

Loads the reference implementation (read-only, /root/reference/LRW/landmark)
as an oracle, maps its randomly-initialized parameters into this framework's
naming, and requires the word logits to match. This pins the architecture
(RoPE convention, pre-LN ordering, CLS readout, head wiring) numerically, not
just by inspection.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_DIR = "/root/reference/LRW/landmark/src"


@pytest.fixture(scope="module")
def ref_transformer():
    # Both reference sub-stacks ship a top-level `utils.py`; purge any cached
    # one (the LRS oracle fixture may have imported it first) so the landmark
    # modeling module binds the right sibling.
    import importlib

    saved = {k: sys.modules.pop(k) for k in ("utils", "modeling")
             if k in sys.modules}
    sys.path.insert(0, REF_DIR)
    try:
        modeling = importlib.import_module("modeling")
        yield modeling
    finally:
        sys.path.remove(REF_DIR)
        for k in ("utils", "modeling"):
            sys.modules.pop(k, None)
        sys.modules.update(saved)


def test_word_logits_match_reference(ref_transformer):
    from syncvsr_tpu.config import lrw_landmark_config
    from syncvsr_tpu.models import build_model

    layers, dim, heads, labels, feats, t = 2, 32, 2, 11, 12, 6

    ref_model = ref_transformer.Transformer(
        layers=layers, dim=dim, heads=heads, labels=labels,
        emb_dropout=0.0, msa_dropout=0.0, mlp_dropout=0.0, droppath=0.0,
        use_word_boundary=False)
    x = jnp.asarray(np.random.RandomState(0).randn(3, t, feats), jnp.float32)
    ref_vars = ref_model.init({"params": jax.random.PRNGKey(0)}, x, det=True)
    ref_logits, ref_seq = ref_model.apply(ref_vars, x, det=True)

    config = lrw_landmark_config().override(**{
        "model.encoder.layers": layers, "model.encoder.dim": dim,
        "model.encoder.heads": heads, "model.labels": labels,
        "model.frontend.input_features": feats, "model.dtype": "float32",
        "model.encoder.emb_dropout": 0.0, "model.encoder.msa_dropout": 0.0,
        "model.encoder.mlp_dropout": 0.0, "model.encoder.droppath": 0.0,
        "data.use_cutmix": False})
    ours = build_model(config)
    batch = {
        "inputs": x,
        "labels": jnp.zeros((3,), jnp.int32),
        "audio_tokens": jnp.zeros((3, t * 4, 2), jnp.int32),
    }
    our_vars = ours.init({"params": jax.random.PRNGKey(1),
                          "mixup": jax.random.PRNGKey(2),
                          "dropout": jax.random.PRNGKey(3)}, **batch, det=True)

    # ---- map reference params into our tree -----------------------------
    rp = jax.tree_util.tree_map(np.asarray, ref_vars["params"])
    op = jax.device_get(our_vars["params"])

    op["frontend"]["wte"]["kernel"] = rp["wte"]["kernel"][0]  # Conv(1,) -> Dense
    op["frontend"]["wte"]["bias"] = rp["wte"]["bias"]
    op["cls_token"] = rp["cls_token"]
    for i in range(layers):
        src = rp[f"layer_{i}"]
        dst = op["encoder"][f"block_{i}"]
        for w in ("wq", "wk", "wv", "wo"):
            dst["attn"][w]["kernel"] = src["attn"][w]["kernel"]
            dst["attn"][w]["bias"] = src["attn"][w]["bias"]
        dst["ff"]["wi"]["kernel"] = src["ff"]["w1"]["kernel"]
        dst["ff"]["wi"]["bias"] = src["ff"]["w1"]["bias"]
        dst["ff"]["wo"]["kernel"] = src["ff"]["w2"]["kernel"]
        dst["ff"]["wo"]["bias"] = src["ff"]["w2"]["bias"]
        dst["norm_attn"]["LayerNorm_0"]["scale"] = src["norm_attn"]["scale"]
        dst["norm_attn"]["LayerNorm_0"]["bias"] = src["norm_attn"]["bias"]
        dst["norm_ff"]["LayerNorm_0"]["scale"] = src["norm_ff"]["scale"]
        dst["norm_ff"]["LayerNorm_0"]["bias"] = src["norm_ff"]["bias"]
    final = [k for k in op["encoder"] if k.startswith("LayerNorm")]
    op["encoder"][final[0]]["LayerNorm_0"]["scale"] = rp["norm"]["scale"]
    op["encoder"][final[0]]["LayerNorm_0"]["bias"] = rp["norm"]["bias"]
    op["category_classifier"]["kernel"] = rp["head"]["kernel"]
    op["category_classifier"]["bias"] = rp["head"]["bias"]

    metrics, logits = _forward_logits(ours, op, batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)


def _forward_logits(model, params, batch):
    """Run our model and also recover the word logits via a capture."""
    import flax.linen as nn

    logits_box = {}
    orig = nn.Dense.__call__

    def spy(self, x):
        y = orig(self, x)
        if self.name == "category_classifier" or "category" in str(self.name):
            logits_box["logits"] = y
        return y

    nn.Dense.__call__ = spy
    try:
        metrics = model.apply({"params": params}, **batch, det=True)
    finally:
        nn.Dense.__call__ = orig
    return metrics, logits_box["logits"]

"""Torch->Flax conversion verified numerically against real torch modules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from syncvsr_tpu.models.resnet import ResNetTrunk  # noqa: E402
from syncvsr_tpu.utils.torch_convert import (  # noqa: E402
    convert_frontend,
    convert_linear,
    convert_resnet_trunk,
    convert_sync_head,
)


class TorchBasicBlock(tnn.Module):
    """timm/torchvision-style BasicBlock with ReLU."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        self.relu = tnn.ReLU()

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


def make_torch_trunk(width=8):
    layers = {}
    cin = width
    mods = tnn.ModuleDict()
    for i in range(4):
        cout = width * (2 ** i)
        blocks = tnn.Sequential(
            TorchBasicBlock(cin, cout, 1 if i == 0 else 2),
            TorchBasicBlock(cout, cout, 1))
        mods[f"layer{i + 1}"] = blocks
        cin = cout
    return mods


def test_resnet_trunk_conversion_matches_torch():
    torch.manual_seed(0)
    width = 8
    trunk_t = make_torch_trunk(width)
    trunk_t.eval()
    # randomize BN stats so running stats actually matter
    for m in trunk_t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    sd = {f"resnet.{k}": v for k, v in trunk_t.state_dict().items()}
    params, stats = convert_resnet_trunk(sd, "resnet.")

    x = np.random.RandomState(0).randn(2, 16, 16, width).astype(np.float32)
    with torch.no_grad():
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        for i in range(4):
            xt = trunk_t[f"layer{i + 1}"](xt)
        expected = xt.mean((2, 3)).numpy()

    trunk_f = ResNetTrunk(width=width, relu_type="relu", dtype=jnp.float32)
    got = trunk_f.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_frontend_conversion_shapes():
    torch.manual_seed(1)
    stem = tnn.Sequential(
        tnn.Conv3d(1, 8, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
        tnn.BatchNorm3d(8))
    trunk = make_torch_trunk(8)
    sd = {f"stem3d.{k}": v for k, v in stem.state_dict().items()}
    sd.update({f"resnet.{k}": v for k, v in trunk.state_dict().items()})
    params, stats = convert_frontend(sd)
    assert params["stem_conv_kernel"].shape == (5, 7, 7, 1, 8)
    assert params["stem_bn"]["scale"].shape == (8,)
    assert stats["resnet"]["layer2_0"]["bn1"]["mean"].shape == (16,)
    assert "downsample_conv" in params["resnet"]["layer2_0"]


def test_linear_and_sync_head_conversion():
    torch.manual_seed(2)
    lin = tnn.Linear(6, 10)
    sd = {f"audio_projection.{k}": v for k, v in lin.state_dict().items()}
    head = convert_sync_head(sd)
    x = np.random.randn(3, 6).astype(np.float32)
    with torch.no_grad():
        expected = lin(torch.tensor(x)).numpy()
    got = x @ head["kernel"] + head["bias"]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

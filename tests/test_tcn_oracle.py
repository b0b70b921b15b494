"""Numerical parity of the classic/multibranch TCN family against the
reference's in-tree torch modules (LRW/video/src/tcn/models/tcn.py:121-254),
same treatment as the conformer/decoder/landmark oracles: random torch
weights converted into the flax modules must reproduce eval-mode outputs."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/LRW/video/src"


@pytest.fixture(scope="module")
def ref_tcn():
    sys.path.insert(0, REF)
    yield None
    sys.path.remove(REF)


def _bn_perturb(mod, rng):
    """Random running stats so the oracle actually exercises BN conversion."""
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.tensor(
                rng.rand(m.num_features).astype(np.float32) + 0.5))


@pytest.mark.parametrize("relu_type", ["relu", "swish"])
def test_temporal_conv_net_oracle(ref_tcn, relu_type):
    from tcn.models.tcn import TemporalConvNet as TorchTCN

    from syncvsr_tpu.models.tcn import TemporalConvNet
    from syncvsr_tpu.utils.torch_convert import convert_tcn

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    channels, kernel, c_in, t, b = (12, 12, 12), 3, 8, 11, 2
    ttcn = TorchTCN(c_in, list(channels), {"kernel_size": kernel},
                    dropout=0.0, relu_type=relu_type).eval()
    with torch.no_grad():
        _bn_perturb(ttcn, rng)
        x = rng.randn(b, c_in, t).astype(np.float32)
        ref = ttcn(torch.tensor(x)).numpy().transpose(0, 2, 1)  # -> [B,T,C]

    net = TemporalConvNet(channels=channels, kernel=kernel, dropout=0.0,
                          relu_type=relu_type)
    params, stats = convert_tcn(ttcn.state_dict(), len(channels))
    ours = np.asarray(net.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 1)), False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("relu_type", ["relu", "swish"])
def test_multibranch_tcn_oracle(ref_tcn, relu_type):
    from tcn.models.tcn import MultibranchTemporalConvNet as TorchMSTCN

    from syncvsr_tpu.models.tcn import MultibranchTemporalConvNet
    from syncvsr_tpu.utils.torch_convert import convert_mstcn

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    channels, ksizes, c_in, t, b = (12, 12), (3, 5), 8, 11, 2
    ttcn = TorchMSTCN(c_in, list(channels), {"kernel_size": list(ksizes)},
                      dropout=0.0, relu_type=relu_type).eval()
    with torch.no_grad():
        _bn_perturb(ttcn, rng)
        x = rng.randn(b, c_in, t).astype(np.float32)
        ref = ttcn(torch.tensor(x)).numpy().transpose(0, 2, 1)

    net = MultibranchTemporalConvNet(channels=channels, kernel_sizes=ksizes,
                                     dropout=0.0, relu_type=relu_type)
    params, stats = convert_mstcn(ttcn.state_dict(), len(channels),
                                  len(ksizes))
    # the reference quirk: every block carries a downsample conv
    assert all("downsample" in params[f"block_{i}"]
               for i in range(len(channels)))
    ours = np.asarray(net.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 1)), False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

"""MobileNetV2 trunk converter fidelity: build a torch mirror with the
torchvision ``mobilenet_v2`` state_dict key layout (torchvision itself is
not installed), randomize weights AND BatchNorm running stats, convert with
``convert_torch_mobilenet_v2``, and require the JAX folded-BN forward to
match torch eval mode (VERDICT r2 weak #6; reference `video/utils.py:14`
loads the magenta hub stylizer whose distilled variant uses this trunk).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from aip_tpu.models.mobilenet import (
    MBV2_CFG, MBV2_FEATURES, convert_torch_mobilenet_v2, init_mbv2_trunk,
    mbv2_features,
)

torch.manual_seed(0)


def _bn(c):
    bn = nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(c) + 0.5)
        bn.bias.copy_(torch.randn(c) * 0.1)
        bn.running_mean.copy_(torch.randn(c) * 0.1)
        bn.running_var.copy_(torch.rand(c) + 0.5)
    return bn


def _conv_bn_relu(cin, cout, k=3, s=1, groups=1):
    # torchvision Conv2dNormActivation: Sequential(Conv2d, BN, ReLU6)
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, groups=groups,
                  bias=False),
        _bn(cout),
        nn.ReLU6(inplace=True))


class InvertedResidual(nn.Module):
    """torchvision InvertedResidual: self.conv is a Sequential whose
    children give the ``features.{i}.conv.{j}`` key layout."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        layers = []
        if expand != 1:
            layers.append(_conv_bn_relu(cin, hidden, k=1))
        layers += [
            _conv_bn_relu(hidden, hidden, k=3, s=stride, groups=hidden),
            nn.Conv2d(hidden, cout, 1, bias=False),
            _bn(cout),
        ]
        self.conv = nn.Sequential(*layers)
        self.residual = stride == 1 and cin == cout

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.residual else y


class TorchMBV2(nn.Module):
    def __init__(self):
        super().__init__()
        feats = [_conv_bn_relu(3, 32, k=3, s=2)]
        cin = 32
        for t, c, n, s in MBV2_CFG:
            for i in range(n):
                feats.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(_conv_bn_relu(cin, MBV2_FEATURES, k=1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        y = self.features(x)
        return y.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def mirror():
    return TorchMBV2().eval()


def test_state_dict_layout_matches_torchvision(mirror):
    """The mirror must expose exactly the torchvision key shapes the
    converter documents (spot checks)."""
    sd = mirror.state_dict()
    assert sd["features.0.0.weight"].shape == (32, 3, 3, 3)
    assert sd["features.1.conv.0.0.weight"].shape == (32, 1, 3, 3)  # t=1 dw
    assert sd["features.2.conv.0.0.weight"].shape == (96, 16, 1, 1)  # expand
    assert sd["features.18.0.weight"].shape == (1280, 320, 1, 1)


def test_converted_features_match_torch(mirror):
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    trunk = convert_torch_mobilenet_v2(sd)
    x = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(mbv2_features(trunk, jnp.asarray(x)))
    with torch.no_grad():
        want = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == (2, MBV2_FEATURES)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_random_init_structure_matches_converter(mirror):
    """Random init and the converter must produce identical pytree
    structures (so npz roundtrips and optimizers treat them the same)."""
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    conv = convert_torch_mobilenet_v2(sd)
    rand = init_mbv2_trunk(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(conv)
            == jax.tree_util.tree_structure(rand))
    for a, b in zip(jax.tree_util.tree_leaves(conv),
                    jax.tree_util.tree_leaves(rand)):
        assert a.shape == b.shape

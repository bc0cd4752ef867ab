"""Converter fidelity for the style-mixer / NST backbones (VERDICT r3 #4).

torchvision is not installed; following test_midas_fidelity.py's pattern,
each test hand-builds a torch mirror with the torchvision state_dict KEY
LAYOUT and architecture (reference surfaces: `gui/seven_page.py:123-229`
feature extractors, `spatial_variation/StyleTransfer.py:20-29`,
`mixing_texture_gyum/vgg_model.py`), loads random weights, converts through
our converter, and requires the JAX forward to match the torch forward.
A key-coverage spy guards against silently ignored weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


def _randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand(bn.num_features) + 0.5)
        bn.bias.copy_(torch.randn(bn.num_features) * 0.1)
        bn.running_mean.copy_(torch.randn(bn.num_features) * 0.1)
        bn.running_var.copy_(torch.rand(bn.num_features) + 0.5)
    return bn


def _spy_convert(convert, sd):
    consumed = set()

    class Spy(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return sd[k]

        def __contains__(self, k):
            return k in sd

    params = convert(Spy())
    ignorable = {k for k in sd if k.endswith("num_batches_tracked")}
    missing = set(sd) - consumed - ignorable
    return params, missing


def _rel(a, b):
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


# ---------------------------------------------------------------------------
# ResNet-50 (torchvision bottleneck-v1.5 layout)
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    def __init__(self, cin, width, out, stride=1, dilation=1,
                 first_dilation=None, downsample=False):
        super().__init__()
        d = first_dilation if first_dilation is not None else dilation
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = _randomize_bn(nn.BatchNorm2d(width))
        self.conv2 = nn.Conv2d(width, width, 3, stride, padding=d,
                               dilation=d, bias=False)
        self.bn2 = _randomize_bn(nn.BatchNorm2d(width))
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = _randomize_bn(nn.BatchNorm2d(out))
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out, 1, stride, bias=False),
                _randomize_bn(nn.BatchNorm2d(out)))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNetMirror(nn.Module):
    """torchvision resnet key layout (conv1/bn1/layer1..4); ``stages`` is
    (blocks, width, out, stride, dilation, first_dilation) per stage."""

    def __init__(self, stages):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = _randomize_bn(nn.BatchNorm2d(64))
        cin = 64
        for si, (blocks, width, out, stride, dil, fdil) in enumerate(stages):
            layer = [Bottleneck(cin, width, out, stride=stride,
                                dilation=dil, first_dilation=fdil,
                                downsample=True)]
            for _ in range(1, blocks):
                layer.append(Bottleneck(out, width, out, dilation=dil))
            setattr(self, f"layer{si + 1}", nn.Sequential(*layer))
            cin = out

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        taps = []
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
            taps.append(x)
        return taps


def test_resnet50_converter_matches_torch_mirror(rng):
    from aip_tpu.models.resnet import _convert_torch_resnet, resnet50_features

    mirror = ResNetMirror(((3, 64, 256, 1, 1, 1), (4, 128, 512, 2, 1, 1),
                           (6, 256, 1024, 2, 1, 1),
                           (3, 512, 2048, 2, 1, 1))).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, missing = _spy_convert(_convert_torch_resnet, sd)
    assert not missing, sorted(missing)[:10]

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        refs = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = resnet50_features(params, jnp.asarray(x))
    for si in range(4):
        ours = np.asarray(feats[f"layer{si + 1}"]).transpose(0, 3, 1, 2)
        ref = refs[si].numpy()
        assert ours.shape == ref.shape, (si, ours.shape, ref.shape)
        assert _rel(ours, ref) < 1e-4, (si, _rel(ours, ref))


# ---------------------------------------------------------------------------
# DenseNet-121
# ---------------------------------------------------------------------------

class DenseLayer(nn.Module):
    def __init__(self, cin, growth=32):
        super().__init__()
        self.norm1 = _randomize_bn(nn.BatchNorm2d(cin))
        self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = _randomize_bn(nn.BatchNorm2d(4 * growth))
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class DenseNetMirror(nn.Module):
    """torchvision densenet121 'features.*' key layout."""

    def __init__(self):
        super().__init__()
        from aip_tpu.models.densenet import BLOCK_CONFIG, GROWTH, INIT_FEATURES

        f = nn.Module()
        f.conv0 = nn.Conv2d(3, INIT_FEATURES, 7, 2, 3, bias=False)
        f.norm0 = _randomize_bn(nn.BatchNorm2d(INIT_FEATURES))
        c = INIT_FEATURES
        for bi, n_layers in enumerate(BLOCK_CONFIG):
            block = nn.Module()
            for li in range(n_layers):
                setattr(block, f"denselayer{li + 1}",
                        DenseLayer(c + li * GROWTH, GROWTH))
            setattr(f, f"denseblock{bi + 1}", block)
            c += n_layers * GROWTH
            if bi < 3:
                t = nn.Module()
                t.norm = _randomize_bn(nn.BatchNorm2d(c))
                t.conv = nn.Conv2d(c, c // 2, 1, bias=False)
                setattr(f, f"transition{bi + 1}", t)
                c //= 2
        f.norm5 = _randomize_bn(nn.BatchNorm2d(c))
        self.features = f
        self.block_config = BLOCK_CONFIG

    def forward(self, x):
        f = self.features
        x = F.relu(f.norm0(f.conv0(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        taps = []
        for bi, n_layers in enumerate(self.block_config):
            block = getattr(f, f"denseblock{bi + 1}")
            for li in range(n_layers):
                x = getattr(block, f"denselayer{li + 1}")(x)
            if bi < 3:
                taps.append(x)
                t = getattr(f, f"transition{bi + 1}")
                x = t.conv(F.relu(t.norm(x)))
                x = F.avg_pool2d(x, 2, 2)
        taps.append(f.norm5(x))
        return taps


def test_densenet121_converter_matches_torch_mirror(rng):
    from aip_tpu.models.densenet import (_convert_torch_densenet,
                                         densenet121_features)

    mirror = DenseNetMirror().eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, missing = _spy_convert(_convert_torch_densenet, sd)
    assert not missing, sorted(missing)[:10]

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        refs = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = densenet121_features(params, jnp.asarray(x))
    for si in range(4):
        ours = np.asarray(feats[f"layer{si + 1}"]).transpose(0, 3, 1, 2)
        ref = refs[si].numpy()
        assert ours.shape == ref.shape, (si, ours.shape, ref.shape)
        assert _rel(ours, ref) < 1e-4, (si, _rel(ours, ref))


# ---------------------------------------------------------------------------
# VGG-19 (ImageNet torchvision 'features' stack, pre-ReLU taps)
# ---------------------------------------------------------------------------

def _vgg19_torch():
    from aip_tpu.models.vgg19_std import VGG19_CONVS

    layers, idx = [], 0
    for spec in VGG19_CONVS:
        if spec[0] == "pool":
            layers.append(nn.MaxPool2d(2, 2))
            idx += 1
            continue
        _, cin, cout, tv_idx = spec
        assert idx == tv_idx, (idx, tv_idx)
        layers.append(nn.Conv2d(cin, cout, 3, padding=1))
        layers.append(nn.ReLU())
        idx += 2
    return nn.Sequential(*layers)


def test_vgg19_std_converter_matches_torch(rng, tmp_path, monkeypatch):
    from aip_tpu.models import weights as weights_mod
    from aip_tpu.models.vgg19_std import (NST_STYLE_LAYERS, VGG19_CONVS,
                                          conv_specs, extract_features)

    mirror = _vgg19_torch().eval()
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in mirror.state_dict().items()}
    idxs = [f"features.{s[3]}" for s in conv_specs()]
    params = weights_mod.convert_torch_sequential(sd, idxs)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    taps = NST_STYLE_LAYERS + ("conv4_2",)
    feats = extract_features(params, jnp.asarray(x), taps)

    # Torch reference: capture PRE-ReLU conv outputs at the same indices.
    captured = {}
    tv_index_of = {s[0]: s[3] for s in conv_specs()}
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y = xt
        for i, layer in enumerate(mirror):
            y = layer(y)
            for name, tvi in tv_index_of.items():
                if i == tvi and name in taps:
                    captured[name] = y.numpy()
    for name in taps:
        ours = np.asarray(feats[name]).transpose(0, 3, 1, 2)
        assert ours.shape == captured[name].shape, name
        assert _rel(ours, captured[name]) < 1e-4, (name, _rel(ours, captured[name]))

"""MiDaS-small converter fidelity: build a torch mirror of the hub
``MidasNet_small`` (efficientnet-lite3 + expand-mode fusion decoder) with
random weights, export a hub-style state_dict, convert with
``_convert_torch_midas``, and require the JAX forward to match the torch
forward (VERDICT r1 missing #1; reference `AdaIN/test.py:87-97`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from aip_tpu.models.midas import (
    _STAGES, _STEM, _convert_torch_midas, midas_inverse_depth,
    init_midas_params,
)

torch.manual_seed(0)


class Conv2dSame(nn.Conv2d):
    """timm's TF-SAME conv used for stride-2 convs in tf_ efficientnets."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max(kh - sh, 0) if ih % sh == 0 else max(kh - ih % sh, 0)
        pw = max(kw - sw, 0) if iw % sw == 0 else max(kw - iw % sw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _conv(cin, cout, k, s=1, groups=1, bias=False):
    if s == 1:
        return nn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, groups=groups,
                         bias=bias)
    return Conv2dSame(cin, cout, k, s, groups=groups, bias=bias)


def _bn(c):
    bn = nn.BatchNorm2d(c, eps=1e-3)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(c) + 0.5)
        bn.bias.copy_(torch.randn(c) * 0.1)
        bn.running_mean.copy_(torch.randn(c) * 0.1)
        bn.running_var.copy_(torch.rand(c) + 0.5)
    return bn


class DSConv(nn.Module):
    """timm DepthwiseSeparableConv (expand ratio 1)."""

    def __init__(self, cin, cout, k, s):
        super().__init__()
        self.conv_dw = _conv(cin, cin, k, s, groups=cin)
        self.bn1 = _bn(cin)
        self.conv_pw = _conv(cin, cout, 1)
        self.bn2 = _bn(cout)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        y = F.relu6(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(y))
        return x + y if self.residual else y


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, k, s, expand):
        super().__init__()
        mid = cin * expand
        self.conv_pw = _conv(cin, mid, 1)
        self.bn1 = _bn(mid)
        self.conv_dw = _conv(mid, mid, k, s, groups=mid)
        self.bn2 = _bn(mid)
        self.conv_pwl = _conv(mid, cout, 1)
        self.bn3 = _bn(cout)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        y = F.relu6(self.bn1(self.conv_pw(x)))
        y = F.relu6(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.residual else y


class ResidualConvUnit(nn.Module):
    def __init__(self, feat):
        super().__init__()
        self.conv1 = _conv(feat, feat, 3, bias=True)
        self.conv2 = _conv(feat, feat, 3, bias=True)

    def forward(self, x):
        y = self.conv1(F.relu(x))
        y = self.conv2(F.relu(y))
        return x + y


class FeatureFusion(nn.Module):
    def __init__(self, feat, expand):
        super().__init__()
        self.out_conv = nn.Conv2d(feat, feat // 2 if expand else feat, 1,
                                  bias=True)
        self.resConfUnit1 = ResidualConvUnit(feat)
        self.resConfUnit2 = ResidualConvUnit(feat)

    def forward(self, *xs):
        y = xs[0]
        if len(xs) == 2:
            y = y + self.resConfUnit1(xs[1])
        y = self.resConfUnit2(y)
        y = F.interpolate(y, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(y)


class MidasMirror(nn.Module):
    """Hub MidasNet_small(features=64, efficientnet_lite3, expand) mirror
    with hub state_dict key layout."""

    def __init__(self):
        super().__init__()

        def make_stage(si, cin):
            expand, cout, repeats, stride, k = _STAGES[si]
            blocks = []
            for r in range(repeats):
                s = stride if r == 0 else 1
                if expand == 1:
                    blocks.append(DSConv(cin, cout, k, s))
                else:
                    blocks.append(InvertedResidual(cin, cout, k, s, expand))
                cin = cout
            return nn.Sequential(*blocks), cout

        stage0, c = make_stage(0, _STEM)
        stage1, c = make_stage(1, c)
        stage2, c = make_stage(2, c)
        stage3, c = make_stage(3, c)
        stage4, c = make_stage(4, c)
        stage5, c = make_stage(5, c)
        stage6, c = make_stage(6, c)

        self.pretrained = nn.Module()
        self.pretrained.layer1 = nn.Sequential(
            _conv(3, _STEM, 3, 2), _bn(_STEM), nn.ReLU6(), stage0, stage1)
        self.pretrained.layer2 = nn.Sequential(stage2)
        self.pretrained.layer3 = nn.Sequential(stage3, stage4)
        self.pretrained.layer4 = nn.Sequential(stage5, stage6)

        feats = (64, 128, 256, 512)
        self.scratch = nn.Module()
        self.scratch.layer1_rn = _conv(32, feats[0], 3)
        self.scratch.layer2_rn = _conv(48, feats[1], 3)
        self.scratch.layer3_rn = _conv(136, feats[2], 3)
        self.scratch.layer4_rn = _conv(384, feats[3], 3)
        self.scratch.refinenet1 = FeatureFusion(feats[0], expand=False)
        self.scratch.refinenet2 = FeatureFusion(feats[1], expand=True)
        self.scratch.refinenet3 = FeatureFusion(feats[2], expand=True)
        self.scratch.refinenet4 = FeatureFusion(feats[3], expand=True)
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(64, 32, 3, padding=1, bias=True),
            nn.Identity(),  # Interpolate(x2) applied in forward
            nn.Conv2d(32, 32, 3, padding=1, bias=True),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1, bias=True),
            nn.ReLU(),
            nn.Identity(),
        )

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)

        rn1 = self.scratch.layer1_rn(l1)
        rn2 = self.scratch.layer2_rn(l2)
        rn3 = self.scratch.layer3_rn(l3)
        rn4 = self.scratch.layer4_rn(l4)

        p4 = self.scratch.refinenet4(rn4)
        p3 = self.scratch.refinenet3(p4, rn3)
        p2 = self.scratch.refinenet2(p3, rn2)
        p1 = self.scratch.refinenet1(p2, rn1)

        oc = self.scratch.output_conv
        y = oc[0](p1)
        y = F.interpolate(y, scale_factor=2, mode="bilinear",
                          align_corners=False)
        y = oc[4](oc[3](oc[2](y)))
        return oc[5](y)


@pytest.fixture(scope="module")
def mirror():
    return MidasMirror().eval()


def test_midas_converter_matches_torch_mirror(mirror, rng):
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = _convert_torch_midas(sd)

    x01 = rng.random((1, 64, 64, 3)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.from_numpy(((x01 - mean) / std).transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = mirror(xt).numpy()[0, 0]

    out = np.asarray(midas_inverse_depth(params, jnp.asarray(x01)))[0]
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    scale = max(np.abs(ref).max(), 1e-6)
    assert err / scale < 1e-4, (err, scale)


def test_midas_random_init_runs(rng):
    """The random-init path (no checkpoint) must produce a finite map of the
    right shape at hub working resolution."""
    params = init_midas_params(jax.random.PRNGKey(0))
    x01 = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(midas_inverse_depth(params, x01))
    assert out.shape == (1, 64, 64)
    assert np.isfinite(out).all()


def test_midas_converter_key_coverage(mirror):
    """Every mirror tensor must be consumed by the converter (no silently
    ignored weights)."""
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    consumed = set()

    class Spy(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return sd[k]

        def __contains__(self, k):
            return k in sd

    _convert_torch_midas(Spy())
    ignorable = {k for k in sd if k.endswith("num_batches_tracked")}
    missing = set(sd) - consumed - ignorable
    assert not missing, sorted(missing)[:10]


def test_use_midas_registers_estimator(rng, monkeypatch):
    """use_midas must install a working MiDaS estimator behind
    estimate_proximity (the reference's depth path wiring)."""
    from aip_tpu.models import depthnet
    from aip_tpu.models import midas as midas_mod

    monkeypatch.setattr(depthnet, "_REGISTERED", None)
    monkeypatch.setattr(midas_mod, "get_midas_params",
                        lambda p=None: init_midas_params(jax.random.PRNGKey(0)))
    midas_mod.use_midas("unused.pt")
    img = rng.random((40, 52, 3)).astype(np.float32)
    prox = np.asarray(depthnet.estimate_proximity(img))
    assert prox.shape == (40, 52)
    assert np.isfinite(prox).all()

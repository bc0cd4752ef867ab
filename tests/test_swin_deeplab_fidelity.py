"""Converter fidelity for Swin-T and DeepLabV3-ResNet101 (VERDICT r3 #4).

Hand-built torch mirrors of the torchvision architectures and state_dict
key layouts (torchvision itself is not installed), fed random weights,
converted through our converters, forward outputs compared. Reference
surfaces: `gui/seven_page.py:189-229` (SwinFeatureExtractor) and
`localized_style_transfer.py:171-188` (deeplabv3_resnet101 mask).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.test_backbone_fidelity import (ResNetMirror, _randomize_bn,
                                          _rel, _spy_convert)

torch.manual_seed(1)


# ---------------------------------------------------------------------------
# Swin-T mirror (torchvision.models.swin_transformer, v1 semantics)
# ---------------------------------------------------------------------------

def _swin_attention(x, qkv, proj, bias_table, rel_index, window, shift,
                    heads):
    """torchvision shifted_window_attention (eval; no dropout)."""
    b, h, w, c = x.shape
    pad_r = (window - w % window) % window
    pad_b = (window - h % window) % window
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, ph, pw, _ = x.shape
    sh = 0 if window >= ph else shift
    sw = 0 if window >= pw else shift
    if sh or sw:
        x = torch.roll(x, (-sh, -sw), dims=(1, 2))
    nh, nw = ph // window, pw // window
    t = window * window
    xw = x.view(b, nh, window, nw, window, c).permute(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * nh * nw, t, c)

    q, k, v = F.linear(xw, qkv.weight, qkv.bias).reshape(
        xw.size(0), t, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    attn = (q * (c // heads) ** -0.5) @ k.transpose(-2, -1)
    bias = bias_table[rel_index].view(t, t, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if sh or sw:
        mask = x.new_zeros((ph, pw))
        h_slices = ((0, -window), (-window, -sh if sh else None),
                    (-sh if sh else None, None))
        w_slices = ((0, -window), (-window, -sw if sw else None),
                    (-sw if sw else None, None))
        cnt = 0
        for hs in h_slices:
            for ws in w_slices:
                mask[hs[0]:hs[1], ws[0]:ws[1]] = cnt
                cnt += 1
        mw = mask.view(nh, window, nw, window).permute(0, 2, 1, 3).reshape(-1, t)
        am = (mw.unsqueeze(1) - mw.unsqueeze(2)) != 0
        attn = attn.view(b, nh * nw, heads, t, t) + (
            am.float() * -100.0).unsqueeze(1)
        attn = attn.view(-1, heads, t, t)
    attn = F.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(xw.size(0), t, c)
    out = F.linear(out, proj.weight, proj.bias)
    out = out.view(b, nh, nw, window, window, c).permute(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ph, pw, c)
    if sh or sw:
        out = torch.roll(out, (sh, sw), dims=(1, 2))
    return out[:, :h, :w, :]


class SwinBlock(nn.Module):
    def __init__(self, dim, heads, shift, window=7):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.attn.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.1)
        from aip_tpu.models.swin import _rel_index

        self.register_buffer("rel_index",
                             torch.from_numpy(_rel_index(window).reshape(-1)))
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Identity(), nn.Linear(4 * dim, dim))
        self.heads, self.shift, self.window = heads, shift, window

    def forward(self, x):
        x = x + _swin_attention(self.norm1(x), self.attn.qkv, self.attn.proj,
                                self.attn.relative_position_bias_table,
                                self.rel_index, self.window, self.shift,
                                self.heads)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        h, w = x.shape[1], x.shape[2]
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class SwinMirror(nn.Module):
    """torchvision swin_t 'features.{0..7}' + 'norm' key layout."""

    def __init__(self):
        super().__init__()
        from aip_tpu.models.swin import DEPTHS, EMBED, HEADS, WINDOW

        feats = [nn.Sequential(nn.Conv2d(3, EMBED, 4, 4), nn.Identity(),
                               nn.LayerNorm(EMBED))]
        dim = EMBED
        for si, depth in enumerate(DEPTHS):
            feats.append(nn.Sequential(*[
                SwinBlock(dim, HEADS[si], shift=(WINDOW // 2 if bi % 2 else 0))
                for bi in range(depth)]))
            if si < 3:
                feats.append(PatchMerging(dim))
                dim *= 2
        self.features = nn.Sequential(*feats)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.features[0][0](x).permute(0, 2, 3, 1)
        x = self.features[0][2](x)
        taps = []
        for i in (1, 2, 3, 4, 5, 6, 7):
            m = self.features[i]
            x = m(x)
            if i in (1, 3, 5, 7):
                taps.append(x)
        taps.append(self.norm(x))
        return taps


def test_swin_t_converter_matches_torch_mirror(rng):
    from aip_tpu.models.swin import _convert_torch_swin, swin_t_features

    mirror = SwinMirror().eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, missing = _spy_convert(_convert_torch_swin, sd)
    # relative_position_index is a derived buffer; everything else must be
    # consumed.
    missing = {k for k in missing if "rel_index" not in k}
    assert not missing, sorted(missing)[:10]

    # 64x64 input: stage maps 16, 8, 4(pad->7), 2(pad->7) — exercises
    # padding, the per-axis shift-disable rule, and both merge parities.
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        refs = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = swin_t_features(params, jnp.asarray(x))
    for si in range(4):
        ours = np.asarray(feats[f"layer{si + 1}"])
        ref = refs[si].numpy()
        assert ours.shape == ref.shape, (si, ours.shape, ref.shape)
        assert _rel(ours, ref) < 2e-4, (si, _rel(ours, ref))
    assert _rel(np.asarray(feats["swin"]), refs[4].numpy()) < 2e-4


def test_swin_t_224_matches_torch_mirror(rng):
    """The style mixer's actual working size (224): no padding anywhere,
    7x7 final stage hits the shift-disable rule."""
    from aip_tpu.models.swin import _convert_torch_swin, swin_t_features

    mirror = SwinMirror().eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = _convert_torch_swin(sd)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        refs = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = swin_t_features(params, jnp.asarray(x))
    assert _rel(np.asarray(feats["swin"]), refs[4].numpy()) < 2e-4


# ---------------------------------------------------------------------------
# DeepLabV3-ResNet101
# ---------------------------------------------------------------------------

class DeepLabMirror(nn.Module):
    """torchvision deeplabv3_resnet101 'backbone.*' / 'classifier.*' keys."""

    def __init__(self):
        super().__init__()
        from aip_tpu.models.deeplab import ASPP_RATES, NUM_CLASSES, STAGES

        self.backbone = ResNetMirror(STAGES)
        aspp = nn.Module()
        convs = nn.ModuleList()
        convs.append(nn.Sequential(nn.Conv2d(2048, 256, 1, bias=False),
                                   _randomize_bn(nn.BatchNorm2d(256)),
                                   nn.ReLU()))
        for r in ASPP_RATES:
            convs.append(nn.Sequential(
                nn.Conv2d(2048, 256, 3, padding=r, dilation=r, bias=False),
                _randomize_bn(nn.BatchNorm2d(256)), nn.ReLU()))
        convs.append(nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                   nn.Conv2d(2048, 256, 1, bias=False),
                                   _randomize_bn(nn.BatchNorm2d(256)),
                                   nn.ReLU()))
        aspp.convs = convs
        aspp.project = nn.Sequential(nn.Conv2d(5 * 256, 256, 1, bias=False),
                                     _randomize_bn(nn.BatchNorm2d(256)),
                                     nn.ReLU(), nn.Dropout(0.5))
        self.classifier = nn.Sequential(
            aspp,
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            _randomize_bn(nn.BatchNorm2d(256)),
            nn.ReLU(),
            nn.Conv2d(256, NUM_CLASSES, 1),
        )

    def forward(self, x):
        size = x.shape[-2:]
        feats = self.backbone(x)[-1]
        aspp = self.classifier[0]
        branches = [aspp.convs[i](feats) for i in range(4)]
        pooled = aspp.convs[4](feats)
        pooled = F.interpolate(pooled, size=feats.shape[-2:], mode="bilinear",
                               align_corners=False)
        y = aspp.project(torch.cat(branches + [pooled], 1))
        for i in (1, 2, 3, 4):
            y = self.classifier[i](y)
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


@pytest.mark.slow
def test_deeplab_converter_matches_torch_mirror(rng):
    from aip_tpu.models.deeplab import _convert_torch_deeplab, deeplab_logits

    mirror = DeepLabMirror().eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, missing = _spy_convert(_convert_torch_deeplab, sd)
    assert not missing, sorted(missing)[:10]

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(deeplab_logits(params, jnp.asarray(x)))
    ours = ours.transpose(0, 3, 1, 2)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    assert _rel(ours, ref) < 2e-4, _rel(ours, ref)

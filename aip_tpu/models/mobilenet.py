"""MobileNetV2 feature trunk (Sandler et al. 2018) — the style-predictor
backbone of the *distilled* magenta arbitrary-image-stylization module the
reference's fast video path loads (`video/utils.py:14`, hub module
``arbitrary-image-stylization-v1-256``; the distilled variant predicts the
100-d style bottleneck from MobileNetV2 global features instead of
InceptionV3).

Inference-mode network: every conv+BN pair is stored folded as
``y = conv(x, w) * scale + shift`` (exactly BatchNorm in eval mode), so a
converted checkpoint needs no running-stat bookkeeping and the whole trunk
is three fused ops per layer under XLA.

``convert_torch_mobilenet_v2`` accepts the standard torchvision
``mobilenet_v2().state_dict()`` key layout (``features.0.0.weight``,
``features.{1..17}.conv...``, ``features.18...``), which is also the layout
magenta's distilled torch ports use — so real MobileNetV2 weights load
directly; only the magenta-specific bottleneck/CIN heads remain npz-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Inverted-residual plan (expansion t, out channels c, repeats n, stride s)
# — MobileNetV2 paper Table 2 / torchvision `inverted_residual_setting`.
MBV2_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
MBV2_FEATURES = 1280

def _block_strides() -> list:
    """Static per-block strides — derived from MBV2_CFG, never stored in the
    param pytree (an int leaf would become a tracer under jit-as-argument)."""
    return [s if i == 0 else 1 for _t, _c, n, s in MBV2_CFG for i in range(n)]


def _conv_bn_init(key, k, cin, cout, groups=1):
    w = jax.random.normal(key, (k, k, cin // groups, cout)) * jnp.sqrt(
        2.0 / (k * k * (cin // groups)))
    return {"w": w, "scale": jnp.ones(cout), "shift": jnp.zeros(cout)}


def init_mbv2_trunk(key: jax.Array) -> dict:
    """Random-init MobileNetV2 trunk params (folded-BN representation)."""
    keys = iter(jax.random.split(key, 64))
    blocks = []
    cin = 32
    for t, c, n, s in MBV2_CFG:
        for i in range(n):
            hidden = cin * t
            blk = {}
            if t != 1:
                blk["expand"] = _conv_bn_init(next(keys), 1, cin, hidden)
            blk["dw"] = _conv_bn_init(next(keys), 3, hidden, hidden, groups=hidden)
            blk["project"] = _conv_bn_init(next(keys), 1, hidden, c)
            blocks.append(blk)
            cin = c
    return {
        "stem": _conv_bn_init(next(keys), 3, 3, 32),
        "blocks": blocks,
        "head": _conv_bn_init(next(keys), 1, cin, MBV2_FEATURES),
    }


def mbv2_trunk_skeleton() -> dict:
    """Trunk pytree with None array leaves — the structure is fully
    determined by ``MBV2_CFG``, so loaders can fill it in place without a
    throwaway random init (which would also dispatch to whatever device is
    the process default)."""
    empty = lambda: {"w": None, "scale": None, "shift": None}  # noqa: E731
    blocks = []
    for t, _c, n, _s in MBV2_CFG:
        for _i in range(n):
            blk = {} if t == 1 else {"expand": empty()}
            blk.update(dw=empty(), project=empty())
            blocks.append(blk)
    return {"stem": empty(), "blocks": blocks, "head": empty()}


def _conv_bn(x, p, stride=1, groups=1, relu6=True):
    w = p["w"]
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    y = y * p["scale"] + p["shift"]
    return jnp.clip(y, 0.0, 6.0) if relu6 else y


def mbv2_features(trunk: dict, x: jax.Array) -> jax.Array:
    """[N, H, W, 3] -> [N, 1280] global-pooled MobileNetV2 features."""
    y = _conv_bn(x, trunk["stem"], stride=2)
    for blk, stride in zip(trunk["blocks"], _block_strides()):
        z = y
        if "expand" in blk:
            z = _conv_bn(z, blk["expand"])
        z = _conv_bn(z, blk["dw"], stride=stride, groups=z.shape[-1])
        z = _conv_bn(z, blk["project"], relu6=False)
        y = y + z if stride == 1 and y.shape[-1] == z.shape[-1] else z
    y = _conv_bn(y, trunk["head"])
    return jnp.mean(y, axis=(1, 2))


def _fold(sd, conv_key, bn_key, eps=1e-5):
    """torch conv weight + BatchNorm stats -> {w (HWIO), scale, shift}."""
    w = np.asarray(sd[f"{conv_key}.weight"], np.float32)  # (O, I/g, kh, kw)
    gamma = np.asarray(sd[f"{bn_key}.weight"], np.float32)
    beta = np.asarray(sd[f"{bn_key}.bias"], np.float32)
    mean = np.asarray(sd[f"{bn_key}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn_key}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    shift = beta - mean * scale
    # One transpose covers both layouts: regular (O, I, kh, kw) -> HWIO and
    # depthwise (C, 1, kh, kw) with groups=C -> (kh, kw, 1, C).
    w = w.transpose(2, 3, 1, 0)
    return {"w": jnp.asarray(w), "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift)}


def convert_torch_mobilenet_v2(sd) -> dict:
    """torchvision ``mobilenet_v2().state_dict()`` -> folded trunk params.

    Only the feature extractor (``features.*``) is consumed; the ImageNet
    classifier head is ignored.
    """
    trunk = {"stem": _fold(sd, "features.0.0", "features.0.1"), "blocks": []}
    idx = 1
    for t, c, n, s in MBV2_CFG:
        for i in range(n):
            base = f"features.{idx}.conv"
            blk = {}
            if t != 1:
                blk["expand"] = _fold(sd, f"{base}.0.0", f"{base}.0.1")
                blk["dw"] = _fold(sd, f"{base}.1.0", f"{base}.1.1")
                blk["project"] = _fold(sd, f"{base}.2", f"{base}.3")
            else:
                blk["dw"] = _fold(sd, f"{base}.0.0", f"{base}.0.1")
                blk["project"] = _fold(sd, f"{base}.1", f"{base}.2")
            trunk["blocks"].append(blk)
            idx += 1
    trunk["head"] = _fold(sd, f"features.{idx}.0", f"features.{idx}.1")
    return trunk

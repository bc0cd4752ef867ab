"""ResNet-50 feature extractor (torchvision layout) for multi-backbone NST.

Parity with reference `gui/seven_page.py:123-148` ResNetFeatureExtractor:
stem (conv7x7/2 + BN + ReLU + maxpool3x3/2) -> layer1..layer4 bottleneck
stages with taps after each stage. Inference-only: BatchNorm uses stored
running statistics. Weights convert from a torchvision ``resnet50``
state_dict when provided; deterministic random init otherwise.

NHWC/HWIO as everywhere in this framework.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bottleneck counts and widths per stage (ResNet-50).
STAGES = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))


def _conv(x, p, stride=1):
    # Explicit symmetric torch padding ((k-1)//2 each side): XLA "SAME" pads
    # ASYMMETRICALLY for stride 2 on even inputs (TF rule), which shifts
    # every stride-2 conv one pixel off torchvision.
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _init_conv(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / (kh * kw * cin))
    return {"w": w}


def _init_bn(c):
    return {"gamma": jnp.ones(c), "beta": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def init_resnet50_params(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))
    params = {
        "stem_conv": _init_conv(next(keys), 7, 7, 3, 64),
        "stem_bn": _init_bn(64),
        "stages": [],
    }
    cin = 64
    for si, (blocks, width, out) in enumerate(STAGES):
        stage = []
        for bi in range(blocks):
            block = {
                "conv1": _init_conv(next(keys), 1, 1, cin if bi == 0 else out, width),
                "bn1": _init_bn(width),
                "conv2": _init_conv(next(keys), 3, 3, width, width),
                "bn2": _init_bn(width),
                "conv3": _init_conv(next(keys), 1, 1, width, out),
                "bn3": _init_bn(out),
            }
            if bi == 0:
                block["down_conv"] = _init_conv(next(keys), 1, 1, cin, out)
                block["down_bn"] = _init_bn(out)
            stage.append(block)
        params["stages"].append(stage)
        cin = out
    return params


def resnet50_features(params: dict, x01: jax.Array) -> dict:
    """ImageNet-normalized NHWC input -> {'layer1'..'layer4'} feature taps."""
    from aip_tpu.ops.image import max_pool_2x2_ceil

    x = _conv(x01, params["stem_conv"], stride=2)
    x = jax.nn.relu(_bn(x, params["stem_bn"]))
    # 3x3/2 max pool with padding 1 (torch stem).
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    feats = {}
    for si, stage in enumerate(params["stages"]):
        stride = 1 if si == 0 else 2
        for bi, block in enumerate(stage):
            identity = x
            s = stride if bi == 0 else 1
            y = jax.nn.relu(_bn(_conv(x, block["conv1"]), block["bn1"]))
            y = jax.nn.relu(_bn(_conv(y, block["conv2"], stride=s), block["bn2"]))
            y = _bn(_conv(y, block["conv3"]), block["bn3"])
            if "down_conv" in block:
                identity = _bn(_conv(x, block["down_conv"], stride=s), block["down_bn"])
            x = jax.nn.relu(y + identity)
        feats[f"layer{si + 1}"] = x
    return feats


def _convert_torch_resnet(sd: dict) -> dict:
    def conv(prefix):
        return {"w": jnp.asarray(np.transpose(np.asarray(sd[f"{prefix}.weight"], np.float32), (2, 3, 1, 0)))}

    def bn(prefix):
        return {
            "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "beta": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"], np.float32)),
        }

    params = {"stem_conv": conv("conv1"), "stem_bn": bn("bn1"), "stages": []}
    for si, (blocks, _w, _o) in enumerate(STAGES):
        stage = []
        for bi in range(blocks):
            p = f"layer{si + 1}.{bi}"
            block = {
                "conv1": conv(f"{p}.conv1"), "bn1": bn(f"{p}.bn1"),
                "conv2": conv(f"{p}.conv2"), "bn2": bn(f"{p}.bn2"),
                "conv3": conv(f"{p}.conv3"), "bn3": bn(f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{p}.downsample.0")
                block["down_bn"] = bn(f"{p}.downsample.1")
            stage.append(block)
        params["stages"].append(stage)
    return params


def get_resnet50_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_resnet(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_resnet50_params(jax.random.PRNGKey(0))

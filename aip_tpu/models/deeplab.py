"""DeepLabV3-ResNet101 semantic segmentation (torchvision layout).

The reference extracts the regional-style-transfer background mask with
pretrained torchvision ``deeplabv3_resnet101`` (P(class 0) > 0.5,
`localized_style_transfer.py:171-188`). This module provides the full
architecture — dilated ResNet-101 backbone (output stride 8) + ASPP head —
with a torchvision state_dict converter, so supplying the checkpoint enables
exact parity; aip_tpu.models.segmenter's classical fallback covers the
weightless case.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.models.resnet import _bn, _init_bn

# ResNet-101 stages; layer3/layer4 are dilated (stride 1) for output_stride 8.
# (blocks, width, out, first-block stride, dilation, first-block dilation):
# torchvision's _make_layer gives the FIRST block of a dilated stage the
# PREVIOUS stage's dilation (`previous_dilation` in
# torchvision/models/resnet.py) — layer3 block 0 runs at dilation 1 and
# layer4 block 0 at dilation 2, only the remaining blocks use the stage
# dilation.
STAGES = ((3, 64, 256, 1, 1, 1), (4, 128, 512, 2, 1, 1),
          (23, 256, 1024, 1, 2, 1), (3, 512, 2048, 1, 4, 2))
ASPP_RATES = (12, 24, 36)
NUM_CLASSES = 21


def _conv(x, w, stride=1, dilation=1):
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _init_w(key, kh, kw, cin, cout):
    return jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / (kh * kw * cin))


def init_deeplab_params(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 512))
    params = {"stem_w": _init_w(next(keys), 7, 7, 3, 64), "stem_bn": _init_bn(64),
              "stages": []}
    cin = 64
    for blocks, width, out, _stride, _dil, _fdil in STAGES:
        stage = []
        for bi in range(blocks):
            block = {
                "conv1_w": _init_w(next(keys), 1, 1, cin if bi == 0 else out, width),
                "bn1": _init_bn(width),
                "conv2_w": _init_w(next(keys), 3, 3, width, width),
                "bn2": _init_bn(width),
                "conv3_w": _init_w(next(keys), 1, 1, width, out),
                "bn3": _init_bn(out),
            }
            if bi == 0:
                block["down_w"] = _init_w(next(keys), 1, 1, cin, out)
                block["down_bn"] = _init_bn(out)
            stage.append(block)
        params["stages"].append(stage)
        cin = out
    # ASPP: 1x1 + three dilated 3x3 + image pooling, project, classifier.
    aspp = {"convs": [], "bns": []}
    aspp["convs"].append(_init_w(next(keys), 1, 1, 2048, 256))
    aspp["bns"].append(_init_bn(256))
    for _r in ASPP_RATES:
        aspp["convs"].append(_init_w(next(keys), 3, 3, 2048, 256))
        aspp["bns"].append(_init_bn(256))
    aspp["pool_w"] = _init_w(next(keys), 1, 1, 2048, 256)
    aspp["pool_bn"] = _init_bn(256)
    aspp["project_w"] = _init_w(next(keys), 1, 1, 5 * 256, 256)
    aspp["project_bn"] = _init_bn(256)
    params["aspp"] = aspp
    params["head_w"] = _init_w(next(keys), 3, 3, 256, 256)
    params["head_bn"] = _init_bn(256)
    params["cls_w"] = _init_w(next(keys), 1, 1, 256, NUM_CLASSES)
    params["cls_b"] = jnp.zeros(NUM_CLASSES)
    return params


def deeplab_logits(params: dict, x01: jax.Array) -> jax.Array:
    """ImageNet-normalized NHWC -> [N, H, W, 21] logits (bilinear-upsampled
    to input resolution, torchvision semantics)."""
    from aip_tpu.ops.image import resize_bilinear

    n, h, w, _ = x01.shape
    x = _conv(x01, params["stem_w"], stride=2)
    x = jax.nn.relu(_bn(x, params["stem_bn"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    for (blocks, _wd, _out, stride, dilation, first_dil), stage in zip(
            STAGES, params["stages"]):
        for bi, block in enumerate(stage):
            s = stride if bi == 0 else 1
            dil = first_dil if bi == 0 else dilation
            identity = x
            y = jax.nn.relu(_bn(_conv(x, block["conv1_w"]), block["bn1"]))
            y = jax.nn.relu(_bn(_conv(y, block["conv2_w"], stride=s,
                                      dilation=dil), block["bn2"]))
            y = _bn(_conv(y, block["conv3_w"]), block["bn3"])
            if "down_w" in block:
                identity = _bn(_conv(x, block["down_w"], stride=s), block["down_bn"])
            x = jax.nn.relu(y + identity)

    # ASPP.
    a = params["aspp"]
    branches = [jax.nn.relu(_bn(_conv(x, a["convs"][0]), a["bns"][0]))]
    for conv_w, bn, rate in zip(a["convs"][1:], a["bns"][1:], ASPP_RATES):
        branches.append(jax.nn.relu(_bn(_conv(x, conv_w, dilation=rate), bn)))
    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    pooled = jax.nn.relu(_bn(_conv(pooled, a["pool_w"]), a["pool_bn"]))
    pooled = jnp.broadcast_to(pooled, branches[0].shape)
    y = jnp.concatenate(branches + [pooled], axis=-1)
    y = jax.nn.relu(_bn(_conv(y, a["project_w"]), a["project_bn"]))
    y = jax.nn.relu(_bn(_conv(y, params["head_w"]), params["head_bn"]))
    logits = _conv(y, params["cls_w"]) + params["cls_b"]
    return resize_bilinear(logits, (h, w))


def make_background_segmenter(params, threshold: float = 0.5):
    """Returns fn(img_hwc_float01) -> [H, W] uint8 background mask, matching
    extract_foreground_deeplab semantics (P(class 0) > threshold)."""
    from aip_tpu.models.vgg19_std import normalize_imagenet

    @jax.jit
    def seg(img):
        logits = deeplab_logits(params, normalize_imagenet(img)[None])[0]
        probs = jax.nn.softmax(logits, axis=-1)
        return (probs[..., 0] > threshold).astype(jnp.uint8)

    return seg


def _convert_torch_deeplab(sd: dict) -> dict:
    def w(prefix):
        return jnp.asarray(np.transpose(np.asarray(sd[f"{prefix}.weight"], np.float32), (2, 3, 1, 0)))

    def bn(prefix):
        return {
            "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "beta": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"], np.float32)),
        }

    b = "backbone"
    params = {"stem_w": w(f"{b}.conv1"), "stem_bn": bn(f"{b}.bn1"), "stages": []}
    for si, (blocks, *_rest) in enumerate(STAGES):
        stage = []
        for bi in range(blocks):
            p = f"{b}.layer{si + 1}.{bi}"
            block = {"conv1_w": w(f"{p}.conv1"), "bn1": bn(f"{p}.bn1"),
                     "conv2_w": w(f"{p}.conv2"), "bn2": bn(f"{p}.bn2"),
                     "conv3_w": w(f"{p}.conv3"), "bn3": bn(f"{p}.bn3")}
            if f"{p}.downsample.0.weight" in sd:
                block["down_w"] = w(f"{p}.downsample.0")
                block["down_bn"] = bn(f"{p}.downsample.1")
            stage.append(block)
        params["stages"].append(stage)
    c = "classifier"
    aspp = {"convs": [], "bns": []}
    for i in range(4):  # 0: 1x1, 1..3: dilated convs
        aspp["convs"].append(w(f"{c}.0.convs.{i}.0"))
        aspp["bns"].append(bn(f"{c}.0.convs.{i}.1"))
    aspp["pool_w"] = w(f"{c}.0.convs.4.1")
    aspp["pool_bn"] = bn(f"{c}.0.convs.4.2")
    aspp["project_w"] = w(f"{c}.0.project.0")
    aspp["project_bn"] = bn(f"{c}.0.project.1")
    params["aspp"] = aspp
    params["head_w"] = w(f"{c}.1")
    params["head_bn"] = bn(f"{c}.2")
    params["cls_w"] = w(f"{c}.4")
    params["cls_b"] = jnp.asarray(np.asarray(sd[f"{c}.4.bias"], np.float32))
    return params


def get_deeplab_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_deeplab(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_deeplab_params(jax.random.PRNGKey(0))

"""Standard (torchvision-layout) VGG-19 feature extractor for optimization NST.

The reference's optimization-NST pipelines use torchvision's ImageNet VGG-19
``features`` stack with taps at conv outputs — `spatial_variation/
StyleTransfer.py:20-29` (indices 0/5/10/19/21/28 = conv1_1, conv2_1, conv3_1,
conv4_1, conv4_2, conv5_1, captured pre-ReLU) and `mixing_texture_gyum/
vgg_model.py` (same taps minus conv4_2). Unlike the AdaIN "normalised" VGG
(aip_tpu.models.vgg), this uses zero padding and expects ImageNet-normalized
inputs.

Weights convert from a torchvision state_dict when available
(aip_tpu.models.weights conventions); deterministic random init otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import max_pool_2x2_ceil

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# (name, in_ch, out_ch, torchvision_features_index); pools implied after
# each block.
VGG19_CONVS = (
    ("conv1_1", 3, 64, 0),
    ("conv1_2", 64, 64, 2),
    ("pool", None, None, None),
    ("conv2_1", 64, 128, 5),
    ("conv2_2", 128, 128, 7),
    ("pool", None, None, None),
    ("conv3_1", 128, 256, 10),
    ("conv3_2", 256, 256, 12),
    ("conv3_3", 256, 256, 14),
    ("conv3_4", 256, 256, 16),
    ("pool", None, None, None),
    ("conv4_1", 256, 512, 19),
    ("conv4_2", 512, 512, 21),
    ("conv4_3", 512, 512, 23),
    ("conv4_4", 512, 512, 25),
    ("pool", None, None, None),
    ("conv5_1", 512, 512, 28),
)

NST_STYLE_LAYERS = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
NST_CONTENT_LAYER = "conv4_2"


def conv_specs():
    return [l for l in VGG19_CONVS if l[0] != "pool"]


def init_vgg19_params(key: jax.Array, dtype=jnp.float32):
    params = []
    for _, cin, cout, _ in conv_specs():
        key, wk = jax.random.split(key)
        w = jax.random.normal(wk, (3, 3, cin, cout), dtype) * jnp.sqrt(2.0 / (cin * 9))
        params.append({"w": w, "b": jnp.zeros((cout,), dtype)})
    return params


def normalize_imagenet(img01: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img01 - mean) / std


def denormalize_imagenet(x: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return jnp.clip(x * std + mean, 0.0, 1.0)


def extract_features(params, x: jax.Array, taps, compute_dtype=jnp.float32):
    """x: ImageNet-normalized NHWC. Returns {tap: pre-ReLU conv output}.

    Matches the reference's capture points (pre-ReLU, StyleTransfer.py:31-37).
    """
    taps = set(taps)
    out = {}
    ci = 0
    for layer in VGG19_CONVS:
        name = layer[0]
        if name == "pool":
            x = max_pool_2x2_ceil(x)
            continue
        p = params[ci]
        ci += 1
        x = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=compute_dtype,
        ) + p["b"].astype(compute_dtype)
        if name in taps:
            out[name] = x
            if len(out) == len(taps):
                return out
        x = jax.nn.relu(x)
    return out


def get_vgg19_params(torch_path=None):
    """Pretrained torchvision weights if provided, else deterministic init."""
    from aip_tpu.models import weights as weights_mod

    # torchvision checkpoints key convs as 'features.<idx>.weight'.
    idxs = [f"features.{spec[3]}" for spec in conv_specs()]
    return weights_mod._get_params("vgg19_imagenet", torch_path, idxs, init_vgg19_params)

"""LPIPS perceptual distance (reference `lpipsPyTorch/` port).

Architecture parity with `lpipsPyTorch/modules/lpips.py` + `networks.py`:
normalize inputs by ImageNet-ish scaling vector, extract VGG16 relu slices,
unit-normalize each feature map along channels, weight squared differences
with the learned 1x1 "lin" layers, average spatially, sum over layers.

The pretrained lin weights (richzhang GitHub, `modules/utils.py:11-30`)
cannot be fetched here; without them we fall back to uniform lin weights —
still a valid perceptual feature distance, just not calibrated to human
judgments. Provide the checkpoint via ``AIP_TPU_WEIGHTS`` to get exact
LPIPS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import max_pool_2x2_ceil

# VGG16 conv plan with relu tap points used by LPIPS (relu1_2, 2_2, 3_3,
# 4_3, 5_3), torchvision features indices for weight conversion.
VGG16_CONVS = (
    ("conv1_1", 3, 64, 0), ("conv1_2", 64, 64, 2), ("tap", "relu1_2"), ("pool",),
    ("conv2_1", 64, 128, 5), ("conv2_2", 128, 128, 7), ("tap", "relu2_2"), ("pool",),
    ("conv3_1", 128, 256, 10), ("conv3_2", 256, 256, 12), ("conv3_3", 256, 256, 14),
    ("tap", "relu3_3"), ("pool",),
    ("conv4_1", 256, 512, 17), ("conv4_2", 512, 512, 19), ("conv4_3", 512, 512, 21),
    ("tap", "relu4_3"), ("pool",),
    ("conv5_1", 512, 512, 24), ("conv5_2", 512, 512, 26), ("conv5_3", 512, 512, 28),
    ("tap", "relu5_3"),
)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling (richzhang's shift/scale constants).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def conv_specs():
    return [l for l in VGG16_CONVS if l[0].startswith("conv")]


def init_vgg16_params(key: jax.Array):
    params = []
    for _, cin, cout, _ in conv_specs():
        key, wk = jax.random.split(key)
        w = jax.random.normal(wk, (3, 3, cin, cout)) * jnp.sqrt(2.0 / (cin * 9))
        params.append({"w": w, "b": jnp.zeros((cout,))})
    return params


def get_vgg16_params(torch_path=None):
    from aip_tpu.models import weights as weights_mod

    idxs = [f"features.{spec[3]}" for spec in conv_specs()]
    return weights_mod._get_params("vgg16_imagenet", torch_path, idxs, init_vgg16_params)


def _extract(params, x):
    feats = []
    ci = 0
    for layer in VGG16_CONVS:
        kind = layer[0]
        if kind == "pool":
            x = max_pool_2x2_ceil(x)
        elif kind == "tap":
            feats.append(x)
        else:
            p = params[ci]
            ci += 1
            x = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    x, p["w"], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + p["b"]
            )
    return feats


@jax.jit
def lpips(img1: jax.Array, img2: jax.Array, vgg_params, lin_weights=None) -> jax.Array:
    """Perceptual distance between NHWC images in [0, 1]. Returns [N]."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def norm_input(x):
        return (x * 2.0 - 1.0 - shift) / scale

    f1 = _extract(vgg_params, norm_input(img1))
    f2 = _extract(vgg_params, norm_input(img2))
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        if lin_weights is not None:
            d = d * lin_weights[li][None, None, None, :]
            total = total + jnp.sum(jnp.mean(d, axis=(1, 2)), axis=-1)
        else:
            total = total + jnp.mean(d, axis=(1, 2, 3))
    return total

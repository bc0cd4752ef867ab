"""AdaIN decoder: mirror of the VGG encoder from relu4_1 back to RGB.

Architecture parity with reference `Style_3DGS/AdaIN/net.py:6-36`:
reflection-padded 3x3 convs with ReLU and three 2x nearest upsamples
(512->256 -> up -> 256x3 -> 128 -> up -> 128->64 -> up -> 64->3, no final
activation).

TPU-first: NHWC/HWIO, nearest upsample as a broadcast-reshape (layout op, not
a gather), optional bfloat16 compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import reflection_pad_2d, upsample_nearest_2x

# ('conv', in, out, torch_index) | ('relu',) | ('up',) | ('pad',)
DECODER_LAYERS = (
    ("pad",),
    ("conv", 512, 256, 1),
    ("relu",),
    ("up",),
    ("pad",),
    ("conv", 256, 256, 5),
    ("relu",),
    ("pad",),
    ("conv", 256, 256, 8),
    ("relu",),
    ("pad",),
    ("conv", 256, 256, 11),
    ("relu",),
    ("pad",),
    ("conv", 256, 128, 14),
    ("relu",),
    ("up",),
    ("pad",),
    ("conv", 128, 128, 18),
    ("relu",),
    ("pad",),
    ("conv", 128, 64, 21),
    ("relu",),
    ("up",),
    ("pad",),
    ("conv", 64, 64, 25),
    ("relu",),
    ("pad",),
    ("conv", 64, 3, 28),
)


def conv_specs(layers=DECODER_LAYERS):
    return [l for l in layers if l[0] == "conv"]


def init_decoder_params(key: jax.Array, dtype=jnp.float32):
    params = []
    for _, cin, cout, _idx in conv_specs():
        key, wk = jax.random.split(key)
        fan_in = cin * 9
        w = jax.random.normal(wk, (3, 3, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params.append({"w": w, "b": jnp.zeros((cout,), dtype)})
    return params


def decoder_apply(params, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Decode a [N, h, w, 512] relu4_1-space feature map to [N, 8h, 8w, 3]."""
    ci = 0
    for layer in DECODER_LAYERS:
        kind = layer[0]
        if kind == "conv":
            # Explicit reflection pad + VALID conv — measured fastest on
            # v5e (see models/vgg.py and the BENCHMARKS.md roofline note;
            # the fused reflect_conv3x3 variants lose to XLA's
            # materialized pad here).
            p = params[ci]
            w = p["w"].astype(compute_dtype)
            b = p["b"].astype(compute_dtype)
            x = reflection_pad_2d(x.astype(compute_dtype), 1)
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=compute_dtype) + b
            ci += 1
        elif kind == "pad":
            pass  # handled with its conv
        elif kind == "up":
            x = upsample_nearest_2x(x)
        elif kind == "relu":
            x = jax.nn.relu(x)
    return x

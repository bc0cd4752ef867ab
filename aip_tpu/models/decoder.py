"""AdaIN decoder: mirror of the VGG encoder from relu4_1 back to RGB.

Architecture parity with reference `Style_3DGS/AdaIN/net.py:6-36`:
reflection-padded 3x3 convs with ReLU and three 2x nearest upsamples
(512->256 -> up -> 256x3 -> 128 -> up -> 128->64 -> up -> 64->3, no final
activation).

TPU-first: NHWC/HWIO, nearest upsample as a broadcast-reshape (layout op, not
a gather), optional bfloat16 compute.
"""

from __future__ import annotations

import functools

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


def _tail_tile(h_out: int, h_in: int) -> int:
    """Strip height for the fused tail (0 = no fit): even, divides the
    OUTPUT height, >= 2 strips, and the input holds a th/2+2-row strip."""
    # 8 first: 16 already exceeds the kernel's VMEM frame at 512^2.
    for th in (8, 4, 16, 2, 32):
        if h_out % th == 0 and h_out // th >= 2 and h_in >= th // 2 + 2:
            return th
    return 0


def _tail_xla(compute_dtype, y, p2, p1):
    u = upsample_nearest_2x(y)
    z = jax.nn.relu(_conv3(reflection_pad_2d(u, 1), p2, compute_dtype))
    return _conv3(reflection_pad_2d(z, 1), p1, compute_dtype)


def _conv3(x, p, compute_dtype):
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype), (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype) + p["b"].astype(compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _tail_dispatch(compute_dtype, th, y, p2, p1):
    from aip_tpu.ops.pallas.adain_head import (decode_tail_pallas,
                                               pack_pair_weights)

    def pallas_branch(y, p2, p1):
        w2p = pack_pair_weights(p2["w"].astype(compute_dtype))
        w1p = pack_pair_weights(jnp.pad(
            p1["w"].astype(compute_dtype), ((0, 0), (0, 0), (0, 0), (0, 61))))
        return decode_tail_pallas(
            y, w2p, p2["b"], w1p, jnp.pad(p1["b"], (0, 61)),
            th=th, out_dtype=compute_dtype)

    return jax.lax.platform_dependent(
        y, p2, p1, tpu=pallas_branch,
        default=functools.partial(_tail_xla, compute_dtype))


def _tail_fwd(compute_dtype, th, y, p2, p1):
    return _tail_dispatch(compute_dtype, th, y, p2, p1), (y, p2, p1)


def _tail_bwd(compute_dtype, th, res, g):
    # AdaIN decoder TRAINING differentiates this tail — gradients
    # recompute through the XLA layer chain (the Pallas forward is the
    # serving path).
    y, p2, p1 = res
    _, vjp = jax.vjp(functools.partial(_tail_xla, compute_dtype), y, p2, p1)
    return vjp(g.astype(compute_dtype))


_tail_dispatch.defvjp(_tail_fwd, _tail_bwd)


def decoder_apply(params, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Decode a [N, h, w, 512] relu4_1-space feature map to [N, 8h, 8w, 3].

    The final up2x -> conv(64->64) -> relu -> conv(64->3) tail — the
    serving graph's second HBM plateau — runs as ONE VMEM-resident Pallas
    program on TPU when the output shape tiles (ops/pallas/adain_head.py);
    the upsample never materializes in HBM (it composes with the
    reflection pad into an edge-padded 2x repeat of each DMA'd strip).
    Reference stack: `Style_3DGS/AdaIN/net.py` decoder[23:29]."""
    n_convs = len(conv_specs())
    ci = 0
    for layer in DECODER_LAYERS:
        kind = layer[0]
        if (kind == "up" and ci == n_convs - 2 and x.shape[-1] == 64
                and compute_dtype == jnp.bfloat16):  # see vgg dtype gate
            from aip_tpu.models.vgg import fused_adain_enabled

            th = _tail_tile(x.shape[1] * 2, x.shape[1])
            if th and fused_adain_enabled():
                return _tail_dispatch(compute_dtype, th,
                                      x.astype(compute_dtype),
                                      params[ci], params[ci + 1])
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

"""VGG-19 "normalised" encoder (pytorch-AdaIN variant), TPU-native.

Architecture parity with reference `Style_3DGS/AdaIN/net.py:38-92`: a 1x1
conv (3->3, RGB recentering baked into pretrained weights) followed by the
VGG-19 conv stack with reflection padding, ReLU, and ceil-mode 2x2 max pools,
up to relu5_4. AdaIN uses the slice up to relu4_1 (torch Sequential index 31,
`AdaIN/test.py:39,182`).

TPU-first design:
* NHWC activations, HWIO weights — channels ride the 128-lane dimension, and
  every 3x3 conv maps onto the MXU as an implicit im2col matmul.
* Reflection padding is explicit `jnp.pad` (fused by XLA into the conv's
  operand window where possible).
* Optional bfloat16 compute: params are cast per-call; stats-sensitive math
  (AdaIN) stays fp32 elsewhere.

Params are a flat list of {'w','b'} dicts (one per conv, in network order) —
a plain pytree, trivially shardable with jax.sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import (max_pool_2x2_ceil, reflection_pad_2d)

# Layer program: mirrors the torch Sequential structure so pretrained
# state_dicts (keys '0.weight', '2.weight', ...) can be mapped 1:1.
# ('conv', in_ch, out_ch, kernel, torch_index) | ('relu',) | ('pool',) | ('pad',)
VGG_LAYERS = (
    ("conv", 3, 3, 1, 0),
    ("pad",),
    ("conv", 3, 64, 3, 2),
    ("relu", "relu1_1"),
    ("pad",),
    ("conv", 64, 64, 3, 5),
    ("relu", "relu1_2"),
    ("pool",),
    ("pad",),
    ("conv", 64, 128, 3, 9),
    ("relu", "relu2_1"),
    ("pad",),
    ("conv", 128, 128, 3, 12),
    ("relu", "relu2_2"),
    ("pool",),
    ("pad",),
    ("conv", 128, 256, 3, 16),
    ("relu", "relu3_1"),
    ("pad",),
    ("conv", 256, 256, 3, 19),
    ("relu", "relu3_2"),
    ("pad",),
    ("conv", 256, 256, 3, 22),
    ("relu", "relu3_3"),
    ("pad",),
    ("conv", 256, 256, 3, 25),
    ("relu", "relu3_4"),
    ("pool",),
    ("pad",),
    ("conv", 256, 512, 3, 29),
    ("relu", "relu4_1"),  # last layer used by AdaIN
    ("pad",),
    ("conv", 512, 512, 3, 32),
    ("relu", "relu4_2"),
    ("pad",),
    ("conv", 512, 512, 3, 35),
    ("relu", "relu4_3"),
    ("pad",),
    ("conv", 512, 512, 3, 38),
    ("relu", "relu4_4"),
    ("pool",),
    ("pad",),
    ("conv", 512, 512, 3, 42),
    ("relu", "relu5_1"),
    ("pad",),
    ("conv", 512, 512, 3, 45),
    ("relu", "relu5_2"),
    ("pad",),
    ("conv", 512, 512, 3, 48),
    ("relu", "relu5_3"),
    ("pad",),
    ("conv", 512, 512, 3, 51),
    ("relu", "relu5_4"),
)

# Intermediate taps for style losses (reference Net.encode_with_intermediate,
# `net.py:116-121`).
STYLE_TAPS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")


def conv_specs(layers=VGG_LAYERS):
    return [l for l in layers if l[0] == "conv"]


def init_vgg_params(key: jax.Array, dtype=jnp.float32):
    """He-normal random init (fallback when pretrained weights are absent)."""
    params = []
    for _, cin, cout, k, _idx in conv_specs():
        key, wk = jax.random.split(key)
        fan_in = cin * k * k
        w = jax.random.normal(wk, (k, k, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params.append({"w": w, "b": jnp.zeros((cout,), dtype)})
    return params


def _conv(x, p, compute_dtype):
    w = p["w"].astype(compute_dtype)
    b = p["b"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    return y + b


def vgg_encode(
    params,
    x: jax.Array,
    upto: str = "relu4_1",
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Run the encoder up to (and including) the named ReLU tap. NHWC in [0,1]."""
    feats = vgg_encode_with_intermediate(params, x, taps=(upto,), compute_dtype=compute_dtype)
    return feats[upto]


def _head_tile(h: int) -> int:
    """Strip height dividing H with >= 2 strips (0 = no fit). 8 first:
    16 already exceeds the kernel's VMEM frame at 512^2 batch shapes."""
    for th in (8, 4, 16, 2, 32):
        if h % th == 0 and h // th >= 2:
            return th
    return 0


def _head_xla(compute_dtype, x, p0, p1, p2):
    h = _conv(x, p0, compute_dtype)
    h = jax.nn.relu(_conv(reflection_pad_2d(
        h.astype(compute_dtype), 1), p1, compute_dtype))
    h = jax.nn.relu(_conv(reflection_pad_2d(h, 1), p2, compute_dtype))
    return max_pool_2x2_ceil(h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _head_dispatch(compute_dtype, th, x, p0, p1, p2):
    from aip_tpu.ops.pallas.adain_head import (
        encode_head_pallas, fold_rgb_conv, pack_pair_weights)

    def pallas_branch(x, p0, p1, p2):
        w_eff, b_eff = fold_rgb_conv(
            p0["w"].astype(compute_dtype), p0["b"].astype(compute_dtype),
            p1["w"].astype(compute_dtype), p1["b"].astype(compute_dtype))
        xp = reflection_pad_2d(x.astype(compute_dtype), 1)
        return encode_head_pallas(
            xp, w_eff.transpose(1, 0, 2, 3).reshape(3, 9, 64), b_eff,
            pack_pair_weights(p2["w"].astype(compute_dtype)), p2["b"],
            th=th, out_dtype=compute_dtype)

    return jax.lax.platform_dependent(
        x, p0, p1, p2, tpu=pallas_branch,
        default=functools.partial(_head_xla, compute_dtype))


def _head_fwd(compute_dtype, th, x, p0, p1, p2):
    return _head_dispatch(compute_dtype, th, x, p0, p1, p2), (x, p0, p1, p2)


def _head_bwd(compute_dtype, th, res, g):
    # The Pallas forward is inference-oriented; gradients (the magenta
    # distillation path differentiates a relu4_1-only encode) recompute
    # through the XLA layer chain.
    x, p0, p1, p2 = res
    _, vjp = jax.vjp(functools.partial(_head_xla, compute_dtype),
                     x, p0, p1, p2)
    return vjp(g.astype(compute_dtype))


_head_dispatch.defvjp(_head_fwd, _head_bwd)


def fused_adain_enabled() -> bool:
    """Gate for the fused serving kernels (AIP_FUSED_ADAIN=1 opts in).

    Default OFF: the r5 on-chip A/B measured the VMEM-resident fused
    chains SLOWER than the XLA layer path (enc head 31.9 vs 27.8 ms,
    dec tail 40.1 vs 35.1 ms at batch 32 / 512^2 bf16; serving graph
    268 vs 305 img/s) — the padded 3/64-lane window fetches, Mosaic
    relayouts and halo recompute cost more than the HBM round trips
    they eliminate. Kernels stay (oracle-tested, Mosaic-validated) as
    the documented negative result; see BENCHMARKS.md "Fused AdaIN
    head/tail kernels (r5)". Read at trace time — a mid-process flip
    needs a fresh jit cache.
    """
    import os

    return os.environ.get("AIP_FUSED_ADAIN", "0") != "0"


def _encode_head_fused(params, x, compute_dtype):
    """conv0 (1x1 RGB) .. maxpool1 through the VMEM-resident fused kernel
    on TPU (ops/pallas/adain_head.py), the layer path elsewhere. Valid
    only when no tap before relu2_1 is requested: relu1_1/relu1_2 never
    materialize."""
    th = _head_tile(x.shape[1])
    # bf16-only: the serving hot path; in f32 the kernel's VMEM frame
    # overflows at wide shapes (measured 27.5M vs the 16M scoped limit
    # on a 646-wide style encode).
    if (th == 0 or x.shape[2] % 2 or compute_dtype != jnp.bfloat16
            or not fused_adain_enabled()):
        return _head_xla(compute_dtype, x, params[0], params[1], params[2])
    return _head_dispatch(compute_dtype, th, x,
                          params[0], params[1], params[2])


def vgg_encode_with_intermediate(
    params,
    x: jax.Array,
    taps=STYLE_TAPS,
    compute_dtype=jnp.float32,
):
    """Return a dict of the requested ReLU taps. Stops at the deepest tap."""
    taps = tuple(taps)
    remaining = set(taps)
    out = {}
    # Fused head (the serving hot path): when nothing inside the first
    # block is tapped, run conv0..pool1 as ONE Pallas program on TPU —
    # the four 64ch 512^2 stages are the graph's HBM plateau
    # (BENCHMARKS.md roofline; reference stack net.py:38-92).
    if not remaining & {"relu1_1", "relu1_2"}:
        x = _encode_head_fused(params, x, compute_dtype)
        return _encode_from_pool1(params, x, taps, remaining, compute_dtype)
    ci = 0
    pending_pad = False
    for layer in VGG_LAYERS:
        kind = layer[0]
        if kind == "conv":
            if pending_pad:
                # Explicit reflection pad + VALID conv. Measured fastest on
                # v5e at batch 32/512^2: 105 ms full graph vs 115 ms for the
                # fused zero-pad+strip-correction op (ops.image.
                # reflect_conv3x3 — its 4 extra strip convs per layer cost
                # more than the materialized pad they avoid) and 190 ms for
                # a dynamic_update_slice border patch variant.
                x = reflection_pad_2d(x.astype(compute_dtype), 1)
                x = _conv(x, params[ci], compute_dtype)
                pending_pad = False
            else:
                x = _conv(x, params[ci], compute_dtype)
            ci += 1
        elif kind == "pad":
            pending_pad = True
        elif kind == "pool":
            x = max_pool_2x2_ceil(x)
        elif kind == "relu":
            x = jax.nn.relu(x)
            name = layer[1]
            if name in remaining:
                out[name] = x
                remaining.discard(name)
                if not remaining:
                    return out
    if remaining:
        raise ValueError(f"unknown taps: {remaining}")
    return out


def _encode_from_pool1(params, x, taps, remaining, compute_dtype):
    """Continue the encoder from the post-pool1 activation (ci=3)."""
    out = {}
    ci = 3
    pending_pad = False
    pool1_idx = VGG_LAYERS.index(("pool",))
    for layer in VGG_LAYERS[pool1_idx + 1:]:
        kind = layer[0]
        if kind == "conv":
            if pending_pad:
                x = reflection_pad_2d(x.astype(compute_dtype), 1)
                pending_pad = False
            x = _conv(x, params[ci], compute_dtype)
            ci += 1
        elif kind == "pad":
            pending_pad = True
        elif kind == "pool":
            x = max_pool_2x2_ceil(x)
        elif kind == "relu":
            x = jax.nn.relu(x)
            name = layer[1]
            if name in remaining:
                out[name] = x
                remaining.discard(name)
                if not remaining:
                    return out
    if remaining:
        raise ValueError(f"unknown taps: {remaining}")
    return out

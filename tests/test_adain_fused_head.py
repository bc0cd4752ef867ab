"""Fused AdaIN encoder-head / decoder-tail Pallas kernels vs the XLA
layer chain (interpret mode on CPU), plus the model-level dispatch:
the CPU branch must reproduce the original layer path exactly and the
custom VJP must match layer-path gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import (max_pool_2x2_ceil, reflection_pad_2d,
                               upsample_nearest_2x)
from aip_tpu.ops.pallas.adain_head import (decode_tail_pallas,
                                           encode_head_pallas,
                                           fold_rgb_conv, pack_pair_weights)


def _conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


@pytest.fixture
def enc_weights(rng):
    w0 = jnp.asarray(rng.standard_normal((1, 1, 3, 3)).astype(np.float32) * .5)
    b0 = jnp.asarray(rng.standard_normal(3).astype(np.float32) * .1)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * .05)
    b2 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * .1)
    return w0, b0, w1, b1, w2, b2


@pytest.mark.parametrize("hw,th", [((64, 96), 16), ((48, 48), 8),
                                   ((32, 40), 16)])
def test_encode_head_kernel_matches_layers(rng, enc_weights, hw, th):
    w0, b0, w1, b1, w2, b2 = enc_weights
    h, w = hw
    x = jnp.asarray(rng.random((2, h, w, 3)).astype(np.float32))

    x0 = _conv(x, w0, b0)
    r1 = jax.nn.relu(_conv(reflection_pad_2d(x0, 1), w1, b1))
    r2 = jax.nn.relu(_conv(reflection_pad_2d(r1, 1), w2, b2))
    ref = max_pool_2x2_ceil(r2)

    we, be = fold_rgb_conv(w0, b0, w1, b1)
    out = encode_head_pallas(
        reflection_pad_2d(x, 1), we.transpose(1, 0, 2, 3).reshape(3, 9, 64),
        be, pack_pair_weights(w2), b2, th=th, out_dtype=jnp.float32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_decode_tail_kernel_matches_layers(rng):
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * .05)
    b2 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * .1)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 64, 3)).astype(np.float32) * .05)
    b1 = jnp.asarray(rng.standard_normal(3).astype(np.float32) * .1)
    y = jnp.asarray(np.maximum(
        rng.standard_normal((3, 32, 48, 64)), 0).astype(np.float32))

    u = upsample_nearest_2x(y)
    z = jax.nn.relu(_conv(reflection_pad_2d(u, 1), w2, b2))
    ref = _conv(reflection_pad_2d(z, 1), w1, b1)

    out = decode_tail_pallas(
        y, pack_pair_weights(w2), b2,
        pack_pair_weights(jnp.pad(w1, ((0, 0),) * 3 + ((0, 61),))),
        jnp.pad(b1, (0, 61)), th=16, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_vgg_encode_dispatch_matches_layer_path(rng, monkeypatch):
    """vgg_encode (fused-head dispatch) == the raw layer walk on CPU.
    The gate defaults OFF (measured slower on-chip); force it ON so the
    dispatch path (platform_dependent default branch + custom VJP
    wrapper) stays covered."""
    monkeypatch.setenv("AIP_FUSED_ADAIN", "1")
    from aip_tpu.models.vgg import (VGG_LAYERS, _conv as vgg_conv,
                                    init_vgg_params, vgg_encode)
    from aip_tpu.ops.image import reflection_pad_2d as rp

    params = init_vgg_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))

    ref = x
    ci = 0
    pending = False
    for layer in VGG_LAYERS:
        if layer[0] == "conv":
            if pending:
                ref = rp(ref, 1)
                pending = False
            ref = vgg_conv(ref, params[ci], jnp.float32)
            ci += 1
        elif layer[0] == "pad":
            pending = True
        elif layer[0] == "pool":
            ref = max_pool_2x2_ceil(ref)
        elif layer[0] == "relu":
            ref = jax.nn.relu(ref)
            if layer[1] == "relu4_1":
                break

    out = vgg_encode(params, x, "relu4_1", jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # bf16 engages the dispatch wrapper; compare against the f32 walk
    # at bf16 tolerance.
    out_bf = vgg_encode(params, x, "relu4_1", jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), np.asarray(ref),
        atol=0.15, rtol=0.1)


def test_decoder_dispatch_matches_layer_path(rng, monkeypatch):
    monkeypatch.setenv("AIP_FUSED_ADAIN", "1")
    from aip_tpu.models.decoder import (DECODER_LAYERS, decoder_apply,
                                        init_decoder_params)

    params = init_decoder_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.random((2, 8, 8, 512)).astype(np.float32) * 0.1)

    ref = x
    ci = 0
    for layer in DECODER_LAYERS:
        if layer[0] == "conv":
            p = params[ci]
            ref = reflection_pad_2d(ref, 1)
            ref = _conv(ref, p["w"], p["b"])
            ci += 1
        elif layer[0] == "up":
            ref = upsample_nearest_2x(ref)
        elif layer[0] == "relu":
            ref = jax.nn.relu(ref)

    out = decoder_apply(params, x, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_paths_differentiate(rng, monkeypatch):
    """The custom VJPs (XLA-recompute backward) must match the layer
    path's gradients — the distillation/decoder-training paths rely on
    them. Gate forced ON (defaults off) so the VJP wrapper is what
    differentiates."""
    monkeypatch.setenv("AIP_FUSED_ADAIN", "1")
    from aip_tpu.models.decoder import decoder_apply, init_decoder_params
    from aip_tpu.models.vgg import init_vgg_params, vgg_encode

    vp = init_vgg_params(jax.random.PRNGKey(0))
    dp = init_decoder_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    f = jnp.asarray(rng.random((1, 4, 4, 512)).astype(np.float32) * 0.1)

    # bf16: the fused dispatch (and its custom VJP) only engages for the
    # bf16 serving dtype; f32 keeps the plain layer path.
    g_enc = jax.grad(
        lambda img: jnp.sum(
            vgg_encode(vp, img, "relu4_1", jnp.bfloat16).astype(jnp.float32)
            ** 2))(x)
    assert np.isfinite(np.asarray(g_enc)).all()
    assert float(jnp.abs(g_enc).max()) > 0

    loss = lambda p: jnp.sum(
        decoder_apply(p, f, jnp.bfloat16).astype(jnp.float32) ** 2)
    g_dec = jax.grad(loss)(dp)
    flat = jax.tree.leaves(g_dec)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # last two convs (the fused tail) must receive gradient
    assert float(jnp.abs(g_dec[-1]["w"]).max()) > 0
    assert float(jnp.abs(g_dec[-2]["w"]).max()) > 0

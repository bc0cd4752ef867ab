"""End-to-end fidelity vs torch: build the reference's torch architectures
with OUR weights (converted back to OIHW) and require sub-1e-4 agreement.

This validates the weight-conversion layout, reflection padding, ceil-mode
pooling, nearest upsampling and conv semantics together — the SURVEY.md §7.iv
"weight conversion fidelity" requirement, testable without pretrained
checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from aip_tpu.models.vgg import (
    VGG_LAYERS, init_vgg_params, vgg_encode, conv_specs as vgg_convs,
)
from aip_tpu.models.decoder import (
    DECODER_LAYERS, init_decoder_params, decoder_apply, conv_specs as dec_convs,
)


def _to_torch_conv(p):
    w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW
    conv = nn.Conv2d(w.shape[1], w.shape[0], w.shape[2])
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    return conv


def _torch_vgg(params):
    """Torch encoder with our weights, mirroring VGG_LAYERS up to relu4_1."""
    layers = []
    ci = 0
    for layer in VGG_LAYERS:
        kind = layer[0]
        if kind == "conv":
            layers.append(_to_torch_conv(params[ci]))
            ci += 1
        elif kind == "pad":
            layers.append(nn.ReflectionPad2d(1))
        elif kind == "pool":
            layers.append(nn.MaxPool2d(2, 2, ceil_mode=True))
        elif kind == "relu":
            layers.append(nn.ReLU())
            if layer[1] == "relu4_1":
                break
    return nn.Sequential(*layers).eval()


def _torch_decoder(params):
    layers = []
    ci = 0
    for layer in DECODER_LAYERS:
        kind = layer[0]
        if kind == "conv":
            layers.append(_to_torch_conv(params[ci]))
            ci += 1
        elif kind == "pad":
            layers.append(nn.ReflectionPad2d(1))
        elif kind == "up":
            layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
        elif kind == "relu":
            layers.append(nn.ReLU())
    return nn.Sequential(*layers).eval()


def test_vgg_encoder_matches_torch_exactly(rng):
    params = init_vgg_params(jax.random.PRNGKey(0))
    # Odd spatial size exercises ceil-mode pooling.
    x = rng.random((1, 37, 45, 3)).astype(np.float32)
    ours = np.asarray(vgg_encode(params, jnp.asarray(x), "relu4_1", jnp.float32))

    tnet = _torch_vgg(params)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(ours - ref).max() / scale < 1e-4


def test_decoder_matches_torch_exactly(rng):
    params = init_decoder_params(jax.random.PRNGKey(1))
    f = rng.standard_normal((1, 5, 7, 512)).astype(np.float32) * 0.1
    ours = np.asarray(decoder_apply(params, jnp.asarray(f), jnp.float32))

    tnet = _torch_decoder(params)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(f).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(ours - ref).max() / scale < 1e-4


def test_weight_converter_roundtrip(tmp_path, rng):
    """torch state_dict -> our params -> identical behavior."""
    from aip_tpu.models.weights import convert_torch_sequential

    params = init_vgg_params(jax.random.PRNGKey(2))
    tnet = _torch_vgg(params)
    # Serialize as a torch Sequential state_dict and convert back.
    sd = {k: v for k, v in tnet.state_dict().items()}
    idxs = sorted({int(k.split(".")[0]) for k in sd})
    converted = convert_torch_sequential(sd, idxs)

    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    a = np.asarray(vgg_encode(params, jnp.asarray(x), "relu4_1", jnp.float32))
    b = np.asarray(vgg_encode(converted, jnp.asarray(x), "relu4_1", jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_vgg19_std_matches_torch(rng):
    """Standard VGG19 extractor (NST backbone) vs a torch mirror with
    identical weights — validates zero-pad convs + pre-ReLU taps."""
    from aip_tpu.models import vgg19_std as B

    params = B.init_vgg19_params(jax.random.PRNGKey(3))

    convs = []
    for p in params:
        convs.append(_to_torch_conv_same(p))

    x = rng.random((1, 32, 40, 3)).astype(np.float32)
    xn = np.asarray(B.normalize_imagenet(jnp.asarray(x)))
    ours = B.extract_features(params, jnp.asarray(xn),
                              ("conv1_1", "conv2_1", "conv4_2"))

    t = torch.from_numpy(xn).permute(0, 3, 1, 2)
    taps = {}
    ci = 0
    for layer in B.VGG19_CONVS:
        name = layer[0]
        if name == "pool":
            t = nn.functional.max_pool2d(t, 2, 2, ceil_mode=True)
            continue
        t = convs[ci](t)
        ci += 1
        if name in ("conv1_1", "conv2_1", "conv4_2"):
            taps[name] = t.detach().permute(0, 2, 3, 1).numpy()
        t = torch.relu(t)

    for name in ("conv1_1", "conv2_1", "conv4_2"):
        a = np.asarray(ours[name])
        b = taps[name]
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 1e-4, name


def _to_torch_conv_same(p):
    w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    conv = nn.Conv2d(w.shape[1], w.shape[0], w.shape[2], padding=w.shape[2] // 2)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    return conv

"""DenseNet-121 feature extractor (torchvision layout) for multi-backbone NST.

Parity with reference `gui/seven_page.py:150-186` DenseNetFeatureExtractor:
stem (conv7x7/2 + BN + ReLU + maxpool3x3/2), dense blocks [6, 12, 24, 16]
with growth 32 and bottleneck width 4x, taps after denseblock1..3 (layer1..3)
and norm5-terminated denseblock4 as layer4. Inference-only BN. NHWC/HWIO.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BLOCK_CONFIG = (6, 12, 24, 16)
GROWTH = 32
INIT_FEATURES = 64


def _conv(x, w, stride=1):
    # Symmetric torch padding; XLA "SAME" is asymmetric under stride 2.
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] + p["beta"]


def _init_bn(c):
    return {"gamma": jnp.ones(c), "beta": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def _init_w(key, kh, kw, cin, cout):
    return jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / (kh * kw * cin))


def init_densenet121_params(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 512))
    params = {
        "stem_w": _init_w(next(keys), 7, 7, 3, INIT_FEATURES),
        "stem_bn": _init_bn(INIT_FEATURES),
        "blocks": [],
        "transitions": [],
    }
    c = INIT_FEATURES
    for bi, n_layers in enumerate(BLOCK_CONFIG):
        block = []
        for li in range(n_layers):
            cin = c + li * GROWTH
            block.append({
                "bn1": _init_bn(cin),
                "w1": _init_w(next(keys), 1, 1, cin, 4 * GROWTH),
                "bn2": _init_bn(4 * GROWTH),
                "w2": _init_w(next(keys), 3, 3, 4 * GROWTH, GROWTH),
            })
        params["blocks"].append(block)
        c = c + n_layers * GROWTH
        if bi < 3:
            params["transitions"].append({
                "bn": _init_bn(c),
                "w": _init_w(next(keys), 1, 1, c, c // 2),
            })
            c = c // 2
    params["norm5"] = _init_bn(c)
    return params


def _dense_block(x, block):
    for layer in block:
        y = jax.nn.relu(_bn(x, layer["bn1"]))
        y = _conv(y, layer["w1"])
        y = jax.nn.relu(_bn(y, layer["bn2"]))
        y = _conv(y, layer["w2"])
        x = jnp.concatenate([x, y], axis=-1)
    return x


def densenet121_features(params: dict, x01: jax.Array) -> dict:
    """ImageNet-normalized NHWC -> {'layer1'..'layer4'} taps
    (seven_page.py:160-186 tap points)."""
    x = _conv(x01, params["stem_w"], stride=2)
    x = jax.nn.relu(_bn(x, params["stem_bn"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    feats = {}
    for bi in range(4):
        x = _dense_block(x, params["blocks"][bi])
        if bi < 3:
            feats[f"layer{bi + 1}"] = x
            t = params["transitions"][bi]
            x = _conv(jax.nn.relu(_bn(x, t["bn"])), t["w"])
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    feats["layer4"] = _bn(x, params["norm5"])
    return feats


def _convert_torch_densenet(sd: dict) -> dict:
    def w(prefix):
        return jnp.asarray(np.transpose(np.asarray(sd[f"{prefix}.weight"], np.float32), (2, 3, 1, 0)))

    def bn(prefix):
        return {
            "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "beta": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"], np.float32)),
        }

    params = {
        "stem_w": w("features.conv0"), "stem_bn": bn("features.norm0"),
        "blocks": [], "transitions": [],
    }
    for bi, n_layers in enumerate(BLOCK_CONFIG):
        block = []
        for li in range(n_layers):
            p = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            block.append({"bn1": bn(f"{p}.norm1"), "w1": w(f"{p}.conv1"),
                          "bn2": bn(f"{p}.norm2"), "w2": w(f"{p}.conv2")})
        params["blocks"].append(block)
        if bi < 3:
            t = f"features.transition{bi + 1}"
            params["transitions"].append({"bn": bn(f"{t}.norm"), "w": w(f"{t}.conv")})
    params["norm5"] = bn("features.norm5")
    return params


def get_densenet121_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_densenet(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_densenet121_params(jax.random.PRNGKey(0))

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
from pathlib import Path

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


def _conv(x, p, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


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
            x = jax.nn.relu(_conv(x, p))
    return feats


def _max_pool_3x3s2(x, ceil_mode=False):
    """torch MaxPool2d(3, 2) / (3, 2, ceil_mode=True) on NHWC."""
    pad = [(0, 0), (0, 0)]
    if ceil_mode:
        h, w = x.shape[1], x.shape[2]
        pad = [(0, (-(h - 3)) % 2), (0, (-(w - 3)) % 2)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0)] + pad + [(0, 0)],
    )


# ---------------------------------------------------------------------------
# AlexNet extractor (lpipsPyTorch/modules/networks.py:49-60; torchvision
# alexnet features; taps relu1..relu5).
# ---------------------------------------------------------------------------

ALEX_CONVS = (
    # (name, cin, cout, kernel, stride, pad, torchvision features index)
    ("conv1", 3, 64, 11, 4, 2, 0),
    ("conv2", 64, 192, 5, 1, 2, 3),
    ("conv3", 192, 384, 3, 1, 1, 6),
    ("conv4", 384, 256, 3, 1, 1, 8),
    ("conv5", 256, 256, 3, 1, 1, 10),
)
ALEX_CHANNELS = (64, 192, 384, 256, 256)


def init_alexnet_params(key: jax.Array):
    params = []
    for _, cin, cout, k, _s, _p, _i in ALEX_CONVS:
        key, wk = jax.random.split(key)
        w = jax.random.normal(wk, (k, k, cin, cout)) * jnp.sqrt(2.0 / (cin * k * k))
        params.append({"w": w, "b": jnp.zeros((cout,))})
    return params


def get_alexnet_params(torch_path=None):
    from aip_tpu.models import weights as weights_mod

    idxs = [f"features.{spec[6]}" for spec in ALEX_CONVS]
    return weights_mod._get_params("alexnet_imagenet", torch_path, idxs,
                                   init_alexnet_params)


def _extract_alex(params, x):
    feats = []
    for i, (_n, _ci, _co, _k, s, p, _ti) in enumerate(ALEX_CONVS):
        x = jax.nn.relu(_conv(x, params[i], stride=s, pad=p))
        feats.append(x)
        if i in (0, 1):  # maxpool after relu1 / relu2
            x = _max_pool_3x3s2(x)
    return feats


# ---------------------------------------------------------------------------
# SqueezeNet-1.1 extractor (networks.py:12-47; 7 taps).
# ---------------------------------------------------------------------------

# Fire modules of squeezenet1_1 features: (features idx, squeeze, expand).
SQUEEZE_FIRES = (
    (3, 16, 64), (4, 16, 64),
    (6, 32, 128), (7, 32, 128),
    (9, 48, 192), (10, 48, 192), (11, 64, 256), (12, 64, 256),
)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)
# Taps after features indices (relu1, fire2, fire4, fire6, fire7, fire8, fire9
# in lpips' slicing of squeezenet1_1).
_SQUEEZE_TAP_AFTER = (1, 4, 7, 9, 10, 11, 12)


def init_squeezenet_params(key: jax.Array):
    def lin(k, kh, cin, cout):
        return {"w": jax.random.normal(k, (kh, kh, cin, cout)) * jnp.sqrt(2.0 / (cin * kh * kh)),
                "b": jnp.zeros((cout,))}

    keys = iter(jax.random.split(key, 64))
    params = {"stem": lin(next(keys), 3, 3, 64)}
    cin = 64
    fires = []
    for _idx, sq, ex in SQUEEZE_FIRES:
        fires.append({
            "squeeze": lin(next(keys), 1, cin, sq),
            "e1": lin(next(keys), 1, sq, ex),
            "e3": lin(next(keys), 3, sq, ex),
        })
        cin = 2 * ex
    params["fires"] = fires
    return params


def get_squeezenet_params(torch_path=None):
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    cache = weights_mod.DEFAULT_WEIGHTS_DIR / "squeezenet_fires.npz"
    if cache.is_file():
        import numpy as np

        d = np.load(cache)
        params = {"stem": {"w": jnp.asarray(d["stem_w"]), "b": jnp.asarray(d["stem_b"])},
                  "fires": []}
        for i in range(len(SQUEEZE_FIRES)):
            params["fires"].append({
                k: {"w": jnp.asarray(d[f"f{i}_{k}_w"]), "b": jnp.asarray(d[f"f{i}_{k}_b"])}
                for k in ("squeeze", "e1", "e3")
            })
        return params
    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_squeezenet(
            weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_squeezenet_params(jax.random.PRNGKey(0))


def _convert_torch_squeezenet(sd: dict) -> dict:
    import numpy as np

    from aip_tpu.models import weights as weights_mod

    def conv(stem):
        w = np.asarray(sd[f"{stem}.weight"], np.float32)
        return {"w": jnp.asarray(weights_mod._torch_conv_to_hwio(w)),
                "b": jnp.asarray(np.asarray(sd[f"{stem}.bias"], np.float32))}

    params = {"stem": conv("features.0"), "fires": []}
    for idx, _sq, _ex in SQUEEZE_FIRES:
        params["fires"].append({
            "squeeze": conv(f"features.{idx}.squeeze"),
            "e1": conv(f"features.{idx}.expand1x1"),
            "e3": conv(f"features.{idx}.expand3x3"),
        })
    return params


def _extract_squeeze(params, x):
    feats = []
    x = jax.nn.relu(_conv(x, params["stem"], stride=2, pad=0))
    feats.append(x)  # after features.1
    fi = 0
    for fidx in range(2, 13):
        if fidx in (2, 5, 8):
            x = _max_pool_3x3s2(x, ceil_mode=True)
            continue
        f = params["fires"][fi]
        fi += 1
        s = jax.nn.relu(_conv(x, f["squeeze"], pad=0))
        x = jnp.concatenate([jax.nn.relu(_conv(s, f["e1"], pad=0)),
                             jax.nn.relu(_conv(s, f["e3"], pad=1))], axis=-1)
        if fidx in _SQUEEZE_TAP_AFTER:
            feats.append(x)
    return feats


_EXTRACTORS = {"vgg": _extract, "alex": _extract_alex, "squeeze": _extract_squeeze}
NET_CHANNELS = {"vgg": LPIPS_CHANNELS, "alex": ALEX_CHANNELS,
                "squeeze": SQUEEZE_CHANNELS}


@functools.partial(jax.jit, static_argnames=("net",))
def lpips(img1: jax.Array, img2: jax.Array, vgg_params, lin_weights=None,
          net: str = "vgg") -> jax.Array:
    """Perceptual distance between NHWC images in [0, 1]. Returns [N].

    ``net`` selects the feature extractor ('vgg' | 'alex' | 'squeeze' —
    the three backbones of `lpipsPyTorch/modules/networks.py:12-96`);
    ``vgg_params`` holds that extractor's parameters.
    """
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def norm_input(x):
        return (x * 2.0 - 1.0 - shift) / scale

    extract = _EXTRACTORS[net]
    f1 = extract(vgg_params, norm_input(img1))
    f2 = extract(vgg_params, norm_input(img2))
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


def get_extractor_params(net: str = "vgg", torch_path=None):
    """Parameters for an lpips(net=...) call."""
    if net == "vgg":
        return get_vgg16_params(torch_path)
    if net == "alex":
        return get_alexnet_params(torch_path)
    if net == "squeeze":
        return get_squeezenet_params(torch_path)
    raise ValueError(f"unknown LPIPS net {net!r}")


def get_lin_weights(net: str = "vgg", torch_path=None):
    """Learned per-channel "lin" weights (richzhang checkpoints,
    `lpipsPyTorch/modules/utils.py:11-30`), or None when unavailable.

    Returns a list of [C] arrays (one per tap) converted from the torch
    state_dict keys ``lin{i}.model.1.weight`` of shape [1, C, 1, 1]. A None
    return means `lpips()` falls back to the UNIFORM per-channel mean —
    scores are self-consistent but NOT comparable to published LPIPS values;
    callers should surface that (see gs/metrics_cli.py `lpips_weights`).
    """
    import numpy as np

    from aip_tpu.models import weights as weights_mod

    cache = weights_mod.DEFAULT_WEIGHTS_DIR / f"lpips_lin_{net}.npz"
    if cache.is_file():
        d = np.load(cache)
        return [jnp.asarray(d[f"l{i}"]) for i in range(len(d.files))]
    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        sd = weights_mod._load_torch_state_dict(Path(torch_path))
        lins = []
        for i in range(len(NET_CHANNELS[net])):
            key = next(k for k in (f"lin{i}.model.1.weight", f"lin.{i}.model.1.weight")
                       if k in sd)
            w = np.asarray(sd[key], np.float32).reshape(-1)
            lins.append(w)
        cache.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache, **{f"l{i}": w for i, w in enumerate(lins)})
        return [jnp.asarray(w) for w in lins]
    return None

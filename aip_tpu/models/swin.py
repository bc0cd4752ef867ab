"""Swin-T feature extractor (shifted-window transformer) for the style mixer.

Completes the reference's backbone list (`gui/seven_page.py:189-229`
SwinFeatureExtractor, torchvision ``swin_t``): patch-embed 4x4 -> stages
[2, 2, 6, 2] of window attention (window 7, heads [3, 6, 12, 24], shifted in
odd blocks, relative position bias) with patch merging between stages. The
extractor returns the final [H/32, W/32, 768] map under the ``"swin"`` key
(the tap seven_page uses) plus per-stage taps.

Weights convert from a torchvision ``swin_t`` state_dict when provided;
deterministic random init otherwise. Input spatial dims must be multiples
of 32 (the style mixer resizes to 224/256 anyway).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DEPTHS = (2, 2, 6, 2)
HEADS = (3, 6, 12, 24)
EMBED = 96
WINDOW = 7
MLP_RATIO = 4


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _init_ln(c):
    return {"g": jnp.ones(c), "b": jnp.zeros(c)}


def _init_lin(key, i, o):
    return {"w": jax.random.normal(key, (i, o)) * (i ** -0.5), "b": jnp.zeros(o)}


def _rel_index(window):
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]  # [49, 49]


_REL_IDX = _rel_index(WINDOW)


def init_swin_t_params(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 1024))
    params = {
        "patch_w": jax.random.normal(next(keys), (4, 4, 3, EMBED)) * 0.02,
        "patch_b": jnp.zeros(EMBED),
        "patch_ln": _init_ln(EMBED),
        "stages": [],
    }
    dim = EMBED
    for si, depth in enumerate(DEPTHS):
        blocks = []
        for _ in range(depth):
            blocks.append({
                "ln1": _init_ln(dim),
                "qkv": _init_lin(next(keys), dim, 3 * dim),
                "proj": _init_lin(next(keys), dim, dim),
                "bias_table": jax.random.normal(
                    next(keys), ((2 * WINDOW - 1) ** 2, HEADS[si])) * 0.02,
                "ln2": _init_ln(dim),
                "fc1": _init_lin(next(keys), dim, MLP_RATIO * dim),
                "fc2": _init_lin(next(keys), MLP_RATIO * dim, dim),
            })
        stage = {"blocks": blocks}
        if si < 3:
            stage["merge_ln"] = _init_ln(4 * dim)
            stage["merge_w"] = _init_lin(next(keys), 4 * dim, 2 * dim)
            dim *= 2
        params["stages"].append(stage)
    params["final_ln"] = _init_ln(dim)
    return params


def _window_partition(x, sh, sw):
    """[N, H, W, C] -> [N*nW, 49, C]; (sh, sw) is the cyclic shift."""
    n, h, w, c = x.shape
    if sh or sw:
        x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
    nh, nw = h // WINDOW, w // WINDOW
    xw = x.reshape(n, nh, WINDOW, nw, WINDOW, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(n * nh * nw, WINDOW * WINDOW, c), (n, nh, nw)


def _window_reverse(xw, dims, h, w, c, sh, sw):
    n, nh, nw = dims
    x = xw.reshape(n, nh, nw, WINDOW, WINDOW, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, h, w, c)
    if sh or sw:
        x = jnp.roll(x, (sh, sw), axis=(1, 2))
    return x


def _shift_mask(h, w, sh, sw):
    """Attention mask for shifted windows (cross-boundary pairs masked).
    Per-axis: an unshifted axis contributes no region boundaries."""
    def regions(n, s):
        ids = np.zeros(n)
        if s:
            ids[-WINDOW:-s] = 1
            ids[-s:] = 2
        return ids

    img = regions(h, sh)[:, None] * 3 + regions(w, sw)[None, :]
    nh, nw = h // WINDOW, w // WINDOW
    win = img.reshape(nh, WINDOW, nw, WINDOW).transpose(0, 2, 1, 3).reshape(-1, WINDOW * WINDOW)
    mask = (win[:, :, None] != win[:, None, :]) * -100.0  # [nW, 49, 49]
    return jnp.asarray(mask, jnp.float32)


def _block(x, p, heads, shift):
    n, h0, w0, c = x.shape
    # Pad to window multiples (torchvision pads the same way).
    ph = (-h0) % WINDOW
    pw = (-w0) % WINDOW
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    n, h, w, c = x.shape
    # torchvision shifted_window_attention: no shift along an axis whose
    # padded extent fits in one window (stage 4 of a 224 input is 7x7 —
    # shifting there would wrongly mask pairs inside the only window).
    sh = WINDOW // 2 if (shift and h > WINDOW) else 0
    sw = WINDOW // 2 if (shift and w > WINDOW) else 0
    head_dim = c // heads
    shortcut = x
    y = _ln(x, p["ln1"])
    yw, dims = _window_partition(y, sh, sw)
    nw_total, t, _ = yw.shape

    qkv = yw @ p["qkv"]["w"] + p["qkv"]["b"]
    qkv = qkv.reshape(nw_total, t, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [nW, heads, 49, hd]
    attn = (q @ jnp.swapaxes(k, -1, -2)) * (head_dim ** -0.5)
    bias = p["bias_table"][jnp.asarray(_REL_IDX)]  # [49, 49, heads]
    attn = attn + bias.transpose(2, 0, 1)[None]
    if sh or sw:
        m = _shift_mask(h, w, sh, sw)  # [nW_per_img, 49, 49]
        n_img = dims[0]
        attn = attn.reshape(n_img, -1, heads, t, t) + m[None, :, None]
        attn = attn.reshape(nw_total, heads, t, t)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw_total, t, c)
    out = out @ p["proj"]["w"] + p["proj"]["b"]
    x = shortcut + _window_reverse(out, dims, h, w, c, sh, sw)

    y = _ln(x, p["ln2"])
    # torchvision's nn.GELU is the exact erf form (JAX defaults to tanh).
    y = jax.nn.gelu(y @ p["fc1"]["w"] + p["fc1"]["b"], approximate=False)
    y = y @ p["fc2"]["w"] + p["fc2"]["b"]
    out = x + y
    if ph or pw:
        out = out[:, :h0, :w0, :]
    return out


def swin_t_features(params: dict, x01: jax.Array) -> dict:
    """ImageNet-normalized NHWC (H, W multiples of 32) -> feature taps.

    Returns {'layer1'..'layer4', 'swin'} with 'swin' = final-norm [H/32,
    W/32, 768] (seven_page's tap)."""
    x = jax.lax.conv_general_dilated(
        x01, params["patch_w"], (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_b"]
    x = _ln(x, params["patch_ln"])

    feats = {}
    for si, stage in enumerate(params["stages"]):
        for bi, block in enumerate(stage["blocks"]):
            x = _block(x, block, HEADS[si], shift=bi % 2 == 1)
        feats[f"layer{si + 1}"] = x
        if "merge_w" in stage:
            n, h, w, c = x.shape
            if h % 2 or w % 2:
                x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            # torchvision PatchMerging concat order: [x0, x1, x2, x3] =
            # (h+0,w+0), (h+1,w+0), (h+0,w+1), (h+1,w+1) — h-offset varies
            # FIRST (a reshape/transpose pack gives w-offset-first and
            # silently permutes the 4c channel groups vs the checkpoint).
            x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
            x = _ln(x, stage["merge_ln"])
            x = x @ stage["merge_w"]["w"] + stage["merge_w"]["b"]
    feats["swin"] = _ln(x, params["final_ln"])
    return feats


def get_swin_t_params(torch_path=None) -> dict:
    from pathlib import Path

    from aip_tpu.models import weights as weights_mod

    if torch_path is not None and weights_mod._is_real_checkpoint(Path(torch_path)):
        return _convert_torch_swin(weights_mod._load_torch_state_dict(Path(torch_path)))
    return init_swin_t_params(jax.random.PRNGKey(0))


def _convert_torch_swin(sd: dict) -> dict:
    """Best-effort torchvision swin_t conversion (features.{0,1,3,5,7} =
    patch embed + stages, features.{2,4,6} = patch merges)."""
    def lin(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32).T
        # PatchMerging's reduction Linear is bias-free in torchvision.
        b = (np.asarray(sd[f"{prefix}.bias"], np.float32)
             if f"{prefix}.bias" in sd else np.zeros(w.shape[1], np.float32))
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    def ln(prefix):
        return {"g": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}

    params = {
        "patch_w": jnp.asarray(np.transpose(
            np.asarray(sd["features.0.0.weight"], np.float32), (2, 3, 1, 0))),
        "patch_b": jnp.asarray(np.asarray(sd["features.0.0.bias"], np.float32)),
        "patch_ln": ln("features.0.2"),
        "stages": [],
    }
    stage_feature_idx = (1, 3, 5, 7)
    merge_idx = (2, 4, 6)
    for si, depth in enumerate(DEPTHS):
        blocks = []
        for bi in range(depth):
            p = f"features.{stage_feature_idx[si]}.{bi}"
            blocks.append({
                "ln1": ln(f"{p}.norm1"),
                "qkv": lin(f"{p}.attn.qkv"),
                "proj": lin(f"{p}.attn.proj"),
                "bias_table": jnp.asarray(np.asarray(
                    sd[f"{p}.attn.relative_position_bias_table"], np.float32)),
                "ln2": ln(f"{p}.norm2"),
                "fc1": lin(f"{p}.mlp.0"),
                "fc2": lin(f"{p}.mlp.3"),
            })
        stage = {"blocks": blocks}
        if si < 3:
            m = f"features.{merge_idx[si]}"
            stage["merge_ln"] = ln(f"{m}.norm")
            stage["merge_w"] = lin(f"{m}.reduction")
        params["stages"].append(stage)
    params["final_ln"] = ln("norm")
    return params

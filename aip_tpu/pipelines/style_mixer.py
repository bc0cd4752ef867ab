"""Multi-backbone NST with palette post-processing (reference
`gui/seven_page.py` "Style Mixer" page engine).

Components (reference line refs):
* backbone registry — ResNet50 / VGG16 feature extractors (:123-256), with
  registration hooks for additional backbones (DenseNet121, Swin-T);
* ``style_transfer`` (:290-352) — Adam on the image, 300 iters, per-layer
  style weights, noise-mixed init ``0.6*content + 0.4*noise``;
* ``extract_palette`` (:395-409) — KMeans over CIELAB pixels;
* ``map_colors`` (:412-428) — nearest palette color in CIELAB;
* ``blend_images_with_intensity`` (:431-437) — gamma-2.2 blend;
* predefined palettes + HSL adjustment (:46-120);
* artist-prompt style selection (:566-600).

TPU-first: the optimization loop is one jitted lax.scan; k-means and the
LAB mapping are jitted matmul/argmin kernels.
"""

from __future__ import annotations

import colorsys
import functools
import random
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from aip_tpu.ops.gram import gram_matrix

# :46-58
PREDEFINED_PALETTES = {
    "Green": ["#00ff00", "#009900", "#66ff66", "#33cc33", "#00cc00"],
    "Mario": ["#fed1b0", "#ee1c25", "#0065b3", "#ffffff", "#894c2f"],
    "Black": ["#000000", "#333333", "#666666", "#999999", "#cccccc"],
    "White": ["#ffffff", "#f0f0f0", "#e0e0e0", "#d0d0d0", "#c0c0c0"],
    "Vintage": ["#131842", "#E68369", "#ECCEAE", "#FBF6E2", "#8E9B73"],
    "Blue": ["#000000", "#2f4550", "#586f7c", "#b8dbd9", "#f4f4f9"],
}
PALETTE_MENU = list(PREDEFINED_PALETTES)

WEIGHT_CONFIGURATIONS = {
    "Swin": {"swin": 1000.0},
    "VGG": {"layer2": 1000.0, "layer3": 1500.0},
    "default": {"layer2": 1000.0, "layer3": 1500.0},
}
MODEL_LIST = ["ResNet", "DenseNet", "Swin", "VGG"]

ARTISTS = {"1": "vangogh", "2": "pietmondriaan", "3": "picasso", "4": "claudemonet"}

_EXTRA_BACKBONES = {}


def register_backbone(name: str, extractor_fn) -> None:
    """extractor_fn(img_norm_nhwc) -> {layer_name: features}."""
    _EXTRA_BACKBONES[name] = extractor_fn


def hex_to_rgb_palette(hex_list):
    """:81-93 parity — [0,1] floats."""
    out = []
    for h in hex_list:
        h = h.lstrip("#")
        out.append([int(h[i:i + 2], 16) / 255.0 for i in (0, 2, 4)])
    return out


def adjust_palette_hsl(palette, saturation: float = 1.0, hue: float = 0.0):
    """:109-120 parity (colorsys HLS)."""
    adjusted = []
    for color_val in palette:
        h, l, s = colorsys.rgb_to_hls(*color_val)
        s *= saturation
        h = (h + hue) % 1.0
        adjusted.append(list(colorsys.hls_to_rgb(h, l, s)))
    return adjusted


def select_style_for_prompt(prompt: str, style_dir) -> str | None:
    """Artist-prompt selection (:566-600): match an artist keyword in the
    prompt and pick a random style image whose filename contains it."""
    prompt = prompt.lower()
    style_dir = Path(style_dir)
    for artist in ARTISTS.values():
        if artist in prompt.replace(" ", ""):
            candidates = [p for p in style_dir.glob("*") if artist in p.name.lower()]
            if candidates:
                return str(random.choice(candidates))
    all_imgs = [p for p in style_dir.glob("*")
                if p.suffix.lower() in (".jpg", ".jpeg", ".png")]
    return str(random.choice(all_imgs)) if all_imgs else None


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------

def get_feature_extractor(model: str):
    """Returns fn(img_normalized_nhwc) -> {layer: feats}. ResNet and VGG are
    built in; DenseNet/Swin plug in via register_backbone."""
    if model in _EXTRA_BACKBONES:
        return _EXTRA_BACKBONES[model]
    if model == "ResNet":
        from aip_tpu.models.resnet import get_resnet50_params, resnet50_features

        params = get_resnet50_params()
        return functools.partial(resnet50_features, params)
    if model == "DenseNet":
        from aip_tpu.models.densenet import get_densenet121_params, densenet121_features

        params = get_densenet121_params()
        return functools.partial(densenet121_features, params)
    if model == "VGG":
        from aip_tpu.models.lpips import get_vgg16_params, _extract

        params = get_vgg16_params()

        def vgg_feats(x):
            taps = _extract(params, x)
            # relu2_2 / relu3_3 / relu4_3 as layer2/3/4 (seven_page VGG
            # extractor uses the same block-level taps).
            return {"layer1": taps[0], "layer2": taps[1],
                    "layer3": taps[2], "layer4": taps[3]}

        return vgg_feats
    if model == "Swin":
        from aip_tpu.models.swin import get_swin_t_params, swin_t_features

        params = get_swin_t_params()
        return functools.partial(swin_t_features, params)
    raise ValueError(f"unknown backbone {model}")


def _gram_chw(feat: jax.Array) -> jax.Array:
    """seven_page gram (:259-266): [1, H, W, C] -> [C, C] / numel."""
    _, h, w, c = feat.shape
    f = feat.reshape(h * w, c)
    return (f.T @ f) / (c * h * w)


def style_transfer(
    content01: jax.Array,
    style01: jax.Array,
    model: str = "ResNet",
    iterations: int = 300,
    content_weight: float = 0.5,
    style_weight: float = 1000.0,
    lr: float = 0.003,
    seed: int = 0,
) -> jax.Array:
    """NST with the chosen backbone (:290-352). NHWC [1, H, W, 3] in/out."""
    from aip_tpu.models.vgg19_std import normalize_imagenet

    extractor = get_feature_extractor(model)
    if model == "Swin":
        content_layer, style_layers = "swin", ("swin",)
        weight_config = WEIGHT_CONFIGURATIONS["Swin"]
    else:
        content_layer, style_layers = "layer4", ("layer2", "layer3")
        weight_config = WEIGHT_CONFIGURATIONS["VGG" if model == "VGG" else "default"]

    x_c = normalize_imagenet(content01)
    x_s = normalize_imagenet(style01)
    content_feats = jax.tree.map(jax.lax.stop_gradient, extractor(x_c))
    style_feats = jax.tree.map(jax.lax.stop_gradient, extractor(x_s))
    style_grams = {k: _gram_chw(style_feats[k]) for k in style_layers}

    noise = jax.random.normal(jax.random.PRNGKey(seed), x_c.shape)
    init_img = 0.6 * x_c + 0.4 * noise

    opt = optax.adam(lr)

    def loss_fn(img):
        feats = extractor(img)
        c_loss = jnp.mean((feats[content_layer] - content_feats[content_layer]) ** 2)
        s_loss = 0.0
        for layer in style_layers:
            g = _gram_chw(feats[layer])
            s_loss = s_loss + weight_config[layer] * jnp.mean((g - style_grams[layer]) ** 2)
        return content_weight * c_loss + style_weight * s_loss

    @jax.jit
    def run(img0):
        def step(carry, _):
            img, s = carry
            g = jax.grad(loss_fn)(img)
            upd, s = opt.update(g, s, img)
            return (optax.apply_updates(img, upd), s), None

        (img, _), _ = jax.lax.scan(step, (img0, opt.init(img0)), None, length=iterations)
        return img

    from aip_tpu.models.vgg19_std import denormalize_imagenet

    return denormalize_imagenet(run(init_img))


# ---------------------------------------------------------------------------
# Palette post-processing
# ---------------------------------------------------------------------------

def rgb_to_cielab(rgb01: jax.Array) -> jax.Array:
    """Float CIELAB (skimage convention: L in [0,100], a/b signed)."""
    from aip_tpu.ops.palette import _srgb_to_xyz

    xyz = _srgb_to_xyz(rgb01.astype(jnp.float32))
    xn = jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    t = xyz / xn
    f = jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = jnp.where(t[..., 1] > 0.008856, 116.0 * fy - 16.0, 903.3 * t[..., 1])
    return jnp.stack([L, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1)


def cielab_to_rgb(lab: jax.Array) -> jax.Array:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(f):
        f3 = f**3
        return jnp.where(f3 > 0.008856, f3, (f - 16.0 / 116.0) / 7.787)

    xn = jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    xyz = jnp.stack([finv(fx), finv(fy), finv(fz)], axis=-1) * xn
    m = jnp.asarray(
        [[3.240479, -1.537150, -0.498535],
         [-0.969256, 1.875992, 0.041556],
         [0.055648, -0.204043, 1.057311]], jnp.float32)
    lin = xyz @ m.T
    srgb = jnp.where(lin > 0.0031308, 1.055 * jnp.maximum(lin, 1e-8) ** (1 / 2.4) - 0.055,
                     12.92 * lin)
    return jnp.clip(srgb, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("num_colors", "iters"))
def _kmeans_lab(pixels_lab: jax.Array, key: jax.Array, num_colors: int, iters: int = 20):
    n = pixels_lab.shape[0]
    idx = jax.random.choice(key, n, (num_colors,), replace=False)
    centers = pixels_lab[idx]

    def step(centers, _):
        d2 = (jnp.sum(pixels_lab**2, 1, keepdims=True)
              - 2 * pixels_lab @ centers.T + jnp.sum(centers**2, 1)[None])
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, num_colors, dtype=pixels_lab.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ pixels_lab
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def extract_palette(image01: jax.Array, num_colors: int = 5, random_state: int = 0):
    """KMeans palette in CIELAB (:395-409). Returns [num_colors, 3] RGB."""
    lab = rgb_to_cielab(image01).reshape(-1, 3)
    centers = _kmeans_lab(lab, jax.random.PRNGKey(random_state), num_colors)
    return cielab_to_rgb(centers)


@jax.jit
def map_colors(image01: jax.Array, palette_rgb01: jax.Array) -> jax.Array:
    """Nearest palette color per pixel in CIELAB (:412-428)."""
    shape = image01.shape
    lab = rgb_to_cielab(image01).reshape(-1, 3)
    pal_lab = rgb_to_cielab(palette_rgb01)
    d2 = (jnp.sum(lab**2, 1, keepdims=True) - 2 * lab @ pal_lab.T
          + jnp.sum(pal_lab**2, 1)[None])
    mapped = pal_lab[jnp.argmin(d2, axis=1)]
    return cielab_to_rgb(mapped.reshape(shape))


def blend_images_with_intensity(base: jax.Array, over: jax.Array,
                                intensity: float = 1.0) -> jax.Array:
    """Gamma-2.2 blend (:431-437)."""
    b = jnp.maximum(base, 0.0) ** 2.2
    o = jnp.maximum(over, 0.0) ** 2.2
    return (b * intensity + o * (1.0 - intensity)) ** (1 / 2.2)


def stylize_with_palette(
    content,
    style,
    model: str = "ResNet",
    palette_name: str = "Vintage",
    palette_intensity: float = 0.25,
    iterations: int = 300,
    size: int = 256,
    saturation: float = 1.0,
    hue: float = 0.0,
):
    """Full seven_page pipeline: NST -> palette map -> intensity blend."""
    from aip_tpu.pipelines.adain_infer import _to_array
    from aip_tpu.ops.image import resize_bilinear

    c = resize_bilinear(jnp.asarray(_to_array(content)), (size, size), antialias=True)[None]
    s = resize_bilinear(jnp.asarray(_to_array(style)), (size, size), antialias=True)[None]
    out = style_transfer(c, s, model=model, iterations=iterations)

    palette = adjust_palette_hsl(
        hex_to_rgb_palette(PREDEFINED_PALETTES[palette_name]), saturation, hue)
    mapped = map_colors(out[0], jnp.asarray(palette, jnp.float32))
    blended = blend_images_with_intensity(mapped, out[0], palette_intensity)
    return jnp.clip(blended, 0.0, 1.0)

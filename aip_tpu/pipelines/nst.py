"""Optimization-based neural style transfer (Gram-matrix NST).

Covers three reference surfaces with one engine:
* `spatial_variation/StyleTransfer.py` — single-style NST (conv4_2 content,
  conv1_1..conv5_1 style grams, Adam lr=0.003, 800 steps, style 1e5) plus
  the color-coded-mask spatial blending of `gui/eight_page.py:68-132`;
* `mixing_texture_gyum/` — multi-style weighted Gram mixing
  (`style_mixer.py`, `neural_style_transfer.py`: 2000 steps, style 1e6);
* `gui/seven_page.py` — backbone-pluggable NST with palette post-processing.

TPU-first: the entire Adam optimization loop runs inside ONE jitted
`lax.scan` — zero per-step host dispatch; the loss (feature extraction +
grams) is a straight conv/matmul graph on the MXU. Multiple styles enter as
a stacked tensor with a weight vector, and independent NST runs (e.g. the
three spatial-variation stylizations) batch along the leading axis.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from aip_tpu.models import vgg19_std as backbone
from aip_tpu.ops.gram import gram_matrix
from aip_tpu.ops.image import resize_bicubic, resize_smaller_edge
from aip_tpu.ops.metrics import _gaussian_window


def _style_grams(params, styles: jax.Array, style_layers):
    """[S, H, W, 3] normalized styles -> {layer: [S, C, C]}."""
    feats = backbone.extract_features(params, styles, style_layers)
    return {k: gram_matrix(v) for k, v in feats.items()}


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "lr", "style_weight", "content_weight",
                     "style_layers", "content_layer"),
)
def nst_optimize(
    params,
    content01: jax.Array,
    styles01: jax.Array,
    style_mix_weights: jax.Array,
    num_steps: int = 800,
    lr: float = 0.003,
    style_weight: float = 1e5,
    content_weight: float = 1.0,
    style_layers: tuple = backbone.NST_STYLE_LAYERS,
    content_layer: str = backbone.NST_CONTENT_LAYER,
) -> jax.Array:
    """Optimize an image to match content features + (weighted) style grams.

    content01: [1, H, W, 3] in [0,1]; styles01: [S, Hs, Ws, 3];
    style_mix_weights: [S] (normalized internally, style_mixer.py:33-52).
    Returns the stylized image [1, H, W, 3] in [0,1].
    """
    x_c = backbone.normalize_imagenet(content01)
    x_s = backbone.normalize_imagenet(styles01)

    content_feat = backbone.extract_features(params, x_c, (content_layer,))[content_layer]
    grams = _style_grams(params, x_s, style_layers)
    wts = style_mix_weights / jnp.sum(style_mix_weights)

    opt = optax.adam(lr)

    def loss_fn(img):
        feats = backbone.extract_features(params, img, tuple(style_layers) + (content_layer,))
        c_loss = jnp.mean((feats[content_layer] - content_feat) ** 2)
        s_loss = 0.0
        for layer in style_layers:
            g = gram_matrix(feats[layer])  # [1, C, C]
            # MSE to each style's gram, weighted (style_mixer.py:38-52).
            per_style = jnp.mean((g - grams[layer]) ** 2, axis=(1, 2))  # [S]
            s_loss = s_loss + jnp.sum(wts * per_style)
        return content_weight * c_loss + style_weight * s_loss

    def step(carry, _):
        img, opt_state = carry
        g = jax.grad(loss_fn)(img)
        updates, opt_state = opt.update(g, opt_state, img)
        img = optax.apply_updates(img, updates)
        return (img, opt_state), None

    init = (x_c, opt.init(x_c))
    (final, _), _ = jax.lax.scan(step, init, None, length=num_steps)
    return backbone.denormalize_imagenet(final)


def run_style_transfer(
    content,
    style,
    max_dim: int = 1024,
    style_weight: float = 1e5,
    content_weight: float = 1.0,
    num_steps: int = 800,
    lr: float = 0.003,
    params=None,
):
    """Single-style NST, StyleTransfer-class parity (spatial_variation).

    content/style: HWC float [0,1] arrays (or PIL/paths via _to_array).
    Returns HWC [0,1] at the content's (possibly max_dim-capped) size.
    """
    from aip_tpu.pipelines.adain_infer import _to_array

    if params is None:
        params = backbone.get_vgg19_params()
    c = jnp.asarray(_to_array(content))
    s = jnp.asarray(_to_array(style))

    def cap(img):
        h, w, _ = img.shape
        if max(h, w) > max_dim:
            r = max_dim / max(h, w)
            img = resize_bicubic(img, (int(h * r), int(w * r)))
        return img

    c = cap(c)
    s = cap(s)
    out = nst_optimize(
        params, c[None], s[None], jnp.ones((1,)),
        num_steps=num_steps, lr=lr,
        style_weight=style_weight, content_weight=content_weight,
    )
    return out[0]


def mix_styles(
    content,
    styles_and_weights: Sequence[tuple],
    num_steps: int = 2000,
    lr: float = 0.01,
    style_weight: float = 1e6,
    content_weight: float = 1.0,
    size: int = 256,
    params=None,
):
    """Multi-style Gram mixing (mixing_texture_gyum parity).

    styles_and_weights: [(image, weight), ...]. All images resized to
    ``size`` on the smaller edge then center-region used at content's shape.
    """
    from aip_tpu.pipelines.adain_infer import _to_array
    from aip_tpu.ops.image import center_crop

    if params is None:
        params = backbone.get_vgg19_params()
    c = center_crop(resize_smaller_edge(jnp.asarray(_to_array(content)), size), size)
    styles = jnp.stack([
        center_crop(resize_smaller_edge(jnp.asarray(_to_array(s)), size), size)
        for s, _ in styles_and_weights
    ])
    wts = jnp.asarray([float(w) for _, w in styles_and_weights], jnp.float32)
    out = nst_optimize(
        params, c[None], styles, wts,
        num_steps=num_steps, lr=lr,
        style_weight=style_weight, content_weight=content_weight,
    )
    return out[0]


def color_mask(mask_rgb01: jax.Array, color01, feather: int = 5) -> jax.Array:
    """Feathered binary mask for an exact RGB color (eight_page.py:103-108)."""
    m = jnp.all(jnp.abs(mask_rgb01 - jnp.asarray(color01, jnp.float32)) < (0.5 / 255.0), axis=-1)
    m = m.astype(jnp.float32)
    if feather > 0:
        k = 2 * feather + 1
        win = jnp.asarray(_gaussian_window(k, 0.3 * ((k - 1) * 0.5 - 1) + 0.8))
        mp = jnp.pad(m, ((feather, feather), (feather, feather)), mode="edge")
        m = jax.lax.conv_general_dilated(
            mp[None, :, :, None], win[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]
    return m


def spatially_varying_style_transfer(
    content,
    style1,
    style2,
    style3,
    mask,
    feather: int = 5,
    params=None,
    **nst_kwargs,
):
    """Three full-image stylizations blended by an R/G/B color-coded mask.

    Parity: gui/eight_page.py:68-132 spatial_pipeline (red -> style1,
    green -> style2, blue -> style3; sequential over-compositing with
    Gaussian-feathered masks). Returns HWC [0,1].
    """
    from aip_tpu.pipelines.adain_infer import _to_array

    content_np = _to_array(content)
    h, w, _ = content_np.shape

    styled = []
    for s in (style1, style2, style3):
        out = run_style_transfer(content_np, s, params=params, **nst_kwargs)
        styled.append(resize_bicubic(out, (h, w)))

    mask01 = jnp.asarray(_to_array(mask))
    if mask01.shape[:2] != (h, w):
        from aip_tpu.ops.image import resize_nearest

        mask01 = resize_nearest(mask01, (h, w))

    final = jnp.zeros_like(styled[0])
    for styled_img, color in zip(styled, ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0))):
        m = color_mask(mask01, color, feather)[..., None]
        final = m * styled_img + (1.0 - m) * final
    return jnp.clip(final, 0.0, 1.0)

"""2D AdaIN stylization pipeline (the reference's central API).

Behavioral parity with `Style_3DGS/AdaIN/test.py`:
* ``style_transfer_simple`` (:74-81) — alpha-blended AdaIN;
* ``style_transfer`` (:52-71) — depth-aware blend with the stylization
  strength map P (``feat = AdaIN*(1-P) + content_f*P``);
* ``adain_inference`` (:153-247) — full IO wrapper: smaller-edge-512 resize,
  optional CORAL color preservation, optional depth path, optional binary
  mask composite, JPEG save, returns the output path;
* ``get_style_embeddings`` (:27-49) — relu4_1 feature map of the style image.

TPU-first: the whole encode -> AdaIN -> blend -> decode graph is one jitted
XLA program (no host round-trips between stages); conv compute is bfloat16 on
the MXU by default with fp32 statistics. Batched variants are first-class —
the unit of data parallelism is a batch of images sharded over the mesh (see
aip_tpu.parallel).
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.ops.adain import adain, coral
from aip_tpu.ops.depth import compute_stylization_strength_map
from aip_tpu.ops.image import (
    resize_bilinear,
    resize_nearest,
    resize_smaller_edge,
    center_crop,
)
from aip_tpu.models.vgg import vgg_encode
from aip_tpu.models.decoder import decoder_apply
from aip_tpu.models import weights as weights_mod


# ---------------------------------------------------------------------------
# Jitted compute cores (static shapes; batched NHWC)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("alpha", "compute_dtype"))
def stylize_simple(
    vgg_params,
    dec_params,
    content: jax.Array,
    style: jax.Array,
    alpha: float = 0.5,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """AdaIN stylization, alpha-blended in feature space. NHWC [0,1].

    Parity: reference `test.py:74-81`.
    """
    content_f = vgg_encode(vgg_params, content, "relu4_1", compute_dtype)
    style_f = vgg_encode(vgg_params, style, "relu4_1", compute_dtype)
    feat = adain(content_f, style_f)
    feat = feat.astype(jnp.float32) * alpha + content_f.astype(jnp.float32) * (1.0 - alpha)
    return decoder_apply(dec_params, feat.astype(compute_dtype), compute_dtype).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("offset", "prominence", "compute_dtype"))
def stylize_depth(
    vgg_params,
    dec_params,
    content: jax.Array,
    style: jax.Array,
    depth_map: jax.Array,
    offset: float = 0.15,
    prominence: float = 20.0,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Depth-aware AdaIN: close regions keep more content (Kitov et al. 2019).

    Parity: reference `test.py:52-71`. ``depth_map`` is an [H, W] proximity
    map for the (single) content image; content/style are [1, H, W, 3].
    """
    content_f = vgg_encode(vgg_params, content, "relu4_1", compute_dtype)
    style_f = vgg_encode(vgg_params, style, "relu4_1", compute_dtype)
    hc, wc = content_f.shape[1], content_f.shape[2]
    p = compute_stylization_strength_map(depth_map, (hc, wc), offset, prominence)
    p = p[None, :, :, None]
    feat = adain(content_f, style_f).astype(jnp.float32)
    feat = feat * (1.0 - p) + content_f.astype(jnp.float32) * p
    return decoder_apply(dec_params, feat.astype(compute_dtype), compute_dtype).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def style_embedding(vgg_params, style: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """relu4_1 feature map of a style image (reference `test.py:27-49`)."""
    return vgg_encode(vgg_params, style, "relu4_1", compute_dtype).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def precompute_style_stats(vgg_params, style: jax.Array, compute_dtype=jnp.bfloat16):
    """One-shot: encode a style image and reduce to AdaIN (mean, std).

    AdaIN consumes only the style's per-channel statistics
    (`function.py:15-23`), so a fixed style costs 512+512 floats — the
    reference re-encodes the style image on every call; caching the stats
    halves the steady-state FLOPs of batch stylization.
    """
    from aip_tpu.ops.adain import calc_mean_std

    style_f = vgg_encode(vgg_params, style, "relu4_1", compute_dtype)
    return calc_mean_std(style_f)


@functools.partial(jax.jit, static_argnames=("alpha", "compute_dtype"))
def stylize_with_stats(
    vgg_params,
    dec_params,
    content: jax.Array,
    style_mean: jax.Array,
    style_std: jax.Array,
    alpha: float = 0.5,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Stylize a content batch against precomputed style stats.

    Steady-state serving path: content encode -> renormalize -> decode, one
    fused XLA program, no style encode.
    """
    from aip_tpu.ops.adain import calc_mean_std

    content_f = vgg_encode(vgg_params, content, "relu4_1", compute_dtype)
    c_mean, c_std = calc_mean_std(content_f)
    x = content_f.astype(jnp.float32)
    feat = (x - c_mean) / c_std * style_std + style_mean
    feat = feat * alpha + x * (1.0 - alpha)
    return decoder_apply(dec_params, feat.astype(compute_dtype), compute_dtype).astype(jnp.float32)


def stylize_batch_with_stats(
    vgg_params,
    dec_params,
    content: jax.Array,
    style_mean: jax.Array,
    style_std: jax.Array,
    masks: jax.Array | None = None,
    alpha: float = 0.5,
) -> jax.Array:
    """Batched serving-path stylization with `adain_inference`'s composite
    semantics: the decoder returns 8*floor(H/8) rows when H % 8 != 0, so the
    output is resized back to the content size BEFORE the binary-mask
    composite (reference test.py:222-236). ``masks`` is [N, H, W, 1] at the
    content working size (or None for plain stylization)."""
    out = stylize_with_stats(vgg_params, dec_params, content,
                             style_mean, style_std, alpha=alpha)
    target_hw = (content.shape[1], content.shape[2])
    if out.shape[1:3] != target_hw:
        out = resize_bilinear(out, target_hw)
    if masks is not None:
        out = content * (1.0 - masks) + out * masks
    return out


@functools.partial(jax.jit, static_argnames=("alpha", "compute_dtype"))
def stylize_interpolated(
    vgg_params,
    dec_params,
    content: jax.Array,
    styles: jax.Array,
    interpolation_weights: jax.Array,
    alpha: float = 1.0,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Style interpolation: blend the AdaIN features of S styles.

    Parity with `AdaIN/test_video.py:30-46` style_transfer with
    interpolation_weights: per-style AdaIN of the (broadcast) content
    features, weighted sum, alpha blend with content. content [1, H, W, 3];
    styles [S, Hs, Ws, 3]; weights [S].
    """
    content_f = vgg_encode(vgg_params, content, "relu4_1", compute_dtype)
    style_f = vgg_encode(vgg_params, styles, "relu4_1", compute_dtype)
    s = styles.shape[0]
    content_rep = jnp.broadcast_to(content_f, (s,) + content_f.shape[1:])
    base = adain(content_rep, style_f).astype(jnp.float32)
    w = interpolation_weights / jnp.sum(interpolation_weights)
    feat = jnp.sum(base * w[:, None, None, None], axis=0, keepdims=True)
    feat = feat * alpha + content_f.astype(jnp.float32) * (1.0 - alpha)
    return decoder_apply(dec_params, feat.astype(compute_dtype), compute_dtype).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Host-side IO wrapper (PIL in, JPEG out) — reference CLI surface
# ---------------------------------------------------------------------------

def _to_pil(img):
    """PIL image (or path / uint8 array) -> PIL; float arrays -> None."""
    from PIL import Image

    if isinstance(img, (str, Path)):
        return Image.open(str(img))
    if isinstance(img, Image.Image):
        return img
    if isinstance(img, np.ndarray) and img.dtype == np.uint8:
        return Image.fromarray(img)
    return None


def _to_array(img) -> np.ndarray:
    """PIL image or ndarray -> float32 HWC in [0,1], alpha dropped."""
    pil = _to_pil(img)
    if pil is not None:
        img = np.asarray(pil)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:  # drop alpha (reference test.py:46-47)
        img = img[..., :3]
    return np.ascontiguousarray(img, dtype=np.float32)


def _test_transform(img, size: int, crop: bool) -> jax.Array:
    """Parity with reference `test.py:16-24` test_transform.

    For PIL / uint8 inputs (the CLI surface) the resize runs through PIL
    itself: torchvision's ``transforms.Resize`` on a PIL image delegates to
    ``PIL.Image.resize(..., BILINEAR)`` (uint8 fixed-point arithmetic), so
    this path is bit-exact with the reference's test_transform. Float arrays
    (device pipelines) use the antialiased-bilinear array op instead.
    """
    from PIL import Image
    from aip_tpu.ops.image import smaller_edge_size

    pil = _to_pil(img)
    if pil is not None:
        if size != 0:
            oh, ow = smaller_edge_size(pil.size[1], pil.size[0], size)
            pil = pil.resize((ow, oh), Image.BILINEAR)
        if crop:
            w, h = pil.size
            left, top = max(0, (w - size) // 2), max(0, (h - size) // 2)
            pil = pil.crop((left, top, left + size, top + size))
        return jnp.asarray(_to_array(pil))
    x = jnp.asarray(_to_array(img) if isinstance(img, np.ndarray) else img)
    if size != 0:
        x = resize_smaller_edge(x, size)
    if crop:
        x = center_crop(x, size)
    return x


def save_image(arr, path) -> None:
    """Clamp to [0,1] and save (torchvision save_image parity: round-half-away)."""
    from PIL import Image

    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    a = np.clip(a, 0.0, 1.0)
    a8 = np.clip(np.floor(a * 255.0 + 0.5), 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(a8).save(str(path))


def get_style_embeddings(style_img, style_size: int = 512, crop: bool = False,
                         vgg_params=None,
                         compute_dtype=jnp.float32) -> jax.Array:
    """relu4_1 features of a style image, [1, h, w, 512] (test.py:27-49).

    fp32 by default: this runs once per scene/style (3DGS pre-pass), so
    reference-parity numerics beat throughput here.
    """
    if vgg_params is None:
        vgg_params = weights_mod.get_vgg_params()
    style = _test_transform(style_img, style_size, crop)[None]
    return style_embedding(vgg_params, style, compute_dtype=compute_dtype)


def adain_inference(
    content_img,
    style_img,
    vgg_str=None,
    decoder_str=None,
    depth_offset: float = 0.5,
    depth_prominence: float = 20.0,
    content_size: int = 512,
    style_size: int = 512,
    alpha: float = 0.5,
    crop: bool = False,
    save_ext: str = ".jpg",
    output: str = "output",
    file_name: str = "test",
    preserve_color: bool = False,
    content_mask=None,
    use_depth: bool = False,
    depth_fn=None,
    compute_dtype=jnp.float32,
) -> Path:
    """Full 2D stylization entry point (parity: reference `test.py:153-247`).

    ``depth_fn(img_hwc_float) -> [H, W] proximity map`` lets callers inject a
    depth estimator; defaults to aip_tpu.models.depthnet.estimate_proximity.
    Returns the saved output path.

    ``compute_dtype`` defaults to float32: this is the reference-parity CLI
    surface (the torch reference computes in fp32; BASELINE.md budgets 1e-3
    mean abs pixel error). Pass ``jnp.bfloat16`` for throughput when serving —
    the batched paths (stylize_batch_with_stats) default to bf16 already.
    """
    vgg_params = weights_mod.get_vgg_params(vgg_str)
    dec_params = weights_mod.get_decoder_params(decoder_str)

    content_np = _to_array(content_img)

    content = _test_transform(content_img, content_size, crop)
    style = _test_transform(style_img, style_size, crop)
    if preserve_color:
        style = coral(style, content)
    content_b = content[None]
    style_b = style[None]

    if use_depth:
        if depth_fn is None:
            from aip_tpu.models.depthnet import estimate_proximity

            depth_fn = estimate_proximity
        depth_map = jnp.asarray(depth_fn(content_np))
        out = stylize_depth(
            vgg_params, dec_params, content_b, style_b, depth_map,
            offset=float(depth_offset), prominence=float(depth_prominence),
            compute_dtype=compute_dtype,
        )
    else:
        out = stylize_simple(vgg_params, dec_params, content_b, style_b,
                             alpha=float(alpha), compute_dtype=compute_dtype)

    if content_mask is not None:
        # Reference test.py:222-236 — nearest-resized binary mask composite.
        mask_np = np.asarray(content_mask, dtype=np.float32)
        if mask_np.ndim == 3 and mask_np.shape[0] == 1 and mask_np.shape[-1] != 1:
            mask_np = np.moveaxis(mask_np, 0, -1)  # reference passes [1, H, W]
        if mask_np.ndim == 2:
            mask_np = mask_np[:, :, None]
        mask = jnp.asarray(mask_np)
        target_hw = (content_b.shape[1], content_b.shape[2])
        mask = resize_nearest(mask[None], target_hw)
        out = resize_bilinear(out, target_hw)
        out = content_b * (1.0 - mask) + out * mask

    output_path = Path(output) / f"{file_name}{save_ext}"
    save_image(out, output_path)
    return output_path

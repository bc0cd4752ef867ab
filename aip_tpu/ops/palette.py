"""Palette quantization kernels for the pixel-art pipeline.

Parity targets in `gui/second_page.py`:
* `_recolor_image` (:208-217) — nearest palette color by RGB distance.
  NOTE: the reference subtracts two uint8 arrays, which wraps around; we
  compute true distances (matching its kd-tree variant `:220-240`, which is
  overflow-free — the two reference methods disagree only because of that
  overflow bug).
* `_recolor_image_LAB` (:242-264) — nearest by CIELAB distance (OpenCV 8-bit
  LAB convention).
* `_recolor_image_floyd` (:266-298) — serial Floyd-Steinberg error diffusion
  (7/16, 3/16, 5/16, 1/16) with nearest-RGB quantization.
* `_adjust_brightness_and_contrast` (:199-206) — additive brightness + tan
  contrast curve.

TPU design: nearest-color search over a P-color palette is one [HW, P]
distance matmul + argmin (P <= 1024 for Lospec palettes — rides the MXU).
Floyd-Steinberg is inherently serial; it is expressed as a `lax.scan` over
rows with an inner scan over columns (SURVEY.md §7.v) — small images only.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def adjust_brightness_contrast(img01: jax.Array, brightness: float, contrast: float) -> jax.Array:
    """second_page.py:199-206 parity; img in [0,1]."""
    x = img01.astype(jnp.float32)
    if brightness != 0:
        x = x + brightness
    if contrast != 0:
        factor = float(np.tan((0.5 + contrast) * np.pi / 4))
        x = (x - 0.5) * factor + 0.5
    return jnp.clip(x, 0.0, 1.0)


def _nearest_indices(pixels: jax.Array, palette: jax.Array) -> jax.Array:
    """[N, 3] x [P, 3] -> [N] argmin of squared distance (matmul form)."""
    p2 = jnp.sum(palette * palette, axis=-1)
    cross = pixels @ palette.T
    d2 = p2[None, :] - 2.0 * cross  # |x|^2 constant per-row, omitted
    return jnp.argmin(d2, axis=-1)


@jax.jit
def recolor_rgb(img_u8: jax.Array, palette_u8: jax.Array) -> jax.Array:
    """Nearest palette color in RGB. [H, W, 3] uint8 + [P, 3] uint8."""
    h, w, _ = img_u8.shape
    px = img_u8.reshape(-1, 3).astype(jnp.float32)
    pal = palette_u8.astype(jnp.float32)
    idx = _nearest_indices(px, pal)
    return palette_u8[idx].reshape(h, w, 3)


# OpenCV 8-bit CIELAB conversion (D65), for _recolor_image_LAB parity.

def _srgb_to_xyz(rgb01: jax.Array) -> jax.Array:
    r = rgb01
    lin = jnp.where(r > 0.04045, ((r + 0.055) / 1.055) ** 2.4, r / 12.92)
    m = jnp.asarray(
        [[0.412453, 0.357580, 0.180423],
         [0.212671, 0.715160, 0.072169],
         [0.019334, 0.119193, 0.950227]], jnp.float32)
    return lin @ m.T


def rgb_to_cielab_u8(rgb_u8: jax.Array) -> jax.Array:
    """uint8 RGB -> OpenCV-convention 8-bit CIELAB (L*255/100, a+128, b+128)."""
    xyz = _srgb_to_xyz(rgb_u8.astype(jnp.float32) / 255.0)
    xn = jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    t = xyz / xn
    f = jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = jnp.where(t[..., 1] > 0.008856, 116.0 * fy - 16.0, 903.3 * t[..., 1])
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    return jnp.stack([L * 255.0 / 100.0, a, b], axis=-1)


@jax.jit
def recolor_lab(img_u8: jax.Array, palette_u8: jax.Array) -> jax.Array:
    """Nearest palette color by CIELAB distance (second_page.py:242-264)."""
    h, w, _ = img_u8.shape
    img_lab = rgb_to_cielab_u8(img_u8).reshape(-1, 3)
    pal_lab = rgb_to_cielab_u8(palette_u8)
    idx = _nearest_indices(img_lab, pal_lab)
    return palette_u8[idx].reshape(h, w, 3)


@jax.jit
def floyd_steinberg(img_u8: jax.Array, palette_u8: jax.Array) -> jax.Array:
    """Floyd-Steinberg dithering to a palette (second_page.py:266-298).

    Serial error diffusion expressed as nested lax.scan: rows outer, columns
    inner; the carry holds the current row (with left-to-right error) and the
    next row's accumulated error.
    """
    h, w, _ = img_u8.shape
    pal = palette_u8.astype(jnp.float32)

    def nearest(px):
        d2 = jnp.sum((pal - px[None, :]) ** 2, axis=-1)
        return pal[jnp.argmin(d2)]

    def row_step(carry, row_pixels):
        err_from_above = carry  # [W, 3]
        row = row_pixels.astype(jnp.float32) + err_from_above

        def col_step(c, x):
            row_cur, err_next = c
            px = row_cur[x]
            new = nearest(px)
            err = px - new
            row_cur = row_cur.at[x].set(new)
            row_cur = row_cur.at[jnp.minimum(x + 1, w - 1)].add(
                jnp.where(x + 1 < w, err * (7.0 / 16.0), 0.0))
            err_next = err_next.at[jnp.maximum(x - 1, 0)].add(
                jnp.where(x > 0, err * (3.0 / 16.0), 0.0))
            err_next = err_next.at[x].add(err * (5.0 / 16.0))
            err_next = err_next.at[jnp.minimum(x + 1, w - 1)].add(
                jnp.where(x + 1 < w, err * (1.0 / 16.0), 0.0))
            return (row_cur, err_next), None

        (row_out, err_next), _ = jax.lax.scan(
            col_step, (row, jnp.zeros((w, 3), jnp.float32)), jnp.arange(w))
        return err_next, row_out

    _, rows = jax.lax.scan(row_step, jnp.zeros((w, 3), jnp.float32),
                           img_u8.astype(jnp.float32))
    return jnp.clip(rows, 0, 255).astype(jnp.uint8)

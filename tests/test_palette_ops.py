"""Palette quantization kernels vs numpy/cv2/scipy oracles.

Golden-artifact note: the reference's committed palette-quantization
README images (`assets/readme/pixel_art/{orig,conv,conv_1,conv_11}.png`)
were evaluated as regression goldens and found non-reproducible: the
palette is recoverable (conv.png's dominant colors are exactly Lospec
"borkfest"), but orig.png (672x637) and conv.png (672x641) differ in
size (post-hoc crops/resizes), the run's downsample/brightness/contrast
settings are unrecorded (a parameter sweep peaks at ~41% pixel
agreement), and the reference's RGB recolor itself computes distances on
uint8-WRAPAROUND differences (`gui/second_page.py:208-217` subtracts
uint8 arrays), so no well-defined mapping reproduces it. Kernel parity
is therefore pinned against code-behavior oracles below, and the
committed-artifact regression lives in test_pixel_art.py's depixelize
golden, where the reference pipeline is deterministic."""

import numpy as np
import jax.numpy as jnp

from aip_tpu.ops.palette import (
    recolor_rgb,
    recolor_lab,
    rgb_to_cielab_u8,
    floyd_steinberg,
    adjust_brightness_contrast,
)


def _palette(rng, p=16):
    return rng.integers(0, 256, (p, 3)).astype(np.uint8)


def test_recolor_rgb_matches_kdtree(rng):
    """Oracle: scipy KDTree (the reference's overflow-free variant,
    second_page.py:220-240)."""
    from scipy.spatial import KDTree

    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    pal = _palette(rng)
    ours = np.asarray(recolor_rgb(jnp.asarray(img), jnp.asarray(pal)))
    tree = KDTree(pal.astype(np.float64))
    d, idx = tree.query(img.reshape(-1, 3).astype(np.float64))
    expect = pal[idx].reshape(img.shape)
    # Ties can be broken differently; check distances are equal instead.
    do = np.linalg.norm(ours.reshape(-1, 3).astype(float) - img.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(do, d, rtol=1e-6)


def test_rgb_to_cielab_matches_cv2(rng):
    import cv2

    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LAB).astype(np.float32)
    ours = np.asarray(rgb_to_cielab_u8(jnp.asarray(img)))
    # cv2 quantizes to uint8; allow 1.5 units.
    np.testing.assert_allclose(ours, ref, atol=1.5)


def test_recolor_lab_picks_palette_colors(rng):
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    pal = _palette(rng, 8)
    out = np.asarray(recolor_lab(jnp.asarray(img), jnp.asarray(pal)))
    pal_set = {tuple(c) for c in pal}
    assert all(tuple(px) in pal_set for px in out.reshape(-1, 3))


def test_floyd_steinberg_matches_serial_oracle(rng):
    img = rng.integers(0, 256, (8, 10, 3)).astype(np.uint8)
    pal = _palette(rng, 4)

    # Independent serial oracle (second_page.py:266-298 semantics).
    arr = img.astype(np.float32)
    h, w, _ = arr.shape
    for y in range(h):
        for x in range(w):
            orig = arr[y, x].copy()
            d = np.linalg.norm(pal.astype(np.float32) - orig, axis=1)
            new = pal[np.argmin(d)].astype(np.float32)
            arr[y, x] = new
            err = orig - new
            if x < w - 1:
                arr[y, x + 1] += err * (7 / 16)
            if y < h - 1 and x > 0:
                arr[y + 1, x - 1] += err * (3 / 16)
            if y < h - 1:
                arr[y + 1, x] += err * (5 / 16)
            if y < h - 1 and x < w - 1:
                arr[y + 1, x + 1] += err * (1 / 16)
    expect = np.clip(arr, 0, 255).astype(np.uint8)

    ours = np.asarray(floyd_steinberg(jnp.asarray(img), jnp.asarray(pal)))
    np.testing.assert_array_equal(ours, expect)


def test_brightness_contrast_matches_reference_math(rng):
    img = rng.random((6, 6, 3)).astype(np.float32)
    b, c = 0.1, 0.3
    out = np.asarray(adjust_brightness_contrast(jnp.asarray(img), b, c))
    factor = np.tan((0.5 + c) * np.pi / 4)
    expect = np.clip(((img + b) - 0.5) * factor + 0.5, 0, 1)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)

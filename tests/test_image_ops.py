"""Resize / pad / pool semantics vs torch-CPU oracles."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from aip_tpu.ops.image import (
    resize_bilinear,
    resize_bicubic,
    resize_nearest,
    upsample_nearest_2x,
    reflection_pad_2d,
    max_pool_2x2_ceil,
    center_crop,
)


def _t(x_nhwc):
    return torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)


def _n(x_torch):
    return x_torch.permute(0, 2, 3, 1).numpy()


def test_bilinear_matches_torch(rng):
    x = rng.random((2, 13, 17, 3)).astype(np.float32)
    for size in [(7, 9), (26, 34), (13, 17)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        ref = _n(F.interpolate(_t(x), size=size, mode="bilinear", align_corners=False))
        np.testing.assert_allclose(ours, ref, atol=2e-5, err_msg=f"size={size}")


def test_bicubic_matches_torch(rng):
    x = rng.random((1, 16, 20, 3)).astype(np.float32)
    for size in [(8, 10), (32, 40), (11, 23)]:
        ours = np.asarray(resize_bicubic(jnp.asarray(x), size))
        ref = _n(F.interpolate(_t(x), size=size, mode="bicubic", align_corners=False))
        np.testing.assert_allclose(ours, ref, atol=5e-5, err_msg=f"size={size}")


def test_nearest_matches_torch_legacy(rng):
    x = rng.random((1, 10, 12, 2)).astype(np.float32)
    for size in [(5, 6), (20, 24), (7, 30)]:
        ours = np.asarray(resize_nearest(jnp.asarray(x), size))
        ref = _n(F.interpolate(_t(x), size=size, mode="nearest"))
        np.testing.assert_array_equal(ours, ref, err_msg=f"size={size}")


def test_upsample_2x_matches_torch(rng):
    x = rng.random((2, 5, 7, 4)).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    ref = _n(F.interpolate(_t(x), scale_factor=2, mode="nearest"))
    np.testing.assert_array_equal(ours, ref)


def test_reflection_pad_matches_torch(rng):
    x = rng.random((1, 6, 8, 3)).astype(np.float32)
    ours = np.asarray(reflection_pad_2d(jnp.asarray(x), 1))
    ref = _n(F.pad(_t(x), (1, 1, 1, 1), mode="reflect"))
    np.testing.assert_array_equal(ours, ref)


def test_maxpool_ceil_matches_torch(rng):
    for h, w in [(8, 8), (7, 9), (5, 5)]:
        x = rng.random((1, h, w, 2)).astype(np.float32)
        ours = np.asarray(max_pool_2x2_ceil(jnp.asarray(x)))
        ref = _n(F.max_pool2d(_t(x), 2, 2, ceil_mode=True))
        np.testing.assert_array_equal(ours, ref, err_msg=f"hw={h}x{w}")


def test_center_crop():
    x = np.arange(7 * 9 * 1, dtype=np.float32).reshape(1, 7, 9, 1)
    out = np.asarray(center_crop(jnp.asarray(x), 5))
    assert out.shape == (1, 5, 5, 1)
    np.testing.assert_array_equal(out, x[:, 1:6, 2:7, :])

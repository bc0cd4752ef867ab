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


def test_reflect_conv3x3_matches_pad_conv(rng):
    """Fused zero-pad-SAME + border-fixup conv == explicit reflection pad +
    VALID conv (values AND gradients) — the serving graph's HBM lever."""
    import jax
    from aip_tpu.ops.image import reflect_conv3x3

    for h, w in [(8, 10), (5, 5), (2, 3), (16, 7)]:
        x = jnp.asarray(rng.random((2, h, w, 5)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 5, 4)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(4).astype(np.float32))

        def ref_fn(x_, k_, b_):
            import jax.lax as lax
            xp = reflection_pad_2d(x_, 1)
            return lax.conv_general_dilated(
                xp, k_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_

        ours = np.asarray(reflect_conv3x3(x, k, b))
        ref = np.asarray(ref_fn(x, k, b))
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"hw={h}x{w}")

        # Gradients: the fused path is used inside training losses too.
        g = jnp.asarray(rng.random(ref.shape).astype(np.float32))
        gx_o, gk_o, gb_o = jax.grad(
            lambda *a: jnp.vdot(reflect_conv3x3(*a), g), argnums=(0, 1, 2)
        )(x, k, b)
        gx_r, gk_r, gb_r = jax.grad(
            lambda *a: jnp.vdot(ref_fn(*a), g), argnums=(0, 1, 2)
        )(x, k, b)
        np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                                   atol=1e-4, err_msg=f"gx hw={h}x{w}")
        np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_r),
                                   atol=1e-4, err_msg=f"gk hw={h}x{w}")
        np.testing.assert_allclose(np.asarray(gb_o), np.asarray(gb_r),
                                   atol=1e-4, err_msg=f"gb hw={h}x{w}")


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

"""Optical flow / warp tests."""

import numpy as np
import jax.numpy as jnp

from aip_tpu.ops.flow import estimate_flow, warp_image, blend_images, rgb_to_gray


def _shifted_pair(rng, dx, dy, size=64):
    base = rng.random((size + 16, size + 16, 3)).astype(np.float32)
    # Smooth it so LK has gradients to work with.
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, sigma=(3, 3, 0))
    f1 = base[8 : 8 + size, 8 : 8 + size]
    f2 = base[8 - dy : 8 - dy + size, 8 - dx : 8 - dx + size]
    return f1, f2


def test_flow_recovers_uniform_shift(rng):
    dx, dy = 3, 2
    f1, f2 = _shifted_pair(rng, dx, dy)
    flow = np.asarray(estimate_flow(jnp.asarray(f1), jnp.asarray(f2)))
    # Check interior (borders are unreliable).
    inner = flow[16:-16, 16:-16]
    assert abs(inner[..., 0].mean() - dx) < 0.5, inner[..., 0].mean()
    assert abs(inner[..., 1].mean() - dy) < 0.5, inner[..., 1].mean()


def test_warp_with_true_flow_reconstructs(rng):
    dx, dy = 3, 2
    f1, f2 = _shifted_pair(rng, dx, dy)
    flow = np.zeros((*f1.shape[:2], 2), np.float32)
    flow[..., 0] = dx
    flow[..., 1] = dy
    # Backward warp of f2 by the forward flow recovers f1.
    warped = np.asarray(warp_image(jnp.asarray(f2), jnp.asarray(flow)))
    err = np.abs(warped[8:-8, 8:-8] - f1[8:-8, 8:-8]).mean()
    assert err < 1e-3, err


def test_warp_zero_flow_is_identity(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    flow = np.zeros((16, 16, 2), np.float32)
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_blend_matches_reference_math(rng):
    a = rng.random((8, 8, 3)).astype(np.float32)
    b = rng.random((8, 8, 3)).astype(np.float32)
    out = np.asarray(blend_images(jnp.asarray(a), jnp.asarray(b), 0.7))
    np.testing.assert_allclose(out, np.clip(0.7 * a + 0.3 * b, 0, 1), rtol=1e-6)


def test_gray_matches_cv2(rng):
    import cv2

    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ours = np.asarray(rgb_to_gray(jnp.asarray(img).astype(jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1.0)

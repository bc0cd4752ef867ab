"""Image quality metrics: MSE / PSNR / SSIM / L1.

Parity targets:
* `Style_3DGS/utils/image_utils.py:14-19` (mse, psnr — per-image mean over
  flattened pixels),
* `Style_3DGS/utils/loss_utils.py:17-63` (l1_loss, l2_loss, ssim with an 11x11
  Gaussian window, sigma=1.5, zero-padded depthwise conv, C1=0.01^2,
  C2=0.03^2).

All ops take NHWC float arrays in [0, 1] and are jittable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean((x - y) ** 2)


def mse(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image MSE: [N, H, W, C] -> [N, 1]."""
    n = img1.shape[0]
    d = (img1 - img2).reshape(n, -1)
    return jnp.mean(d**2, axis=1, keepdims=True)


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image PSNR (data range 1.0): [N, H, W, C] -> [N, 1]."""
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return (w2d / w2d.sum()).astype(np.float32)


def _depthwise_filter(x: jax.Array, window: jax.Array) -> jax.Array:
    """Zero-padded depthwise 2D filter on NHWC.

    precision=HIGHEST is load-bearing: TPU fp32 convs default to
    low-precision MXU passes, and SSIM's variance terms are the
    catastrophically-cancelling E[x^2] - E[x]^2 — under bf16 filtering
    the per-view SSIM leaves [-1, 1] entirely (observed -1.4..8.1 on
    800^2 renders) and the D-SSIM training-loss gradient turns to noise.
    """
    c = x.shape[-1]
    k = window.shape[0]
    w = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over the batch, 3DGS-style (zero padding at borders)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)

    mu1 = _depthwise_filter(x, win)
    mu2 = _depthwise_filter(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(x * x, win) - mu1_sq
    sigma2_sq = _depthwise_filter(y * y, win) - mu2_sq
    sigma12 = _depthwise_filter(x * y, win) - mu12

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)

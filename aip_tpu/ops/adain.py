"""Adaptive instance normalization and CORAL color transfer.

Behavioral parity with the reference's AdaIN math
(`Style_3DGS/AdaIN/function.py:4-23` calc_mean_std/adaptive_instance_normalization,
`:26-67` coral), re-designed for TPU:

* NHWC layout (channel-last is the TPU-native layout; C rides the 128-wide
  lane dimension so per-channel stats are lane-parallel reductions).
* Stats are computed in float32 even when features are bfloat16 — variance of
  bf16 activations underflows badly otherwise.
* Everything is shape-static and fuses into the surrounding XLA graph
  (encode -> stats -> renorm -> blend -> decode compiles to one program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_mean_std(feat: jax.Array, eps: float = 1e-5):
    """Per-(batch, channel) spatial mean and std of an NHWC feature map.

    Matches reference `function.py:4-13`: variance is the *unbiased* sample
    variance over the spatial extent (torch ``.var(dim=2)`` default
    ``unbiased=True``), with ``eps`` added before the sqrt.

    Returns ``(mean, std)`` each of shape ``[N, 1, 1, C]`` in float32.
    """
    n, h, w, c = feat.shape
    x = feat.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    # Unbiased variance: sum of squared deviations / (HW - 1).
    m = h * w
    var = jnp.sum((x - mean) ** 2, axis=(1, 2), keepdims=True) / max(m - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean, std


def adain(content_feat: jax.Array, style_feat: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Adaptive instance normalization (reference `function.py:15-23`).

    Normalizes content features to zero-mean/unit-std per channel, then
    rescales with the style features' per-channel statistics. NHWC.
    """
    c_mean, c_std = calc_mean_std(content_feat, eps)
    s_mean, s_std = calc_mean_std(style_feat, eps)
    x = content_feat.astype(jnp.float32)
    out = (x - c_mean) / c_std * s_std + s_mean
    return out.astype(content_feat.dtype)


def _mat_sqrt(x: jax.Array) -> jax.Array:
    """Symmetric-PSD matrix square root via SVD (reference `function.py:36-38`)."""
    u, s, vt = jnp.linalg.svd(x)
    return (u * jnp.sqrt(s)[None, :]) @ vt


def coral(source: jax.Array, target: jax.Array) -> jax.Array:
    """CORAL color transfer: match source image's channel covariance to target.

    Parity with reference `function.py:41-67`. ``source``/``target`` are HWC
    RGB images (any float dtype); returns source recolored with target's
    channel statistics/covariance. Host-or-device; small 3x3 linear algebra.
    """
    def flat_stats(img):
        f = img.astype(jnp.float32).reshape(-1, 3).T  # [3, HW]
        mean = jnp.mean(f, axis=1, keepdims=True)
        # torch .std() default is unbiased.
        n = f.shape[1]
        std = jnp.sqrt(jnp.sum((f - mean) ** 2, axis=1, keepdims=True) / max(n - 1, 1))
        return f, mean, std

    src_f, src_mean, src_std = flat_stats(source)
    tgt_f, tgt_mean, tgt_std = flat_stats(target)

    src_norm = (src_f - src_mean) / src_std
    tgt_norm = (tgt_f - tgt_mean) / tgt_std

    src_cov = src_norm @ src_norm.T + jnp.eye(3, dtype=jnp.float32)
    tgt_cov = tgt_norm @ tgt_norm.T + jnp.eye(3, dtype=jnp.float32)

    transfer = _mat_sqrt(tgt_cov) @ (jnp.linalg.inv(_mat_sqrt(src_cov)) @ src_norm)
    out = transfer * tgt_std + tgt_mean
    return out.T.reshape(source.shape).astype(source.dtype)


def style_loss_terms(input_feat: jax.Array, target_feat: jax.Array, eps: float = 1e-5):
    """MSE between per-channel (mean, std) of two NHWC feature maps.

    Parity with reference `net.py:131-137` calc_style_loss.
    """
    i_mean, i_std = calc_mean_std(input_feat, eps)
    t_mean, t_std = calc_mean_std(target_feat, eps)
    return jnp.mean((i_mean - t_mean) ** 2) + jnp.mean((i_std - t_std) ** 2)

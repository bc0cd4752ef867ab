"""Foreground/background segmentation for regional style transfer.

The reference uses torchvision's pretrained DeepLabV3-ResNet101 and takes
"background" = P(class 0) > 0.5 (`localized_style_transfer.py:171-188`).
Those weights can't ship here, so this module mirrors the depthnet pattern:

* ``extract_background_mask`` — default classical estimator: border-seeded
  color model. Border pixels are presumed background; each pixel's
  background probability falls with Mahalanobis distance to the border color
  distribution, smoothed. Fully jittable.
* ``register_segmenter`` — hook for a learned model (same contract: returns
  a [H, W] {0,1} background mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_REGISTERED = None


def register_segmenter(fn) -> None:
    """fn(img_hwc_float01) -> [H, W] background mask in {0,1}."""
    global _REGISTERED
    _REGISTERED = fn


@functools.partial(jax.jit, static_argnames=("threshold",))
def _border_color_background(img: jax.Array, threshold: float = 0.5) -> jax.Array:
    h, w, _ = img.shape
    bw = max(2, min(h, w) // 16)

    mask = jnp.zeros((h, w), jnp.float32)
    mask = mask.at[:bw, :].set(1.0).at[-bw:, :].set(1.0)
    mask = mask.at[:, :bw].set(1.0).at[:, -bw:].set(1.0)

    flat = img.reshape(-1, 3).astype(jnp.float32)
    wgt = mask.reshape(-1)
    n = jnp.sum(wgt)
    mean = jnp.sum(flat * wgt[:, None], axis=0) / n
    xc = (flat - mean) * wgt[:, None]
    cov = (xc.T @ xc) / n + 1e-4 * jnp.eye(3)
    prec = jnp.linalg.inv(cov)

    d = flat - mean
    maha = jnp.einsum("ni,ij,nj->n", d, prec, d)
    bg_prob = jnp.exp(-0.5 * maha / 4.0).reshape(h, w)
    return (bg_prob > threshold).astype(jnp.uint8)


def extract_background_mask(img, threshold: float = 0.5) -> jax.Array:
    """img: HWC float [0,1] (or uint8) -> [H, W] uint8 background mask."""
    if _REGISTERED is not None:
        return _REGISTERED(img)
    x = jnp.asarray(img)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    if x.shape[-1] == 4:
        x = x[..., :3]
    return _border_color_background(x, threshold)

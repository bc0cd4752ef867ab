"""Monocular proximity estimation for depth-aware stylization.

The reference uses MiDaS_small via torch.hub (`AdaIN/test.py:84-116`), whose
pretrained weights cannot be redistributed here. This module provides:

* ``estimate_proximity`` — a classical, fully-JAX fallback estimator that
  produces a plausible proximity map from monocular cues (sharpness/local
  contrast + a vertical position prior). It feeds the same
  ``compute_stylization_strength_map`` pipeline, so the depth-aware blend
  path is exercised end-to-end and swaps transparently to a learned model.
* ``register_depth_model`` — hook to plug in a learned estimator (e.g. a
  converted MiDaS checkpoint) without touching pipeline code.

The strength-map math downstream only consumes relative ordering after
min-max normalization (`test.py:131-150`), so any monotone proximity proxy
is admissible for the blend semantics.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_REGISTERED = None


def register_depth_model(fn) -> None:
    """Install a learned depth estimator: fn(img_hwc_float01) -> [H, W]."""
    global _REGISTERED
    _REGISTERED = fn


def _box_blur(x: jax.Array, k: int) -> jax.Array:
    """Separable box blur on [H, W] via cumulative sums."""
    pad = k // 2
    y = jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")
    kernel = jnp.ones((k,), jnp.float32) / k
    y = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(y)
    y = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1)(y)
    return y


@functools.partial(jax.jit)
def _proximity_core(img: jax.Array) -> jax.Array:
    lum = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    h, w = lum.shape

    # Sharpness cue: local gradient energy, smoothed. In-focus foreground
    # regions score high.
    gx = jnp.diff(lum, axis=1, append=lum[:, -1:])
    gy = jnp.diff(lum, axis=0, append=lum[-1:, :])
    grad = jnp.sqrt(gx * gx + gy * gy)
    sharp = _box_blur(grad, max(3, min(h, w) // 16 * 2 + 1))
    sharp = (sharp - sharp.min()) / (sharp.max() - sharp.min() + 1e-8)

    # Vertical prior: ground-plane scenes put near content low in frame.
    rows = jnp.linspace(0.0, 1.0, h)[:, None]
    vert = jnp.broadcast_to(rows, (h, w))

    return 0.6 * sharp + 0.4 * vert


def estimate_proximity(img) -> jax.Array:
    """img: HWC float [0,1] (or uint8) -> [H, W] proximity map (big = close)."""
    if _REGISTERED is not None:
        return _REGISTERED(img)
    x = jnp.asarray(img)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    if x.ndim == 2:
        x = jnp.stack([x] * 3, axis=-1)
    if x.shape[-1] == 4:
        x = x[..., :3]
    return _proximity_core(x.astype(jnp.float32))

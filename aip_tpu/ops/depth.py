"""Depth-aware stylization strength map.

Parity with reference `Style_3DGS/AdaIN/test.py:119-150`
``compute_stylization_strength_map``: resize the proximity map (MiDaS output
is already proximity) to the encoder feature size with bicubic, min-max
normalize, mean-center, sigmoid with a prominence gain, clamp at
``1 - offset``. Fully jittable; fuses into the stylization graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aip_tpu.ops.image import resize_bicubic


def compute_stylization_strength_map(
    depth_map: jax.Array,
    encoder_size: tuple[int, int],
    offset: float = 0.15,
    prominence: float = 20.0,
) -> jax.Array:
    """depth_map: [H, W] proximity map. Returns [h, w] map P in [0, 1-offset].

    Where the map is constant, returns zeros (reference `test.py:139-143`).
    """
    hc, wc = encoder_size
    p = resize_bicubic(depth_map[:, :, None].astype(jnp.float32), (hc, wc))[:, :, 0]

    mn = jnp.min(p)
    mx = jnp.max(p)
    denom = jnp.where(mx > mn, mx - mn, 1.0)
    norm = (p - mn) / denom
    norm = norm - jnp.mean(norm)
    s = jax.nn.sigmoid(prominence * norm)
    s = jnp.minimum(s, 1.0 - offset)
    return jnp.where(mx > mn, s, jnp.zeros_like(s))

"""Gram matrices for optimization-based neural style transfer.

Parity with `mixing_texture_gyum/style_mixer.py:4-10` and
`spatial_variation/StyleTransfer.py:39-43`: G = F F^T / (C*H*W) for a
[B, C, HW] flattening. NHWC here; the contraction is a single MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(feat: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, C, C] normalized Gram matrix."""
    n, h, w, c = feat.shape
    x = feat.reshape(n, h * w, c).astype(jnp.float32)
    g = jnp.einsum("npc,npd->ncd", x, x)
    return g / (c * h * w)

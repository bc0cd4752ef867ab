"""Quaternion / covariance utilities for Gaussian splatting.

Parity with reference `Style_3DGS/utils/general_utils.py:64-110`
(strip_symmetric, build_rotation, build_scaling_rotation) and the covariance
construction in `scene/gaussian_model.py:35-43` (RS (RS)^T). Batched,
jittable, branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_rotation(q: jax.Array) -> jax.Array:
    """[N, 4] (w, x, y, z) quaternions -> [N, 3, 3] rotation matrices.

    Normalizes first (general_utils.py:78-99).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(-1, 3, 3)


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """[N, 3] scales + [N, 4] quats -> L = R @ diag(s), [N, 3, 3]."""
    R = build_rotation(q)
    return R * s[:, None, :]


def covariance_from_scaling_rotation(
    s: jax.Array, q: jax.Array, scaling_modifier: float = 1.0
) -> jax.Array:
    """Per-Gaussian 3D covariance Sigma = L L^T, L = R diag(s·mod). [N, 3, 3]."""
    L = build_scaling_rotation(s * scaling_modifier, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(sym: jax.Array) -> jax.Array:
    """[N, 3, 3] symmetric -> [N, 6] upper-triangular packing
    (general_utils.py:64-77 ordering: 00, 01, 02, 11, 12, 22)."""
    return jnp.stack(
        [sym[:, 0, 0], sym[:, 0, 1], sym[:, 0, 2], sym[:, 1, 1], sym[:, 1, 2], sym[:, 2, 2]],
        axis=-1,
    )


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    """general_utils.py:18."""
    return jnp.log(x / (1.0 - x))

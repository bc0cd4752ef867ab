"""Morton (Z-order) encoding for spatial sorting of Gaussians.

Parity with reference `Style_3DGS/utils/general_utils.py:136-150`
(splitBy3/mortonEncode, 21 bits per axis -> 63-bit code) and the sort usage
in `scene/gaussian_model.py:687-699` (quantize positions to 2^21 grid,
sort by code for storage locality / compression).

JAX note: TPUs lack int64 by default; codes are built as two uint32 halves
(interleave produces 63 bits) and sorted lexicographically via a single
stable double-key sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _split_by_3_u64(a: np.ndarray) -> np.ndarray:
    x = a.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | x << np.uint64(32)) & np.uint64(0x1F00000000FFFF)
    x = (x | x << np.uint64(16)) & np.uint64(0x1F0000FF0000FF)
    x = (x | x << np.uint64(8)) & np.uint64(0x100F00F00F00F00F)
    x = (x | x << np.uint64(4)) & np.uint64(0x10C30C30C30C30C3)
    x = (x | x << np.uint64(2)) & np.uint64(0x1249249249249249)
    return x


def morton_encode_np(pos_int: np.ndarray) -> np.ndarray:
    """[N, 3] integer grid coords (<2^21) -> [N] uint64 Morton codes (host)."""
    x, y, z = pos_int[:, 0], pos_int[:, 1], pos_int[:, 2]
    return _split_by_3_u64(x) | _split_by_3_u64(y) << np.uint64(1) | _split_by_3_u64(z) << np.uint64(2)


def _split_by_3_jnp(a: jax.Array) -> jax.Array:
    """Interleave 21 bits with 2-bit gaps, as (hi, lo) uint32 pair.

    Works in uint32 lanes: compute the 63-bit pattern via the same shift
    cascade on a float-free uint32 emulation of 64-bit values.
    """
    # Emulate 64-bit via (hi, lo). Implement shifts/masks on the pair.
    lo = a.astype(jnp.uint32)
    hi = jnp.zeros_like(lo)

    def mask64(hi, lo, m_hi, m_lo):
        return hi & jnp.uint32(m_hi), lo & jnp.uint32(m_lo)

    def shl64(hi, lo, s):
        if s == 0:
            return hi, lo
        if s >= 32:
            return (lo << (s - 32)) if s > 32 else lo, jnp.zeros_like(lo)
        return (hi << s) | (lo >> (32 - s)), lo << s

    def or64(a_pair, b_pair):
        return a_pair[0] | b_pair[0], a_pair[1] | b_pair[1]

    hi, lo = mask64(hi, lo, 0x0, 0x1FFFFF)
    for s, (m_hi, m_lo) in (
        (32, (0x001F0000, 0x0000FFFF)),
        (16, (0x001F0000, 0xFF0000FF)),
        (8, (0x100F00F0, 0x0F00F00F)),
        (4, (0x10C30C30, 0xC30C30C3)),
        (2, (0x12492492, 0x49249249)),
    ):
        hi2, lo2 = shl64(hi, lo, s)
        hi, lo = or64((hi, lo), (hi2, lo2))
        hi, lo = mask64(hi, lo, m_hi, m_lo)
    return hi, lo


def morton_encode(pos_int: jax.Array):
    """[N, 3] int grid coords (<2^21) -> ([N] hi, [N] lo) uint32 code halves."""
    xh, xl = _split_by_3_jnp(pos_int[:, 0])
    yh, yl = _split_by_3_jnp(pos_int[:, 1])
    zh, zl = _split_by_3_jnp(pos_int[:, 2])
    # Shifting the (hi, lo) pair left by 1/2 crosses the word boundary:
    def shl_pair(h, l, s):
        return (h << s) | (l >> (32 - s)), l << s

    yh2, yl2 = shl_pair(yh, yl, 1)
    zh2, zl2 = shl_pair(zh, zl, 2)
    hi = xh | yh2 | zh2
    lo = xl | yl2 | zl2
    return hi, lo


def morton_argsort(positions: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Sort order of [N, 3] float positions along the Z-curve.

    Quantizes to a 2^21 grid within [lower, upper] (gaussian_model.py:691-695)
    and returns indices sorting by Morton code (stable two-key sort).
    """
    scale = (2.0**21 - 1.0) / jnp.maximum(upper - lower, 1e-12)
    grid = jnp.clip(((positions - lower) * scale), 0, 2.0**21 - 1).astype(jnp.uint32)
    hi, lo = morton_encode(grid.astype(jnp.int32))
    # Single sortable key in float-free form: lexicographic (hi, lo). Sort by
    # lo first (stable), then by hi (stable) == lexicographic by (hi, lo).
    order1 = jnp.argsort(lo, stable=True)
    order2 = jnp.argsort(hi[order1], stable=True)
    return order1[order2]

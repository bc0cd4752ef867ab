"""Pallas tile-compositing kernel for the Gaussian rasterizer.

The pure-XLA compositing path (aip_tpu.gs.rasterizer.composite_tiles)
materializes [tiles, K, 256] alpha/transmittance tensors in HBM — at 1080p
and K=128 that is ~1 GB of traffic per frame and it renders at <1 FPS. This
kernel instead streams each tile's K candidates through VMEM and walks them
front-to-back with an in-register transmittance carry, so HBM traffic is
just the candidate list in and the tile pixels out.

Grid: one program per tile; the tile origin is derived from
``pl.program_id`` (grid width is a compile-time constant). Per-program
blocks hold the tile's [K, .] candidate attributes; the K-walk is a
`fori_loop` of [TILE, TILE]-shaped VPU ops.

Forward-only: training keeps the autodiff-friendly XLA composite; inference
rendering (the FPS-critical path) calls this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE  # pixels per tile


def _make_kernel(tile_w: int):
    def kernel(mean_ref, conic_ref, color_ref, op_ref, valid_ref, bg_ref, out_ref):
        k = mean_ref.shape[0]
        tile_id = pl.program_id(0)
        x0 = ((tile_id % tile_w) * TILE).astype(jnp.float32)
        y0 = ((tile_id // tile_w) * TILE).astype(jnp.float32)

        # Pixel coordinates for this tile: [TILE, TILE]. (Mosaic iota must
        # be integer-typed; cast after.)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(jnp.float32)
        px = col + x0
        py = row + y0

        def body(i, carry):
            trans, r, g, b = carry  # each [TILE, TILE]
            mx = mean_ref[i, 0]
            my = mean_ref[i, 1]
            ca = conic_ref[i, 0]
            cb = conic_ref[i, 1]
            cc = conic_ref[i, 2]
            dx = px - mx
            dy = py - my
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            power = jnp.minimum(power, 0.0)
            alpha = jnp.minimum(0.99, op_ref[i, 0] * jnp.exp(power))
            alpha = jnp.where(valid_ref[i, 0] > 0, alpha, 0.0)
            alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
            contrib = jnp.where(trans > 1e-4, alpha * trans, 0.0)
            r = r + contrib * color_ref[i, 0]
            g = g + contrib * color_ref[i, 1]
            b = b + contrib * color_ref[i, 2]
            trans = trans * (1.0 - alpha)
            return trans, r, g, b

        zeros = jnp.zeros((TILE, TILE), jnp.float32)
        trans, r, g, b = jax.lax.fori_loop(
            0, k, body, (jnp.ones((TILE, TILE), jnp.float32), zeros, zeros, zeros)
        )
        out_ref[0] = r + trans * bg_ref[0, 0]
        out_ref[1] = g + trans * bg_ref[0, 1]
        out_ref[2] = b + trans * bg_ref[0, 2]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_tiles", "tile_w", "macro",
                                             "macro_tile_w", "interpret"))
def composite_from_macro_pallas(
    g_mean: jax.Array,        # [M, Kc, 2] per-macro-block candidates (depth-sorted)
    g_conic: jax.Array,       # [M, Kc, 3]
    g_color: jax.Array,       # [M, Kc, 3]
    g_op: jax.Array,          # [M, Kc]
    slot_valid: jax.Array,    # [M, Kc]
    bg_color: jax.Array,      # [3]
    n_tiles: int,
    tile_w: int,
    macro: int,
    macro_tile_w: int,
    interpret: bool = False,
) -> jax.Array:
    """Composite each 16px tile directly from its macro block's candidate
    list. Fuses the per-tile refinement INTO the walk: non-overlapping
    candidates self-eliminate via the 1/255 alpha cutoff, so there is no
    per-tile top_k or gather at all. Candidates must be depth-sorted (the
    macro binning emits them that way). Consecutive tiles share a macro
    block, so Pallas re-uses the fetched block across grid steps.
    Returns [n_tiles, 3, TILE, TILE]."""
    _, kc, _ = g_mean.shape
    bg = jnp.broadcast_to(bg_color.astype(jnp.float32)[None, :], (1, 3))

    def macro_of(i):
        return (i // tile_w // macro) * macro_tile_w + (i % tile_w) // macro

    return pl.pallas_call(
        _make_kernel(tile_w),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, kc, 2), lambda i: (macro_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kc, 3), lambda i: (macro_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kc, 3), lambda i: (macro_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kc, 1), lambda i: (macro_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kc, 1), lambda i: (macro_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, TILE, TILE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, TILE, TILE), jnp.float32),
        interpret=interpret,
    )(
        g_mean.astype(jnp.float32),
        g_conic.astype(jnp.float32),
        g_color.astype(jnp.float32),
        g_op.astype(jnp.float32)[:, :, None],
        slot_valid.astype(jnp.float32)[:, :, None],
        bg,
    )


@functools.partial(jax.jit, static_argnames=("tile_w", "interpret"))
def composite_tiles_pallas(
    g_mean: jax.Array,        # [T, K, 2]
    g_conic: jax.Array,       # [T, K, 3]
    g_color: jax.Array,       # [T, K, 3]
    g_op: jax.Array,          # [T, K]
    slot_valid: jax.Array,    # [T, K] (bool/int)
    bg_color: jax.Array,      # [3]
    tile_w: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns [T, 3, TILE, TILE] composited tile pixels."""
    t, k, _ = g_mean.shape
    bg = jnp.broadcast_to(bg_color.astype(jnp.float32)[None, :], (1, 3))

    return pl.pallas_call(
        _make_kernel(tile_w),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((None, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, TILE, TILE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 3, TILE, TILE), jnp.float32),
        interpret=interpret,
    )(
        g_mean.astype(jnp.float32),
        g_conic.astype(jnp.float32),
        g_color.astype(jnp.float32),
        g_op.astype(jnp.float32)[:, :, None],
        slot_valid.astype(jnp.float32)[:, :, None],
        bg,
    )

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


def _tri_prefix_dot(tri, logt):
    """tri [G, G] @ logt [G, P] at ~f32 accuracy in 3 MXU passes.

    The strict-lower-triangular operand is all 0/1 — EXACT in bf16 — so
    only logt needs splitting: three DEFAULT-precision passes over the
    bf16 high/mid/low residues recover ~24 mantissa bits, where
    Precision.HIGHEST would spend 6 passes splitting both operands (and
    Mosaic does not lower Precision.HIGH at all). This dot is ~85% of the
    composite kernel's MXU work; the prefix is a same-sign sum of <= G
    log1p terms in [-4.6, 0], no cancellation."""
    def one(x):
        return jax.lax.dot_general(
            tri, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    hi = logt.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = logt - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    return one(hi) + one(mid) + one(lo)


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


def _make_block_kernel(bs: int, group: int):
    """Kernel for one (bs x bs)-pixel macro block: walk the block's
    candidates front-to-back on a [bs*bs/128, 128] full-lane pixel layout,
    with group-level early exit once every pixel's transmittance is below
    the 1e-4 CUDA cutoff (and never past the block's valid-candidate
    count). coeff packs the quadratic log-density polynomial
    [c0, cx, cy, cxx, cyy, cxy, opacity, 0]."""
    rows = (bs * bs) // 128

    def kernel(coeff_ref, color_ref, count_ref, bg_ref, out_ref):
        kc = coeff_ref.shape[0]
        count = count_ref[pl.program_id(0)]
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        flat = r * 128 + c
        px = (flat % bs).astype(jnp.float32)
        py = (flat // bs).astype(jnp.float32)
        bxx = px * px
        byy = py * py
        bxy = px * py

        def walk(i, carry):
            trans, red, grn, blu = carry
            power = (coeff_ref[i, 0]
                     + coeff_ref[i, 1] * px + coeff_ref[i, 2] * py
                     + coeff_ref[i, 3] * bxx + coeff_ref[i, 4] * byy
                     + coeff_ref[i, 5] * bxy)
            alpha = jnp.minimum(
                0.99, coeff_ref[i, 6] * jnp.exp(jnp.minimum(power, 0.0)))
            alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
            contrib = jnp.where(trans > 1e-4, alpha * trans, 0.0)
            red = red + contrib * color_ref[i, 0]
            grn = grn + contrib * color_ref[i, 1]
            blu = blu + contrib * color_ref[i, 2]
            return trans * (1.0 - alpha), red, grn, blu

        def group_fn(g, carry):
            trans = carry[0]
            live = (g * group < count) & (jnp.max(trans) > 1e-4)
            return jax.lax.cond(
                live,
                lambda cy: jax.lax.fori_loop(
                    g * group, jnp.minimum((g + 1) * group, count),
                    walk, cy),
                lambda cy: cy,
                carry,
            )

        zeros = jnp.zeros((rows, 128), jnp.float32)
        init = (jnp.ones((rows, 128), jnp.float32), zeros, zeros, zeros)
        trans, red, grn, blu = jax.lax.fori_loop(
            0, (kc + group - 1) // group, group_fn, init)
        out_ref[0] = red + trans * bg_ref[0, 0]
        out_ref[1] = grn + trans * bg_ref[0, 1]
        out_ref[2] = blu + trans * bg_ref[0, 2]

    return kernel


@functools.partial(jax.jit, static_argnames=("bs", "group", "interpret"))
def composite_macro_blocks_pallas(
    coeff: jax.Array,      # [M, Kc, 8] quadratic coeffs + opacity (slot 6)
    colors: jax.Array,     # [M, Kc, 4] rgb + pad
    counts: jax.Array,     # [M] valid candidates per block (prefix of list)
    bg_color: jax.Array,   # [3]
    bs: int,
    group: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Composite whole macro blocks (bs x bs px) from depth-sorted
    candidate lists. Returns [M, 3, bs*bs/128, 128] pixel planes in
    row-major flat order (pixel (y, x) at flat index y*bs + x)."""
    m, kc, _ = coeff.shape
    rows = (bs * bs) // 128
    bg = jnp.broadcast_to(bg_color.astype(jnp.float32)[None, :], (1, 3))

    return pl.pallas_call(
        _make_block_kernel(bs, group),
        grid=(m,),
        in_specs=[
            pl.BlockSpec((None, kc, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kc, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full counts array
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, rows, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 3, rows, 128), jnp.float32),
        interpret=interpret,
    )(
        coeff.astype(jnp.float32),
        colors.astype(jnp.float32),
        counts.astype(jnp.int32),
        bg,
    )


def _make_mxu_kernel(kc: int, p: int, group: int, mtw: int, bs: int):
    """Dense-group MXU composite for one macro block.

    Per group of ``group`` depth-ordered candidates, everything heavy is a
    matmul: the Gaussian log-density (a quadratic in pixel coordinates) is
    ``coeff @ basis`` on the MXU; the exclusive prefix transmittance is a
    strict-lower-triangular matmul over per-candidate log(1-alpha)
    (prefix-scan-as-matmul — no sequential per-candidate chain); the color
    accumulation is a third matmul. The quadratic coefficients are derived
    IN-KERNEL from raw gathered attributes ([Kc, 16] rows: mx, my, conic,
    log-opacity, rgb) as column-wise vector ops in block-LOCAL coordinates
    — one packed XLA gather feeds the kernel instead of four plus host-side
    coefficient math. log(opacity) folds into the constant coefficient so
    alpha = exp(min(power', 0)) with no per-candidate scalars. The group
    loop is bounded by the block's valid-candidate count (valid slots are
    a prefix of the depth-sorted list) and exits early at the 1e-4
    transmittance cutoff, so work tracks actual demand, not capacity."""

    def kernel(raw_ref, count_ref, basis_ref, tri_ref, bg_ref,
               out_ref, tcar_ref, acc_ref):
        b = pl.program_id(0)
        count = count_ref[b]
        bx0 = ((b % mtw) * bs).astype(jnp.float32)
        by0 = ((b // mtw) * bs).astype(jnp.float32)
        tcar_ref[...] = jnp.ones((1, p), jnp.float32)
        acc_ref[...] = jnp.zeros((4, p), jnp.float32)
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)

        def group_fn(g, carry):
            live = (g * group < count) & (jnp.max(tcar_ref[...]) > 1e-4)

            @pl.when(live)
            def _():
                rw = raw_ref[pl.ds(g * group, group), :]   # [G, 16]
                mxl = rw[:, 0:1] - bx0
                myl = rw[:, 1:2] - by0
                ca = rw[:, 2:3]
                cb = rw[:, 3:4]
                cc = rw[:, 4:5]
                slot_live = (g * group + iota_g) < count
                c0 = jnp.where(
                    slot_live,
                    -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
                    + rw[:, 5:6], -1e30)
                zcol = jnp.zeros((group, 1), jnp.float32)
                cf = jnp.concatenate([
                    c0, ca * mxl + cb * myl, cc * myl + cb * mxl,
                    -0.5 * ca, -0.5 * cc, -cb, zcol, zcol], axis=1)
                cl = jnp.concatenate([rw[:, 6:9], zcol], axis=1)

                pw = jax.lax.dot_general(
                    cf, basis_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(pw, 0.0)))
                alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
                logt = jnp.log1p(-alpha)
                pref = _tri_prefix_dot(tri_ref[...], logt)
                trans = jnp.exp(pref) * tcar_ref[...]
                contrib = jnp.where(trans > 1e-4, alpha * trans, 0.0)
                acc_ref[...] += jax.lax.dot_general(
                    cl, contrib, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                tcar_ref[...] = (trans[group - 1:group, :]
                                 * (1.0 - alpha[group - 1:group, :]))
            return carry

        jax.lax.fori_loop(0, (kc + group - 1) // group, group_fn, 0)
        tc = tcar_ref[...]
        out_ref[0] = acc_ref[0:1, :] + tc * bg_ref[0, 0]
        out_ref[1] = acc_ref[1:2, :] + tc * bg_ref[0, 1]
        out_ref[2] = acc_ref[2:3, :] + tc * bg_ref[0, 2]

    return kernel


def _make_mxu_seg_kernel(p: int, group: int, mtw: int, bs: int, gmax: int):
    """Segment-walk variant of _make_mxu_kernel: block b's candidates are
    the CONTIGUOUS rows [starts[b], starts[b]+counts[b]) of a (block,
    depth)-sorted table, DMA'd group-by-group through the grid's second
    dimension via scalar-prefetched starts — the CUDA rasterizer's
    sorted-list + per-tile-range design (diff-gaussian-rasterization's
    identifyTileRanges), with the [M, Kc] slot/attribute gathers gone."""

    def kernel(starts_ref, counts_ref, raw_ref, basis_ref, tri_ref, bg_ref,
               out_ref, tcar_ref, acc_ref):
        b = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            tcar_ref[...] = jnp.ones((1, p), jnp.float32)
            acc_ref[...] = jnp.zeros((4, p), jnp.float32)

        start = starts_ref[b]
        count = counts_ref[b]
        row0 = (start // group + g) * group  # first table row in this block
        live = (row0 < start + count) & (jnp.max(tcar_ref[...]) > 1e-4)
        bx0 = ((b % mtw) * bs).astype(jnp.float32)
        by0 = ((b // mtw) * bs).astype(jnp.float32)
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)

        @pl.when(live)
        def _():
            rw = raw_ref[...]                          # [G, 16]
            mxl = rw[:, 0:1] - bx0
            myl = rw[:, 1:2] - by0
            ca = rw[:, 2:3]
            cb = rw[:, 3:4]
            cc = rw[:, 4:5]
            rows = row0 + iota_g
            slot_live = (rows >= start) & (rows < start + count)
            c0 = jnp.where(
                slot_live,
                -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl
                + rw[:, 5:6], -1e30)
            zcol = jnp.zeros((group, 1), jnp.float32)
            cf = jnp.concatenate([
                c0, ca * mxl + cb * myl, cc * myl + cb * mxl,
                -0.5 * ca, -0.5 * cc, -cb, zcol, zcol], axis=1)
            cl = jnp.concatenate([rw[:, 6:9], zcol], axis=1)

            pw = jax.lax.dot_general(
                cf, basis_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            alpha = jnp.minimum(0.99, jnp.exp(jnp.minimum(pw, 0.0)))
            alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
            logt = jnp.log1p(-alpha)
            pref = _tri_prefix_dot(tri_ref[...], logt)
            trans = jnp.exp(pref) * tcar_ref[...]
            contrib = jnp.where(trans > 1e-4, alpha * trans, 0.0)
            acc_ref[...] += jax.lax.dot_general(
                cl, contrib, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            tcar_ref[...] = (trans[group - 1:group, :]
                             * (1.0 - alpha[group - 1:group, :]))

        @pl.when(g == gmax - 1)
        def _():
            tc = tcar_ref[...]
            out_ref[0] = acc_ref[0:1, :] + tc * bg_ref[0, 0]
            out_ref[1] = acc_ref[1:2, :] + tc * bg_ref[0, 1]
            out_ref[2] = acc_ref[2:3, :] + tc * bg_ref[0, 2]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_blocks", "kc", "bs", "mtw",
                                             "group", "interpret"))
def composite_macro_mxu_seg_pallas(
    raw_sorted: jax.Array,  # [S, 16] table rows in (block, depth) sort order
    starts: jax.Array,      # [M] first row of each block's segment
    counts: jax.Array,      # [M] segment length (pre-clipped to kc)
    bg_color: jax.Array,    # [3]
    n_blocks: int,
    kc: int,
    bs: int,
    mtw: int,
    group: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Dense-group MXU composite over contiguous sorted segments (see
    _make_mxu_seg_kernel). Returns [M, 3, 1, bs*bs] flat pixel planes."""
    import numpy as np

    s = raw_sorted.shape[0]
    p = bs * bs
    # One extra group covers segments that start mid-group.
    gmax = (kc + group - 1) // group + 1
    pad_rows = ((s + group - 1) // group + gmax) * group - s
    raw_sorted = jnp.pad(raw_sorted, ((0, pad_rows), (0, 0)))
    bg = jnp.broadcast_to(bg_color.astype(jnp.float32)[None, :], (1, 3))

    yy = np.arange(bs, dtype=np.float32)
    py, px = np.meshgrid(yy, yy, indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)
    basis = jnp.asarray(np.stack([
        np.ones_like(px), px, py, px * px, py * py, px * py,
        np.zeros_like(px), np.zeros_like(px)]).astype(np.float32))
    tri = jnp.asarray(np.tril(np.ones((group, group), np.float32), -1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks, gmax),
        in_specs=[
            pl.BlockSpec((group, 16),
                         lambda b, g, st, ct: (st[b] // group + g, 0)),
            pl.BlockSpec((8, p), lambda b, g, st, ct: (0, 0)),
            pl.BlockSpec((group, group), lambda b, g, st, ct: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, 1, p),
                               lambda b, g, st, ct: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((4, p), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_mxu_seg_kernel(p, group, mtw, bs, gmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 3, 1, p), jnp.float32),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        counts.astype(jnp.int32),
        raw_sorted.astype(jnp.float32),
        basis,
        tri,
        bg,
    )


@functools.partial(jax.jit, static_argnames=("bs", "mtw", "group",
                                             "interpret"))
def composite_macro_mxu_pallas(
    raw: jax.Array,        # [M, Kc, 16] gathered rows: mx, my, ca, cb, cc,
                           # log(opacity), r, g, b, pad...
    counts: jax.Array,     # [M] valid candidates per block (list prefix)
    bg_color: jax.Array,   # [3]
    bs: int,
    mtw: int,
    group: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Dense-group MXU macro-block composite. Returns [M, 3, 1, bs*bs]
    flat pixel planes (pixel (y, x) of block m at [m, c, 0, y*bs + x])."""
    import numpy as np

    m, kc, _ = raw.shape
    # The kernel reads [Kc, 16] in pl.ds(g*group, group) strips; a Kc that
    # is not a group multiple would let the last strip overrun the block
    # and misalign rows against the slot_live mask. Pad the candidate dim
    # up to the next group multiple (padded rows sit past `counts`, so the
    # early-exit/slot mask never composites them).
    if kc % group:
        pad_k = (-kc) % group
        raw = jnp.pad(raw, ((0, 0), (0, pad_k), (0, 0)))
        kc += pad_k
    p = bs * bs
    bg = jnp.broadcast_to(bg_color.astype(jnp.float32)[None, :], (1, 3))

    yy = np.arange(bs, dtype=np.float32)
    py, px = np.meshgrid(yy, yy, indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)
    basis = jnp.asarray(np.stack([
        np.ones_like(px), px, py, px * px, py * py, px * py,
        np.zeros_like(px), np.zeros_like(px)]).astype(np.float32))
    tri = jnp.asarray(np.tril(np.ones((group, group), np.float32), -1))

    return pl.pallas_call(
        _make_mxu_kernel(kc, p, group, mtw, bs),
        grid=(m,),
        in_specs=[
            pl.BlockSpec((None, kc, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, group), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, 1, p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 3, 1, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((4, p), jnp.float32),
        ],
        interpret=interpret,
    )(
        raw.astype(jnp.float32),
        counts.astype(jnp.int32),
        basis,
        tri,
        bg,
    )

"""Differentiable 3D Gaussian tile rasterizer — pure JAX, TPU-native.

Replaces the reference's CUDA ``diff-gaussian-rasterization`` submodule
(invoked at `Style_3DGS/gaussian_renderer/__init__.py:114-122`) with an
XLA-compiled equivalent. Same visual semantics as the 3DGS forward:

* EWA splatting: view transform -> perspective Jacobian -> 2D covariance
  (+0.3 px low-pass), conic, 3-sigma radius, 0.2-znear frustum cull;
* 16x16 pixel tiles; per-tile front-to-back alpha compositing with
  ``alpha = min(0.99, opacity * exp(power))``, skip below 1/255, early
  transmittance cutoff at 1e-4;
* background composited with the residual transmittance.

TPU redesign (no warp-level scatter/sort as in CUDA):
* Gaussians stream through in fixed-size chunks; a `lax.scan` maintains a
  per-tile top-K nearest-by-depth candidate list ([tiles, K] merge via
  `top_k`) — this replaces the CUDA duplicate-key radix sort;
* compositing is a dense [tiles, K, 256] exp/cumprod pipeline — pure VPU
  work with static shapes, fully fused by XLA;
* the whole thing is differentiable by construction (autodiff through
  top_k gathers + cumprod), so no hand-written backward kernel is needed;
  gradients flow to means/scales/rotations/opacities/colors, and a
  screen-space offset input exposes the 2D-mean gradients the densification
  heuristic consumes (mirrors the reference's ``screenspace_points`` trick,
  gaussian_renderer/__init__.py:26-31).

The per-tile K cap (default 128) bounds work and memory; Gaussians beyond
the K nearest within a tile are dropped — visually negligible once
transmittance saturates (the CUDA version stops at T<1e-4 for the same
reason).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aip_tpu.ops.quaternion import covariance_from_scaling_rotation

TILE = 16


class RasterSettings(NamedTuple):
    """Static (shape-determining) rasterization parameters. Camera-intrinsic
    floats (tanfov, scale modifier) are dynamic operands instead, so one
    compiled program serves every camera at a given resolution."""

    image_height: int
    image_width: int
    max_per_tile: int = 128
    chunk: int = 4096
    # Hierarchical selection: bin into (macro x macro)-tile blocks first,
    # then refine per tile from the macro candidate list. macro=1 disables.
    macro: int = 1
    macro_capacity: int = 1024
    # Rematerialize the composite in the backward pass (halves peak memory,
    # costs ~an extra forward). Disable when the [tiles, K, 256] buffers fit.
    remat_composite: bool = True
    # Differentiable-composite backend: 'xla' (autodiff through the dense
    # pipeline) or 'pallas' (streamed custom-VJP kernels,
    # aip_tpu.ops.pallas.composite_ad).
    ad_backend: str = "xla"


def project_gaussians(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    tanfovx: jax.Array,
    tanfovy: jax.Array,
    settings: RasterSettings,
    scale_modifier: float = 1.0,
):
    """EWA projection of N Gaussians to screen space.

    viewmatrix/projmatrix are stored transposed (row-vector convention, as
    the reference's camera code produces). Returns (means2d, depths, conics,
    radii, in_frustum).
    """
    n = means3d.shape[0]
    w, h = settings.image_width, settings.image_height
    fx = w / (2.0 * tanfovx)
    fy = h / (2.0 * tanfovy)

    hom = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], axis=1)
    p_view = hom @ viewmatrix  # [N, 4] row-vector transform
    tz = p_view[:, 2]
    in_frustum = tz > 0.2

    # Screen-space mean via the full projection.
    p_hom = hom @ projmatrix
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    mean2d = jnp.stack(
        [((ndc[:, 0] + 1.0) * w - 1.0) * 0.5, ((ndc[:, 1] + 1.0) * h - 1.0) * 0.5],
        axis=1,
    )

    # EWA 2D covariance. Clamp view-space x/y as the CUDA kernel does.
    cov3d = covariance_from_scaling_rotation(scales * scale_modifier, rotations)
    tzs = jnp.maximum(tz, 1e-6)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tzs, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tzs, -limy, limy)
    tx = txtz * tzs
    ty = tytz * tzs

    zeros = jnp.zeros_like(tz)
    j = jnp.stack(
        [
            jnp.stack([fx / tzs, zeros, -fx * tx / (tzs * tzs)], axis=1),
            jnp.stack([zeros, fy / tzs, -fy * ty / (tzs * tzs)], axis=1),
        ],
        axis=1,
    )  # [N, 2, 3]
    w3 = viewmatrix[:3, :3].T  # world->view rotation (column-vector form)
    t = j @ w3  # [N, 2, 3]
    cov2d = t @ cov3d @ jnp.swapaxes(t, 1, 2)  # [N, 2, 2]
    cov2d = cov2d.at[:, 0, 0].add(0.3)
    cov2d = cov2d.at[:, 1, 1].add(0.3)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))
    valid = in_frustum & (det > 0)
    radius = jnp.where(valid, radius, 0.0)
    return mean2d, tz, conic, radius, valid


def _tile_grid(settings: RasterSettings):
    tw = math.ceil(settings.image_width / TILE)
    th = math.ceil(settings.image_height / TILE)
    return th, tw


def select_per_tile(mean2d, depths, radii, valid, settings: RasterSettings):
    """Per-tile K-nearest-by-depth candidate selection via chunked merge.

    Returns (idx [tiles, K], sel_depth [tiles, K]); empty slots hold depth
    +inf. Output is depth-sorted ascending (front to back).
    """
    th, tw = _tile_grid(settings)
    n_tiles = th * tw
    k = settings.max_per_tile
    n = mean2d.shape[0]
    chunk = settings.chunk

    tile_x0 = (jnp.arange(n_tiles) % tw) * TILE
    tile_y0 = (jnp.arange(n_tiles) // tw) * TILE

    pad = (-n) % chunk
    mean2d_p = jnp.pad(mean2d, ((0, pad), (0, 0)))
    depths_p = jnp.pad(depths, (0, pad), constant_values=jnp.inf)
    radii_p = jnp.pad(radii, (0, pad))
    valid_p = jnp.pad(valid, (0, pad))
    n_chunks = (n + pad) // chunk

    init = (
        jnp.full((n_tiles, k), jnp.inf, jnp.float32),
        jnp.full((n_tiles, k), -1, jnp.int32),
    )

    def body(state, ci):
        best_d, best_i = state
        sl = ci * chunk
        m = jax.lax.dynamic_slice(mean2d_p, (sl, 0), (chunk, 2))
        d = jax.lax.dynamic_slice(depths_p, (sl,), (chunk,))
        r = jax.lax.dynamic_slice(radii_p, (sl,), (chunk,))
        v = jax.lax.dynamic_slice(valid_p, (sl,), (chunk,))

        # Tile-rect vs gaussian-circle overlap: [tiles, chunk].
        ox = (m[None, :, 0] + r[None, :] >= tile_x0[:, None]) & (
            m[None, :, 0] - r[None, :] < tile_x0[:, None] + TILE
        )
        oy = (m[None, :, 1] + r[None, :] >= tile_y0[:, None]) & (
            m[None, :, 1] - r[None, :] < tile_y0[:, None] + TILE
        )
        hit = ox & oy & v[None, :] & (r[None, :] > 0)
        key = jnp.where(hit, d[None, :], jnp.inf)

        cand_d = jnp.concatenate([best_d, key], axis=1)
        cand_i = jnp.concatenate([best_i, jnp.broadcast_to(sl + jnp.arange(chunk), (n_tiles, chunk)).astype(jnp.int32)], axis=1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cand_i, pos, axis=1)
        new_i = jnp.where(jnp.isinf(new_d), -1, new_i)
        return (new_d, new_i), None

    (sel_d, sel_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return sel_i, sel_d


def composite_tiles(sel_idx, sel_depth, mean2d, conics, colors, opacities,
                    bg_color, settings: RasterSettings):
    """Front-to-back alpha compositing of the per-tile candidate lists.

    Returns the [H, W, 3] image. Differentiable end to end.
    """
    th, tw = _tile_grid(settings)
    n_tiles = th * tw
    k = settings.max_per_tile

    slot_valid = sel_idx >= 0
    safe_idx = jnp.maximum(sel_idx, 0)
    g_mean = mean2d[safe_idx]  # [tiles, K, 2]
    g_conic = conics[safe_idx]  # [tiles, K, 3]
    g_color = colors[safe_idx]  # [tiles, K, 3]
    g_op = opacities[safe_idx]  # [tiles, K]

    # Pixel centers per tile: [tiles, P, 2], P = TILE*TILE.
    px = jnp.arange(TILE, dtype=jnp.float32)
    pyy, pxx = jnp.meshgrid(px, px, indexing="ij")
    local = jnp.stack([pxx.ravel(), pyy.ravel()], axis=1)  # [P, 2] (x, y)
    tile_x0 = ((jnp.arange(n_tiles) % tw) * TILE).astype(jnp.float32)
    tile_y0 = ((jnp.arange(n_tiles) // tw) * TILE).astype(jnp.float32)
    pix = local[None, :, :] + jnp.stack([tile_x0, tile_y0], axis=1)[:, None, :]

    d = pix[:, None, :, :] - g_mean[:, :, None, :]  # [tiles, K, P, 2]
    dx = d[..., 0]
    dy = d[..., 1]
    power = -0.5 * (g_conic[:, :, None, 0] * dx * dx + g_conic[:, :, None, 2] * dy * dy) \
        - g_conic[:, :, None, 1] * dx * dy
    power = jnp.minimum(power, 0.0)
    alpha = jnp.minimum(0.99, g_op[:, :, None] * jnp.exp(power))
    alpha = jnp.where(slot_valid[:, :, None], alpha, 0.0)
    alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)

    # Exclusive transmittance product along K (front to back).
    one_minus = 1.0 - alpha
    t_inclusive = jnp.cumprod(one_minus, axis=1)
    t_exclusive = jnp.concatenate(
        [jnp.ones_like(t_inclusive[:, :1]), t_inclusive[:, :-1]], axis=1
    )
    # CUDA parity: stop contributing once transmittance drops below 1e-4.
    contrib = jnp.where(t_exclusive > 1e-4, alpha * t_exclusive, 0.0)

    rgb = jnp.einsum("tkp,tkc->tpc", contrib, g_color)
    t_final = t_inclusive[:, -1, :]
    rgb = rgb + t_final[:, :, None] * bg_color[None, None, :]

    img = rgb.reshape(th, tw, TILE, TILE, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(th * TILE, tw * TILE, 3)
    return img[: settings.image_height, : settings.image_width]


def select_per_tile_hierarchical(mean2d, depths, radii, valid,
                                 settings: RasterSettings):
    """Two-level candidate selection.

    Phase 1 bins Gaussians into macro blocks of (macro x macro) tiles with a
    chunked top-K_c merge (few macro blocks -> cheap). Phase 2 refines each
    16px tile against only its macro block's K_c candidates — one top_k over
    K_c instead of over every chunk. At 1080p/100k Gaussians this replaces
    13 top_k passes over ~8k keys per tile with one pass over K_c.

    Returns (idx [tiles, K], depth [tiles, K]) like select_per_tile.
    """
    th, tw = _tile_grid(settings)
    k = settings.max_per_tile
    m = settings.macro
    kc = settings.macro_capacity

    # ---- Phase 1: macro binning via the existing chunk-merge machinery.
    mth = math.ceil(th / m)
    mtw = math.ceil(tw / m)
    # Reuse select_per_tile with a virtual tile size of m*TILE by scaling
    # coordinates down by m; the macro grid is mth x mtw TILE-sized tiles in
    # that scaled space.
    macro_settings = RasterSettings(
        image_height=mth * TILE, image_width=mtw * TILE,
        max_per_tile=kc, chunk=settings.chunk,
    )
    macro_idx, _ = select_per_tile(
        mean2d / m, depths, radii / m, valid, macro_settings
    )  # [mth*mtw, kc]

    # ---- Phase 2: per fine tile, filter its macro's candidates.
    n_tiles = th * tw
    tile_x0 = ((jnp.arange(n_tiles) % tw) * TILE).astype(jnp.float32)
    tile_y0 = ((jnp.arange(n_tiles) // tw) * TILE).astype(jnp.float32)
    macro_of_tile = (jnp.arange(n_tiles) // tw // m) * mtw + (jnp.arange(n_tiles) % tw) // m

    cand = macro_idx[macro_of_tile]          # [T, Kc]
    cvalid = cand >= 0
    safe = jnp.maximum(cand, 0)
    cm = mean2d[safe]                        # [T, Kc, 2]
    cr = radii[safe]
    cd = depths[safe]

    ox = (cm[..., 0] + cr >= tile_x0[:, None]) & (cm[..., 0] - cr < tile_x0[:, None] + TILE)
    oy = (cm[..., 1] + cr >= tile_y0[:, None]) & (cm[..., 1] - cr < tile_y0[:, None] + TILE)
    hit = ox & oy & cvalid & (cr > 0)
    key = jnp.where(hit, cd, jnp.inf)

    neg_top, pos = jax.lax.top_k(-key, k)
    sel_d = -neg_top
    sel_i = jnp.take_along_axis(cand, pos, axis=1)
    sel_i = jnp.where(jnp.isinf(sel_d), -1, sel_i)
    return sel_i, sel_d


def _select(mean2d, depths, radii, valid, settings: RasterSettings):
    if settings.macro > 1:
        return select_per_tile_hierarchical(mean2d, depths, radii, valid, settings)
    return select_per_tile(mean2d, depths, radii, valid, settings)


def composite_tiles_fast(sel_idx, mean2d, conics, colors, opacities,
                         bg_color, settings: RasterSettings,
                         interpret: bool = False):
    """Pallas-kernel compositing (inference fast path): gathers the per-tile
    candidate attributes and streams them through VMEM
    (aip_tpu.ops.pallas.composite). Not differentiable — training uses
    composite_tiles."""
    from aip_tpu.ops.pallas.composite import composite_tiles_pallas

    th, tw = _tile_grid(settings)
    n_tiles = th * tw

    slot_valid = sel_idx >= 0
    safe_idx = jnp.maximum(sel_idx, 0)

    tiles = composite_tiles_pallas(
        mean2d[safe_idx], conics[safe_idx], colors[safe_idx],
        opacities[safe_idx], slot_valid, bg_color, tile_w=tw,
        interpret=interpret,
    )  # [T, 3, TILE, TILE]
    img = tiles.reshape(th, tw, 3, TILE, TILE).transpose(0, 3, 1, 4, 2)
    img = img.reshape(th * TILE, tw * TILE, 3)
    return img[: settings.image_height, : settings.image_width]


@functools.partial(jax.jit, static_argnames=("settings",))
def rasterize(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    bg_color: jax.Array,
    settings: RasterSettings,
    tanfovx=1.0,
    tanfovy=1.0,
    scale_modifier=1.0,
    screenspace_offset: jax.Array | None = None,
):
    """Full forward: project + select + composite.

    ``screenspace_offset`` ([N, 2], normally zeros) is added to the projected
    means so callers can take gradients w.r.t. screen position (densification
    statistics). Returns (image [H, W, 3], radii [N]).
    """
    mean2d, depths, conics, radii, valid = project_gaussians(
        means3d, scales, rotations, viewmatrix, projmatrix,
        tanfovx, tanfovy, settings, scale_modifier,
    )
    if screenspace_offset is not None:
        mean2d = mean2d + screenspace_offset
    sel_idx, sel_depth = _select(
        mean2d, jax.lax.stop_gradient(depths), jax.lax.stop_gradient(radii),
        valid, settings,
    )
    if settings.ad_backend == "pallas":
        from aip_tpu.ops.pallas.composite_ad import composite_tiles_ad

        th, tw = _tile_grid(settings)
        slot_valid = (sel_idx >= 0).astype(jnp.float32)[:, :, None]
        safe = jnp.maximum(sel_idx, 0)
        tiles = composite_tiles_ad(
            mean2d[safe], conics[safe], colors[safe],
            opacities[safe][:, :, None], slot_valid, tw, False,
            jnp.broadcast_to(bg_color[None, :], (1, 3)),
        )
        img = tiles.reshape(th, tw, 3, TILE, TILE).transpose(0, 3, 1, 4, 2)
        img = img.reshape(th * TILE, tw * TILE, 3)
        img = img[: settings.image_height, : settings.image_width]
        return img, radii
    # Remat: the [tiles, K, 256] alpha/transmittance intermediates are the
    # memory peak under autodiff; recompute them in the backward instead of
    # storing (free for inference — no cotangents, no recompute).
    composite = functools.partial(composite_tiles, settings=settings)
    if settings.remat_composite:
        composite = jax.checkpoint(composite)
    img = composite(sel_idx, sel_depth, mean2d, conics, colors,
                    opacities, bg_color)
    return img, radii


def _composite_macro_matmul(macro_idx, mean2d, conics, colors, opacities,
                            bg_color, th, tw, m, mtw):
    """Per-macro-block compositing as MXU matmuls.

    The Gaussian log-density is a quadratic in pixel coordinates, so for a
    block of P pixels and Kc candidates:
        power = C[Kc, 6] @ B[6, P]
    with C the per-candidate polynomial coefficients and B the pixel basis
    [1, x, y, x^2, y^2, xy]. The weighted color sum is a second matmul
    W^T[P, Kc] @ colors[Kc, 3]; transmittance is exp(cumsum(log1p(-alpha))).
    Both big contractions ride the MXU; lax.map over macro blocks bounds
    the working set. Returns the [H, W, 3] image.
    """
    n_blocks, kc = macro_idx.shape
    bs = m * TILE  # macro block edge in pixels
    p = bs * bs

    valid = macro_idx >= 0
    safe = jnp.maximum(macro_idx, 0)
    gm = mean2d[safe]            # [M, Kc, 2]
    gc = conics[safe]            # [M, Kc, 3]
    gcol = colors[safe]          # [M, Kc, 3]
    gop = jnp.where(valid, opacities[safe], 0.0)  # [M, Kc]

    bx0 = ((jnp.arange(n_blocks) % mtw) * bs).astype(jnp.float32)
    by0 = ((jnp.arange(n_blocks) // mtw) * bs).astype(jnp.float32)

    # Block-LOCAL means: conditioning for the quadratic basis (coordinates
    # stay in [0, bs) so px^2 <= bs^2; with global pixel coords the x^2 term
    # reaches ~4e6 and fp32 matmul precision would be destroyed).
    mx = gm[..., 0] - bx0[:, None]
    my = gm[..., 1] - by0[:, None]
    ca, cb, cc = gc[..., 0], gc[..., 1], gc[..., 2]
    coeff = jnp.stack([
        -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my,
        ca * mx + cb * my,
        cc * my + cb * mx,
        -0.5 * ca,
        -0.5 * cc,
        -cb,
    ], axis=-1)  # [M, Kc, 6]

    # Local pixel basis, shared by all blocks: [6, P].
    yy = jnp.arange(bs, dtype=jnp.float32)
    py_l, px_l = jnp.meshgrid(yy, yy, indexing="ij")
    px_l = px_l.reshape(-1)
    py_l = py_l.reshape(-1)
    basis = jnp.stack([jnp.ones_like(px_l), px_l, py_l,
                       px_l * px_l, py_l * py_l, px_l * py_l])

    def block_fn(args):
        c, col, op = args
        power = jnp.dot(c, basis,
                        precision=jax.lax.Precision.HIGHEST)  # [Kc, P] MXU
        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(0.99, op[:, None] * jnp.exp(power))
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=0)
        t_exc = jnp.exp(jnp.concatenate([jnp.zeros_like(log_t[:1]), log_t[:-1]]))
        contrib = jnp.where(t_exc > 1e-4, alpha * t_exc, 0.0)  # [Kc, P]
        rgb = contrib.T @ col  # [P, 3] on the MXU
        t_final = jnp.exp(log_t[-1])
        return rgb + t_final[:, None] * bg_color[None, :]

    blocks = jax.lax.map(block_fn, (coeff, gcol, gop))  # [M, P, 3]
    mth = n_blocks // mtw
    img = blocks.reshape(mth, mtw, bs, bs, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(mth * bs, mtw * bs, 3)
    return img


@functools.partial(jax.jit, static_argnames=("settings",))
def rasterize_matmul(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    bg_color: jax.Array,
    settings: RasterSettings,
    tanfovx=1.0,
    tanfovy=1.0,
    scale_modifier=1.0,
):
    """Inference rasterization with matmul-structured macro-block
    compositing (MXU path). Requires settings.macro > 1."""
    assert settings.macro > 1, "rasterize_matmul requires hierarchical settings"
    mean2d, depths, conics, radii, valid = project_gaussians(
        means3d, scales, rotations, viewmatrix, projmatrix,
        tanfovx, tanfovy, settings, scale_modifier,
    )
    th, tw = _tile_grid(settings)
    m = settings.macro
    mth = math.ceil(th / m)
    mtw = math.ceil(tw / m)
    macro_settings = RasterSettings(
        image_height=mth * TILE, image_width=mtw * TILE,
        max_per_tile=settings.macro_capacity, chunk=settings.chunk,
    )
    macro_idx, _ = select_per_tile(mean2d / m, depths, radii / m, valid,
                                   macro_settings)
    img = _composite_macro_matmul(macro_idx, mean2d, conics, colors,
                                  jnp.asarray(opacities, jnp.float32),
                                  jnp.asarray(bg_color, jnp.float32),
                                  th, tw, m, mtw)
    return img[: settings.image_height, : settings.image_width], radii


@functools.partial(jax.jit, static_argnames=("settings", "interpret"))
def rasterize_fused(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    bg_color: jax.Array,
    settings: RasterSettings,
    tanfovx=1.0,
    tanfovy=1.0,
    scale_modifier=1.0,
    interpret: bool = False,
):
    """Fastest inference path: macro binning + a single Pallas kernel that
    walks each macro block's depth-sorted candidates per tile (the per-tile
    refinement is fused into the compositing walk — no per-tile top_k or
    gather). Requires settings.macro > 1. Not differentiable."""
    from aip_tpu.ops.pallas.composite import composite_from_macro_pallas

    assert settings.macro > 1, "rasterize_fused requires hierarchical settings"
    mean2d, depths, conics, radii, valid = project_gaussians(
        means3d, scales, rotations, viewmatrix, projmatrix,
        tanfovx, tanfovy, settings, scale_modifier,
    )
    th, tw = _tile_grid(settings)
    m = settings.macro
    mth = math.ceil(th / m)
    mtw = math.ceil(tw / m)
    macro_settings = RasterSettings(
        image_height=mth * TILE, image_width=mtw * TILE,
        max_per_tile=settings.macro_capacity, chunk=settings.chunk,
    )
    macro_idx, _ = select_per_tile(mean2d / m, depths, radii / m, valid,
                                   macro_settings)
    mvalid = macro_idx >= 0
    safe = jnp.maximum(macro_idx, 0)
    tiles = composite_from_macro_pallas(
        mean2d[safe], conics[safe], colors[safe], opacities[safe], mvalid,
        bg_color, n_tiles=th * tw, tile_w=tw, macro=m, macro_tile_w=mtw,
        interpret=interpret,
    )
    img = tiles.reshape(th, tw, 3, TILE, TILE).transpose(0, 3, 1, 4, 2)
    img = img.reshape(th * TILE, tw * TILE, 3)
    return img[: settings.image_height, : settings.image_width], radii


@functools.partial(jax.jit, static_argnames=("settings", "interpret"))
def rasterize_fast(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    bg_color: jax.Array,
    settings: RasterSettings,
    tanfovx=1.0,
    tanfovy=1.0,
    scale_modifier=1.0,
    interpret: bool = False,
):
    """Inference rasterization with the Pallas compositing kernel.

    Same forward semantics as rasterize(); not differentiable.
    """
    mean2d, depths, conics, radii, valid = project_gaussians(
        means3d, scales, rotations, viewmatrix, projmatrix,
        tanfovx, tanfovy, settings, scale_modifier,
    )
    sel_idx, _ = _select(mean2d, depths, radii, valid, settings)
    img = composite_tiles_fast(sel_idx, mean2d, conics, colors, opacities,
                               bg_color, settings, interpret=interpret)
    return img, radii

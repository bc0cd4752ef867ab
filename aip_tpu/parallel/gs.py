"""Multi-chip 3DGS training: view-batch data parallelism over a mesh.

SURVEY.md §2.4 TPU mapping (b): the Gaussian/colorfield parameters are
replicated across the ``dp`` axis and the per-step CAMERA BATCH is sharded
over it; jitting the (batched) train step under those shardings makes XLA
reduce the view-mean loss gradient with a psum over ICI — the reference is
strictly single-GPU here (no DDP anywhere, SURVEY §2.4).

Usage:
    mesh = make_mesh(jax.devices(), axis_names=("dp",), shape=(n,))
    trainer = replicate_trainer(mesh, trainer)
    cams = shard_view_batch(mesh, stack_cameras(views))   # B % n == 0
    # view_chunk=B: the view axis is dp-sharded, so per-device composite
    # memory is already B/n views — the single-chip memory chunking
    # (lax.scan over vmapped sub-batches) must not serialize it.
    # gaussian_shard: also shard the colorfield compute over the GAUSSIAN
    # axis (predict_sh_sharded below) — under plain view-dp every device
    # recomputes the full colorfield, the dominant step cost.
    step = make_train_step(cfg, slr, phase, H, W, views_per_step=B,
                           view_chunk=B, gaussian_shard=(mesh, "dp"))
    trainer, metrics = step(trainer, cams, style_f, bg)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate_trainer(mesh: Mesh, trainer):
    """Place every trainer leaf replicated over the mesh (host numpy leaves
    — e.g. from ``jax.device_get`` — are placed too, not silently skipped)."""
    import numpy as np

    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: (jax.device_put(x, rep)
                   if isinstance(x, (jax.Array, np.ndarray)) else x),
        trainer,
    )


def shard_view_batch(mesh: Mesh, cams, axis: str = "dp"):
    """Shard a stacked CameraArrays batch's leading (view) axis over
    ``axis``; scalar fields (python ints like height/width) stay as-is."""
    import numpy as np

    def put(x):
        if isinstance(x, (jax.Array, np.ndarray)) and x.ndim >= 1:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
        return x

    return jax.tree.map(put, cams)


def replicated_scalars(mesh: Mesh, *arrays):
    rep = NamedSharding(mesh, P())
    out = tuple(jax.device_put(jnp.asarray(a), rep) for a in arrays)
    return out if len(out) > 1 else out[0]


def predict_sh_sharded(mesh: Mesh, field, xyz: jax.Array,
                       style_f: jax.Array | None = None, axis: str = "dp"):
    """Gaussian-sharded colorfield (SURVEY §2.4 mapping (c), training side).

    The colorfield fwd+bwd is the dominant per-step training cost (~80% at
    512^2/131k, BENCHMARKS.md) and is embarrassingly parallel over the
    Gaussian axis — yet under view-batch data parallelism every device
    recomputes it for ALL N Gaussians. Sharding xyz over ``axis`` makes each
    device encode+MLP only N/dp rows (the hash tables and MLP stay
    replicated); the transpose of the shard_map psums the replicated field
    params' gradients over the mesh automatically, so ``jax.grad`` through
    this matches the replicated path to fp tolerance (tested on the 8-device
    CPU mesh). Inside the shard the platform-dispatched hash-gradient kernel
    (Pallas on TPU) sees plain local arrays, exactly like the single-chip
    path. Requires N % dp == 0 (capacity buckets are powers of two).

    Returns [N, 16, 3] SH sharded over ``axis`` (consumers that need it
    replicated — e.g. each device rasterizing its own views against ALL
    Gaussians — get the all_gather from XLA at the sharding boundary).
    """
    from aip_tpu.gs.colorfield import predict_sh

    dp = mesh.shape[axis]
    assert xyz.shape[0] % dp == 0, (xyz.shape, dp)
    if style_f is None:
        fn = jax.shard_map(lambda fi, xy: predict_sh(fi, xy, None),
                           mesh=mesh, in_specs=(P(), P(axis)),
                           out_specs=P(axis))
        return fn(field, xyz)
    fn = jax.shard_map(predict_sh, mesh=mesh,
                       in_specs=(P(), P(axis), P()), out_specs=P(axis))
    return fn(field, xyz, style_f)


# ---------------------------------------------------------------------------
# Sharded-Gaussian rendering (SURVEY §2.4 mapping (c)): scenes beyond one
# chip's HBM. The Gaussian arrays are sharded over ``dp``; each device
# projects and macro-bins its local shard, gathers the packed per-candidate
# attribute rows LOCALLY (indices are shard-local, so attributes must be
# materialized before any collective), then one all_to_all redistributes
# candidates from Gaussian-sharding to BLOCK-sharding; each device
# depth-merges the per-shard front-to-back prefixes for its block rows,
# composites them, and an all_gather assembles the image. Communication per
# device: blocks x Kc x 17 floats (the candidate rows), exactly once.
# ---------------------------------------------------------------------------


def rasterize_sharded(
    mesh: Mesh,
    means3d, scales, rotations, opacities, colors,
    viewmatrix, projmatrix, bg_color,
    settings,
    tanfovx=1.0, tanfovy=1.0,
    axis: str = "dp",
):
    """Inference rasterization with the GAUSSIAN arrays sharded over
    ``axis`` (model parallelism over the splat set, not the view batch).
    Exact: per-shard selections keep settings.macro_capacity candidates
    each, so the merged per-block list holds dp x Kc — a superset of the
    replicated path's Kc. Returns the [H, W, 3] image (replicated).

    Per-Gaussian inputs must be jax.Arrays placed with their leading axis
    sharded over ``axis`` (see shard_gaussian_arrays); N % dp == 0.
    Returns (image [H, W, 3], radii [N]) like the single-device backends.
    """
    import math

    from aip_tpu.gs.rasterizer import (TILE, project_gaussians,
                                       select_macro_pairsort, cull_radii,
                                       _tile_grid, pack_raw_table,
                                       composite_raw_blocks)

    assert settings.macro > 1, "rasterize_sharded needs hierarchical settings"
    dp = mesh.shape[axis]
    th, tw = _tile_grid(settings)
    m = settings.macro
    mth = math.ceil(th / m)
    mtw = math.ceil(tw / m)
    bs = m * TILE
    n_blocks = mth * mtw
    blocks_pad = -(-n_blocks // dp) * dp
    kc = settings.macro_capacity

    def shard_fn(xyz, sc, rot, op, col, view, proj, bg):
        mean2d, depths, conics, radii, valid = project_gaussians(
            xyz, sc, rot, view, proj, tanfovx, tanfovy, settings)
        # Same opacity-aware footprint tightening as the replicated
        # backends (selection_radii): exact, and it stops zero-opacity
        # pad slots from occupying candidate capacity.
        radii_sel = cull_radii(radii, op, settings)
        idx, _ = select_macro_pairsort(mean2d, depths, radii_sel, valid,
                                       mth, mtw, settings)  # [B, Kc] local
        table = pack_raw_table(mean2d, conics, op, col)
        raw = table[jnp.maximum(idx, 0)]                     # [B, Kc, 16]
        dep = jnp.where(idx >= 0, depths[jnp.maximum(idx, 0)], jnp.inf)

        pad = blocks_pad - n_blocks
        if pad:
            raw = jnp.pad(raw, ((0, pad), (0, 0), (0, 0)))
            dep = jnp.pad(dep, ((0, pad), (0, 0)),
                          constant_values=jnp.inf)

        # Gaussian-sharded -> block-sharded: each device receives every
        # shard's candidate prefix for its block rows.
        raw = jax.lax.all_to_all(raw, axis, split_axis=0, concat_axis=1,
                                 tiled=True)   # [B/dp, dp*Kc, 16]
        dep = jax.lax.all_to_all(dep, axis, split_axis=0, concat_axis=1,
                                 tiled=True)

        order = jnp.argsort(dep, axis=1)       # merge: global front-to-back
        raw = jnp.take_along_axis(raw, order[..., None], axis=1)
        counts = jnp.sum(jnp.isfinite(dep), axis=1).astype(jnp.int32)

        block0 = jax.lax.axis_index(axis) * (blocks_pad // dp)
        rgb = composite_raw_blocks(raw, counts, bg, bs, mtw, block0)
        return jax.lax.all_gather(rgb, axis, axis=0, tiled=True), radii

    g_spec = P(axis)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(g_spec, g_spec, g_spec, g_spec, g_spec, P(), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    blocks, radii = fn(means3d, scales, rotations, opacities, colors,
                       jnp.asarray(viewmatrix, jnp.float32),
                       jnp.asarray(projmatrix, jnp.float32),
                       jnp.asarray(bg_color, jnp.float32))   # [Bpad, P, 3]
    blocks = blocks[:n_blocks]
    img = blocks.reshape(mth, mtw, bs, bs, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(mth * bs, mtw * bs, 3)
    return img[: settings.image_height, : settings.image_width], radii


def shard_gaussian_arrays(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place per-Gaussian arrays with the leading axis sharded over
    ``axis`` (pad N to a dp multiple first — inactive slots render as
    opacity 0)."""
    out = tuple(
        jax.device_put(jnp.asarray(a),
                       NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
        for a in arrays)
    return out if len(out) > 1 else out[0]

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
    step = make_train_step(cfg, slr, phase, H, W, views_per_step=B)
    trainer, metrics = step(trainer, cams, style_f, bg)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate_trainer(mesh: Mesh, trainer):
    """Place every trainer leaf replicated over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if isinstance(x, jax.Array) else x,
        trainer,
    )


def shard_view_batch(mesh: Mesh, cams, axis: str = "dp"):
    """Shard a stacked CameraArrays batch's leading (view) axis over
    ``axis``; scalar fields stay replicated."""
    def put(x):
        if isinstance(x, jax.Array) and x.ndim >= 1:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
        return x

    return jax.tree.map(put, cams)


def replicated_scalars(mesh: Mesh, *arrays):
    rep = NamedSharding(mesh, P())
    out = tuple(jax.device_put(jnp.asarray(a), rep) for a in arrays)
    return out if len(out) > 1 else out[0]

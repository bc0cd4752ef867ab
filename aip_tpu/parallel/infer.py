"""Batched, mesh-sharded AdaIN inference for throughput.

The reference stylizes one image at a time (`AdaIN/test.py:153-247`); the
TPU rebuild's unit of work is a *batch* sharded over the ``dp`` mesh axis —
frames of a video, views of a scene, or a directory of images. One jitted
program; XLA overlaps the per-chip work with ICI transfers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aip_tpu.pipelines.adain_infer import stylize_simple
from aip_tpu.parallel.sharding import batch_sharding, replicated


def compile_batch_stylize(mesh: Mesh, alpha: float = 0.5, compute_dtype=jnp.bfloat16):
    """Returns jitted fn(vgg_params, dec_params, content[B], style[B]) -> [B]
    with the batch sharded over dp and params replicated."""
    data = batch_sharding(mesh)
    rep = replicated(mesh)

    def fn(vgg_params, dec_params, content, style):
        return stylize_simple(vgg_params, dec_params, content, style,
                              alpha=alpha, compute_dtype=compute_dtype)

    del rep  # params keep their placement (replicate before calling if desired)
    return jax.jit(
        fn,
        in_shardings=(None, None, data, data),
        out_shardings=data,
    )

"""Residual vector quantization for Gaussian scale/rotation compression.

TPU-native replacement for ``vector_quantize_pytorch.ResidualVQ``
(`scene/gaussian_model.py:70-71`: dim 3/4, codebook 64, 6 quantizers,
k-means init, learnable codebooks). Functional: codebooks are a [Q, S, D]
array; ``quantize`` runs the residual cascade with straight-through
gradients; ``kmeans_init`` seeds codebooks from data; ``update_codebooks``
does one EMA/means step (stand-in for the in-place Adam the reference
attaches; behaviorally both pull codewords toward assigned residuals).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RVQState(NamedTuple):
    codebooks: jax.Array  # [Q, S, D]


def _nearest(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """[N, D] x [S, D] -> [N] nearest codeword indices."""
    d2 = jnp.sum(x * x, 1, keepdims=True) - 2 * x @ codebook.T + jnp.sum(codebook * codebook, 1)[None]
    return jnp.argmin(d2, axis=1)


def kmeans_init(key: jax.Array, data: jax.Array, num_quantizers: int,
                codebook_size: int, iters: int = 1) -> RVQState:
    """Seed each quantizer's codebook with k-means on the residuals."""
    residual = data
    books = []
    for q in range(num_quantizers):
        key, sub = jax.random.split(key)
        n = residual.shape[0]
        idx = jax.random.choice(sub, n, (codebook_size,), replace=n < codebook_size)
        cb = residual[idx]
        for _ in range(iters):
            assign = _nearest(residual, cb)
            one_hot = jax.nn.one_hot(assign, codebook_size, dtype=residual.dtype)
            counts = one_hot.sum(0)
            sums = one_hot.T @ residual
            cb = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cb)
        assign = _nearest(residual, cb)
        residual = residual - cb[assign]
        books.append(cb)
    return RVQState(jnp.stack(books))


@jax.jit
def quantize(state: RVQState, x: jax.Array):
    """Residual quantize [N, D]. Returns (x_q with straight-through grad,
    indices [N, Q])."""
    residual = x
    out = jnp.zeros_like(x)
    idxs = []
    for q in range(state.codebooks.shape[0]):
        cb = state.codebooks[q]
        assign = _nearest(jax.lax.stop_gradient(residual), cb)
        chosen = cb[assign]
        out = out + chosen
        residual = residual - chosen
        idxs.append(assign)
    # Straight-through: forward quantized, backward identity to x.
    x_q = x + jax.lax.stop_gradient(out - x)
    return x_q, jnp.stack(idxs, axis=1)


@jax.jit
def update_codebooks(state: RVQState, x: jax.Array, mask: jax.Array | None = None,
                     lr: float = 0.1) -> RVQState:
    """Pull each codeword toward the mean of its assigned residuals.

    ``mask`` ([N] bool/float) excludes rows (e.g. inactive padded Gaussian
    slots) from the means while keeping shapes static for jit.
    """
    w = jnp.ones(x.shape[0], x.dtype) if mask is None else mask.astype(x.dtype)
    residual = x
    new_books = []
    for q in range(state.codebooks.shape[0]):
        cb = state.codebooks[q]
        assign = _nearest(residual, cb)
        one_hot = jax.nn.one_hot(assign, cb.shape[0], dtype=x.dtype) * w[:, None]
        counts = one_hot.sum(0)
        means = one_hot.T @ residual / jnp.maximum(counts[:, None], 1)
        cb_new = jnp.where(counts[:, None] > 0, cb + lr * (means - cb), cb)
        residual = residual - cb[assign]
        new_books.append(cb_new)
    return RVQState(jnp.stack(new_books))


def decode(state: RVQState, indices: jax.Array) -> jax.Array:
    """[N, Q] indices -> [N, D] reconstruction."""
    out = 0.0
    for q in range(state.codebooks.shape[0]):
        out = out + state.codebooks[q][indices[:, q]]
    return out

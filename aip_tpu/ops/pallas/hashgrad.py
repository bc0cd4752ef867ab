"""Pallas hash-table-gradient kernel: scatter-add as fused one-hot matmuls.

The colorfield backward needs G[idx_m] += v_m over ~16.8M duplicate-index
contributions into a [L, T, F] hash table (tcnn's CUDA backward is a plain
atomic add, `gaussian_model.py:74-104` dependency). On TPU the XLA
scatter serializes on duplicates, and the XLA one-hot-matmul formulation
(colorfield._hash_encode_mxu_bwd) materializes the one-hot operands
through HBM — ~2 x M x (HI + LO*F) bf16 entries of traffic, which costs
as much as the matmuls themselves.

This kernel builds the one-hots in VMEM and feeds the MXU directly.
Contributions are packed lane-major ([rows, 128] blocks — Pallas pads
operand minor dims to 128 lanes in HBM, so lane-major packing is also
what keeps the operands at their logical size). Per 128-contribution
lane row:

    hi_oh[hi, c]  = (hi == hi_c)                      [HI, 128] bf16
    lo_v[k, c]    = (k//F == lo_c) * v[c, k%F]        [LO*F, 128] bf16
    G += hi_oh @ lo_v^T   (contract the 128 lanes)    [HI, LO*F] f32

Everything is broadcast/compare/select plus K=128 MXU dots — no
relayouts, no dynamic slices, no scalar loads. HBM traffic drops to the
raw contributions plus one [L, HI, LO*F] table write; numerics match the
XLA path (bf16 operands, f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _make_kernel(rows: int, f: int, hi_n: int, lo_n: int):
    lof = lo_n * f

    def kernel(hi_ref, lo_ref, v_ref, out_ref):
        s = pl.program_id(1)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_n, LANES), 0)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (lof, LANES), 0)

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros((hi_n, lof), jnp.float32)

        # Accumulate each lane row's dot straight into the output block
        # (a [HI, LOF] f32 stack accumulator would blow the 16MB scoped
        # VMEM budget inside large surrounding programs).
        for r in range(rows):  # static unroll; all slices static
            hi_row = hi_ref[r:r + 1, :]     # [1, 128]
            lo_row = lo_ref[r:r + 1, :]
            hi_oh = (iota_hi == hi_row).astype(jnp.bfloat16)
            vsel = jnp.broadcast_to(v_ref[r:r + 1, :], (lof, LANES))
            for ff in range(1, f):
                vsel = jnp.where((iota_k % f) == ff,
                                 v_ref[ff * rows + r:ff * rows + r + 1, :],
                                 vsel)
            lo_v = jnp.where((iota_k // f) == lo_row, vsel, 0.0
                             ).astype(jnp.bfloat16)
            out_ref[...] += jax.lax.dot_general(
                hi_oh, lo_v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("hi_n", "lo_n", "chunk",
                                             "interpret"))
def hash_grad_pallas(
    hi: jax.Array,     # [L, M] int32 high index (hi_n = sentinel, dropped)
    lo: jax.Array,     # [L, M] int32 low index
    v: jax.Array,      # [L, M, F] f32 contribution values
    hi_n: int,
    lo_n: int,
    chunk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Returns the [L, hi_n, lo_n*F] gradient accumulator (f32)."""
    l, m = hi.shape
    f = v.shape[-1]
    rows = chunk // LANES
    pad = (-m) % chunk
    if pad:
        hi = jnp.pad(hi, ((0, 0), (0, pad)), constant_values=hi_n)
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    steps = (m + pad) // chunk

    # Lane-major packing: [L*S, rows, 128] per index stream; values as
    # [L*S, F*rows, 128] with feature ff in row block [ff*rows, (ff+1)*rows).
    hi_p = hi.reshape(l * steps, rows, LANES)
    lo_p = lo.reshape(l * steps, rows, LANES)
    v_p = (v.astype(jnp.float32)
           .reshape(l * steps, rows, LANES, f)
           .transpose(0, 3, 1, 2)
           .reshape(l * steps, f * rows, LANES))

    return pl.pallas_call(
        _make_kernel(rows, f, hi_n, lo_n),
        grid=(l, steps),
        in_specs=[
            pl.BlockSpec((None, rows, LANES),
                         lambda i, s, steps=steps: (i * steps + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, LANES),
                         lambda i, s, steps=steps: (i * steps + s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, f * rows, LANES),
                         lambda i, s, steps=steps: (i * steps + s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, hi_n, lo_n * f), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, hi_n, lo_n * f), jnp.float32),
        interpret=interpret,
    )(hi_p, lo_p, v_p)

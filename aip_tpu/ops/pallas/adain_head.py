"""VMEM-resident fused kernels for the AdaIN 64-channel 512^2 stages.

The serving-graph roofline (BENCHMARKS.md "Per-layer roofline") pins the
throughput plateau on four stages that stream full 512^2 activation slabs
through HBM at MFU <= 0.21: the encoder head (conv1_1 3->64, conv1_2
64->64 + pool) and the decoder tail (up2x, conv1_2 64->64, conv1_1
64->3). Both r4 fusion attempts still materialized per-layer tensors;
these kernels instead keep a spatial strip of the activation in VMEM
across the whole chain, so HBM sees each image ONCE in and ONCE out:

* ``encode_head_pallas``: reflect-pad -> conv(3->64) -> ReLU ->
  reflect-pad -> conv(64->64) -> ReLU -> maxpool2x2, reading the
  [H+2, W+2, 3] padded image and writing the pooled [H/2, W/2, 64] map.
  The reference's 1x1 RGB conv (`net.py` vgg[0]) is folded into the
  3->64 weights by the caller (it commutes with reflection padding).
* ``decode_tail_pallas``: up2x (nearest) -> reflect-pad -> conv(64->64)
  -> ReLU -> reflect-pad -> conv(64->3), reading the [H/2, W/2, 64]
  feature map and writing the [H, W, 3] image.

Reference chain: `Style_3DGS/AdaIN/net.py` vgg[0:10] / decoder[23:29].

Design notes (TPU):
* Grid is (batch, row-strip); each strip recomputes a 1-row halo of the
  intermediate activation instead of exchanging it, so strips are
  independent. Reflection semantics at the top/bottom image rows need
  different (static) row assemblies, so the first/last strips take
  `pl.when` branches; interior strips use dynamic `pl.ds` starts.
* Double reflect-padding does NOT commute with the first conv (the
  halo row of the second pad reads the *reflected* first-conv window),
  which is why the halo is recomputed from true rows rather than
  pre-padding twice.
* The 64-channel matmuls can use at most half the MXU's 128 output
  lanes. Taps are packed in PAIRS along the contraction dim
  ([M, 128] @ [128, 64], weights host-stacked into [5, 128, 64] with
  the odd 9th tap zero-padded) so the contraction side at least runs
  full, giving the 50% ceiling instead of 25%.
* The decoder's `up2x + reflect-pad` composes into a 2x row/col repeat
  with EDGE padding (up[-1] = up[1] = y[0]), so the upsample is a
  repeat of the DMA'd strip — never materialized at full size in HBM.

Forward/serving only: training keeps the XLA layer path (autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tap pairing for the 64->64 convs: 4 pairs + the zero-padded single.
_PAIRS = (((0, 0), (0, 1)), ((0, 2), (1, 0)), ((1, 1), (1, 2)),
          ((2, 0), (2, 1)), ((2, 2), None))


def pack_pair_weights(w: jax.Array) -> jax.Array:
    """[3, 3, 64, Cout] conv weights -> [5, 128, Cout] stacked tap pairs
    (second half of the last slot zeroed)."""
    k1, k2, cin, cout = w.shape
    assert (k1, k2) == (3, 3)
    slots = []
    for a, b in _PAIRS:
        wa = w[a[0], a[1]]
        wb = w[b[0], b[1]] if b is not None else jnp.zeros_like(wa)
        slots.append(jnp.concatenate([wa, wb], axis=0))
    return jnp.stack(slots)


def fold_rgb_conv(w0, b0, w1, b1):
    """Fold the 1x1 RGB conv (vgg[0]) into the 3->64 conv: the pointwise
    matmul commutes with reflection padding. Returns ([3,3,3,64], [64])."""
    m0 = w0[0, 0]                                   # [3, 3]
    w_eff = jnp.einsum("ij,hwjk->hwik", m0, w1)
    b_eff = b1 + jnp.einsum("j,hwjk->k", b0, w1)
    return w_eff, b_eff


def _conv_pairs(x_ext, w2p, th, wdt):
    """[th+2, W+2, 64] -> [th, W, 64] f32 via 5 pair-packed MXU dots."""
    w_out = x_ext.shape[1] - 2
    acc = None
    for p, (a, b) in enumerate(_PAIRS):
        xa = x_ext[a[0]:a[0] + th, a[1]:a[1] + w_out, :]
        xb = (x_ext[b[0]:b[0] + th, b[1]:b[1] + w_out, :]
              if b is not None else xa)
        inp = jnp.concatenate([xa, xb], axis=-1).reshape(th * w_out, 128)
        d = jnp.dot(inp.astype(wdt), w2p[p],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc.reshape(th, w_out, -1)


def _col_reflect(x):
    """[R, W, C] -> [R, W+2, C] reflect-extended columns."""
    return jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)


def _enc_kernel(xp_ref, w1_ref, b1_ref, w2p_ref, b2_ref, out_ref, *,
                th, h, w, out_dtype):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    wdt = w1_ref.dtype

    def conv1(xs, n1):
        """xs [n1+2, W+2, 3] padded rows -> relu(conv 3->64) [n1, W, 64]."""
        ic = jnp.concatenate(
            [xs[dy:dy + n1, dx:dx + w, :] for dy in range(3)
             for dx in range(3)], axis=-1)            # [n1, W, 27]
        y = jnp.dot(ic.reshape(n1 * w, 27).astype(wdt), w1_ref[...],
                    preferred_element_type=jnp.float32)
        return jax.nn.relu(y.reshape(n1, w, 64) + b1_ref[...]).astype(wdt)

    def tail(x1e):
        """x1e [th+2, W+2, 64] -> pooled strip [th//2, W//2, 64]."""
        y = jax.nn.relu(_conv_pairs(x1e, w2p_ref[...], th, wdt)
                        + b2_ref[...])
        pooled = y.reshape(th // 2, 2, w // 2, 2, 64).max(axis=(1, 3))
        out_ref[0] = pooled.astype(out_dtype)

    @pl.when(j == 0)
    def _top():
        xs = xp_ref[0, 0:th + 3]                      # x1 rows [0, th+1)
        x1 = conv1(xs, th + 1)
        x1e = jnp.concatenate([x1[1:2], x1], axis=0)  # reflect row -1 -> 1
        tail(_col_reflect(x1e))

    @pl.when(jnp.logical_and(j > 0, j < nj - 1))
    def _interior():
        r0 = j * th
        xs = xp_ref[0, pl.ds(r0 - 1, th + 4)]         # x1 rows [r0-1, r0+th+1)
        tail(_col_reflect(conv1(xs, th + 2)))

    @pl.when(jnp.logical_and(j == nj - 1, nj > 1))
    def _bottom():
        xs = xp_ref[0, h - th - 1:h + 2]              # x1 rows [H-th-1, H)
        x1 = conv1(xs, th + 1)
        x1e = jnp.concatenate([x1, x1[-2:-1]], axis=0)
        tail(_col_reflect(x1e))


@functools.partial(jax.jit,
                   static_argnames=("th", "out_dtype", "interpret"))
def encode_head_pallas(xp: jax.Array, w1_ic: jax.Array, b1: jax.Array,
                       w2p: jax.Array, b2: jax.Array, th: int = 16,
                       out_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused encoder head.

    xp: [B, H+2, W+2, 3] reflect-padded input (pad 1, any float dtype —
        cast to w1_ic.dtype inside);
    w1_ic: [27, 64] im2col (dy, dx, ci) 3->64 weights (RGB conv folded);
    w2p: [5, 128, 64] pair-packed 64->64 weights;
    returns [B, H//2, W//2, 64] pooled relu1_2 in ``out_dtype``.
    """
    b_, hp, wp, _ = xp.shape
    h, w = hp - 2, wp - 2
    assert h % th == 0 and th % 2 == 0 and w % 2 == 0 and h // th >= 2, (
        h, w, th)
    nj = h // th
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_enc_kernel, th=th, h=h, w=w, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((b_, h // 2, w // 2, 64), out_dtype),
        grid=(b_, nj),
        in_specs=[
            pl.BlockSpec((1, hp, wp, 3), lambda b, j: (b, 0, 0, 0)),
            pl.BlockSpec((27, 64), lambda b, j: (0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
            pl.BlockSpec((5, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th // 2, w // 2, 64),
                               lambda b, j: (b, j, 0, 0)),
        interpret=interpret,
    )(xp, w1_ic, b1.astype(f32), w2p, b2.astype(f32))


def _dec_kernel(y_hbm, w2p_ref, b2_ref, w1p_ref, b1_ref, out_ref,
                y_s, sem, *, th, h, w, out_dtype):
    # program_id must be read OUTSIDE the pl.when closures: the branch
    # body lowers as a plain JAX function in interpret mode, where the
    # primitive has no lowering rule.
    bi = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    hy, wy = h // 2, w // 2
    ty = th // 2
    wdt = w2p_ref.dtype

    def load(start):
        cp = pltpu.make_async_copy(
            y_hbm.at[bi, pl.ds(start, ty + 2)], y_s, sem)
        cp.start()
        cp.wait()

    def up2x(y):
        """[R, Wy, 64] -> [2R, W, 64] nearest."""
        r = y.shape[0]
        return jnp.broadcast_to(
            y[:, None, :, None, :], (r, 2, wy, 2, 64)).reshape(2 * r, w, 64)

    def edge_cols(u):
        return jnp.concatenate([u[:, 0:1], u, u[:, -1:]], axis=1)

    def tail(z_e):
        """z_e [th+2, W+2, 64] -> out strip [th, W, 3]."""
        o = _conv_pairs(z_e, w1p_ref[...], th, wdt) + b1_ref[...]
        out_ref[0] = o[..., :3].astype(out_dtype)

    def conv2(u_ext, nz):
        """u_ext [nz+2, W+2, 64] -> relu(conv 64->64) [nz, W, 64]."""
        return jax.nn.relu(
            _conv_pairs(u_ext, w2p_ref[...], nz, wdt)
            + b2_ref[...]).astype(wdt)

    @pl.when(j == 0)
    def _top():
        load(0)
        y = y_s[0:ty + 1]
        # u_ext rows for z rows [0, th+1): k=0 -> y0 (edge), then repeat.
        u = up2x(y)                                   # rows [0, th+2)
        u_ext = edge_cols(jnp.concatenate([u[0:1], u], axis=0))
        z = conv2(u_ext, th + 1)
        tail(_col_reflect(jnp.concatenate([z[1:2], z], axis=0)))

    @pl.when(jnp.logical_and(j > 0, j < nj - 1))
    def _interior():
        r0 = j * th
        load(r0 // 2 - 1)
        # z rows [r0-1, r0+th+1) need u_ext rows [r0-1, r0+th+3), which is
        # exactly the 2x repeat of y rows [r0/2-1, r0/2+th/2+1).
        u_ext = edge_cols(up2x(y_s[...]))
        tail(_col_reflect(conv2(u_ext, th + 2)))

    @pl.when(jnp.logical_and(j == nj - 1, nj > 1))
    def _bottom():
        load(hy - ty - 2)                             # y rows [hy-ty-1, hy)
        y = y_s[1:ty + 2]
        u = up2x(y)                                   # rows [h-th-2, h)
        u_ext = edge_cols(jnp.concatenate([u, u[-1:]], axis=0))
        z = conv2(u_ext, th + 1)                      # z rows [h-th-1, h)
        tail(_col_reflect(jnp.concatenate([z, z[-2:-1]], axis=0)))


@functools.partial(jax.jit,
                   static_argnames=("th", "out_dtype", "interpret"))
def decode_tail_pallas(y: jax.Array, w2p: jax.Array, b2: jax.Array,
                       w1p: jax.Array, b1: jax.Array, th: int = 16,
                       out_dtype=jnp.float32, interpret: bool = False):
    """Fused decoder tail.

    y: [B, H/2, W/2, 64] post-ReLU feature map (cast to w2p.dtype);
    w2p / w1p: [5, 128, 64] pair-packed weights (w1p's output channels
        zero-padded 3 -> 64); b1: [64] with the true bias in [:3];
    returns [B, H, W, 3] in ``out_dtype``.
    """
    b_, hy, wy, c = y.shape
    assert c == 64
    h, w = hy * 2, wy * 2
    assert h % th == 0 and th % 2 == 0 and h // th >= 2, (h, th)
    assert hy >= th // 2 + 2, (hy, th)
    nj = h // th
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_dec_kernel, th=th, h=h, w=w, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((b_, h, w, 3), out_dtype),
        grid=(b_, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
            pl.BlockSpec((5, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th, w, 3), lambda b, j: (b, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th // 2 + 2, wy, 64), w2p.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y.astype(w2p.dtype), w2p, b2.astype(f32), w1p, b1.astype(f32))

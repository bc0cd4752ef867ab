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

# Tap pairing for the 64->64 convs. Pairs must share the COLUMN shift
# (dx): Mosaic's lane-concat requires all inputs at the same sublane
# offset, and a slice x[_, dx:dx+W, :] carries sublane offset dx. So
# each of the 3 columns contributes one (dy=0, dy=1) pair and one dy=2
# single (zero-padded second half) — 6 dots instead of the offset-mixing
# 5.
_PAIRS = (((0, 0), (1, 0)), ((2, 0), None),
          ((0, 1), (1, 1)), ((2, 1), None),
          ((0, 2), (1, 2)), ((2, 2), None))


def pack_pair_weights(w: jax.Array) -> jax.Array:
    """[3, 3, 64, Cout] conv weights -> [6, 128, Cout] stacked tap pairs
    (second half of single-tap slots zeroed)."""
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


def _strips(x, nj, rows, step, max_start):
    """[B, H, ...] -> [B, nj, rows, ...]: overlapping row strips, start
    clip(j*step - 1, 0, max_start). Host-side (one XLA gather) because
    in-kernel strip windows can neither overlap (BlockSpec) nor be DMA'd
    (lane extents must be 128-multiples)."""
    starts = np.clip(np.arange(nj) * step - 1, 0, max_start)
    idx = starts[:, None] + np.arange(rows)[None, :]
    return x[:, idx]


def _enc_kernel(xs_ref, w1_ref, b1_ref, w2p_ref, b2_ref, out_ref, *,
                th, h, w, out_dtype):
    # xs_ref block: this strip's (clamped) [th+4, W+2, 3] input rows —
    # pre-cut host-side (``_strips``) so windows never overlap. A
    # whole-image window would allocate (H+2) x (W+2) x 128 padded lanes
    # in VMEM (~130 MB at 512^2: the 3-lane dim pads to a full tile),
    # and Mosaic DMA requires 128-multiple lane extents, so neither a
    # big window nor a manual strip copy works for a 3-channel input.
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    wdt = w1_ref.dtype

    def conv1(xs, n1):
        """xs [n1+2, W+2, 3] padded rows -> relu(conv 3->64) [n1, W, 64].

        dx-grouped im2col: the lane-concat only mixes dy shifts (dim-0,
        untiled), keeping every input at sublane offset dx — one
        [M, 9] @ [9, 64] dot per column."""
        y = None
        for dx in range(3):
            ic = jnp.concatenate(
                [xs[dy:dy + n1, dx:dx + w, :] for dy in range(3)],
                axis=-1)                              # [n1, W, 9]
            d = jnp.dot(ic.reshape(n1 * w, 9).astype(wdt), w1_ref[dx],
                        preferred_element_type=jnp.float32)
            y = d if y is None else y + d
        return jax.nn.relu(y.reshape(n1, w, 64) + b1_ref[...]).astype(wdt)

    def tail(x1e):
        """x1e [th+2, W+2, 64] -> pooled strip [th//2, W//2, 64]."""
        y = jax.nn.relu(_conv_pairs(x1e, w2p_ref[...], th, wdt)
                        + b2_ref[...])
        pooled = y.reshape(th // 2, 2, w // 2, 2, 64).max(axis=(1, 3))
        out_ref[0] = pooled.astype(out_dtype)

    @pl.when(j == 0)
    def _top():
        xs = xs_ref[0, 0, 0:th + 3]                   # x1 rows [0, th+1)
        x1 = conv1(xs, th + 1)
        x1e = jnp.concatenate([x1[1:2], x1], axis=0)  # reflect row -1 -> 1
        tail(_col_reflect(x1e))

    @pl.when(jnp.logical_and(j > 0, j < nj - 1))
    def _interior():
        # strip rows = xp rows [r0-1, r0+th+3) -> x1 rows [r0-1, r0+th+1)
        tail(_col_reflect(conv1(xs_ref[0, 0], th + 2)))

    @pl.when(jnp.logical_and(j == nj - 1, nj > 1))
    def _bottom():
        xs = xs_ref[0, 0, 1:th + 4]                   # x1 rows [H-th-1, H)
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
    w1_ic: [3, 9, 64] dx-grouped im2col (dx; dy, ci) 3->64 weights (RGB
        conv folded);
    w2p: [6, 128, 64] pair-packed 64->64 weights;
    returns [B, H//2, W//2, 64] pooled relu1_2 in ``out_dtype``.
    """
    b_, hp, wp, _ = xp.shape
    h, w = hp - 2, wp - 2
    assert h % th == 0 and th % 2 == 0 and w % 2 == 0 and h // th >= 2, (
        h, w, th)
    nj = h // th
    f32 = jnp.float32
    xs = _strips(xp, nj, th + 4, th, h - th - 2)
    return pl.pallas_call(
        functools.partial(_enc_kernel, th=th, h=h, w=w, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((b_, h // 2, w // 2, 64), out_dtype),
        grid=(b_, nj),
        in_specs=[
            pl.BlockSpec((1, 1, th + 4, wp, 3),
                         lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((3, 9, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
            pl.BlockSpec((6, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th // 2, w // 2, 64),
                               lambda b, j: (b, j, 0, 0)),
        interpret=interpret,
    )(xs.astype(w1_ic.dtype), w1_ic, b1.astype(f32), w2p, b2.astype(f32))


def _dec_kernel(y_ref, w2p_ref, b2_ref, w1p_ref, b1_ref, out_ref, *,
                th, h, w, out_dtype):
    # y_ref block: this strip's (clamped) [ty+2, Wy, 64] feature rows,
    # pre-cut host-side (_strips) — see _enc_kernel on why neither big
    # windows nor DMA fit.
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    hy, wy = h // 2, w // 2
    ty = th // 2
    wdt = w2p_ref.dtype

    def up2x(y5):
        """[1, 1, R, Wy, 64] block value -> [2R, W, 64] nearest.
        Interleave via concat + reshape: the broadcast_to form is an
        unsupported Mosaic shape cast. Works on the un-squeezed 5-D
        block value: squeezing first fuses with the unit-dim insert
        into a (1,1,R,Wy,64)->(R,Wy,1,64) cast Mosaic rejects, while
        the pure leading-dim squeeze after the column merge is fine."""
        r = y5.shape[2]
        # f32 for the unit-dim insert: the (16,128)-packed bf16 layout
        # cannot express the (.., Wy, 64) -> (.., Wy, 1, 64) cast.
        y = y5.reshape(r, wy, 64).astype(jnp.float32)
        u = jnp.concatenate([y[:, :, None, :], y[:, :, None, :]], axis=2)
        u = u.reshape(r, w, 64)
        u = jnp.concatenate([u[None], u[None]], axis=0)
        return u.transpose(1, 0, 2, 3).reshape(2 * r, w, 64).astype(wdt)

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
        # u_ext rows for z rows [0, th+1): k=0 -> y0 (edge), then repeat.
        u = up2x(y_ref[:, :, 0:ty + 1])               # rows [0, th+2)
        u_ext = edge_cols(jnp.concatenate([u[0:1], u], axis=0))
        z = conv2(u_ext, th + 1)
        tail(_col_reflect(jnp.concatenate([z[1:2], z], axis=0)))

    @pl.when(jnp.logical_and(j > 0, j < nj - 1))
    def _interior():
        # z rows [r0-1, r0+th+1) need u_ext rows [r0-1, r0+th+3), which is
        # exactly the 2x repeat of y rows [r0/2-1, r0/2+th/2+1).
        u_ext = edge_cols(up2x(y_ref[...]))
        tail(_col_reflect(conv2(u_ext, th + 2)))

    @pl.when(jnp.logical_and(j == nj - 1, nj > 1))
    def _bottom():
        u = up2x(y_ref[:, :, 1:ty + 2])               # y rows [hy-ty-1, hy)
        # u rows [h-th-2, h)
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
    w2p / w1p: [6, 128, 64] pair-packed weights (w1p's output channels
        zero-padded 3 -> 64); b1: [64] with the true bias in [:3];
    returns [B, H, W, 3] in ``out_dtype``.
    """
    b_, hy, wy, c = y.shape
    assert c == 64
    h, w = hy * 2, wy * 2
    assert h % th == 0 and th % 2 == 0 and h // th >= 2, (h, th)
    assert hy >= th // 2 + 2, (hy, th)
    nj = h // th
    ty = th // 2
    f32 = jnp.float32
    ys = _strips(y.astype(w2p.dtype), nj, ty + 2, ty, hy - ty - 2)
    return pl.pallas_call(
        functools.partial(_dec_kernel, th=th, h=h, w=w, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((b_, h, w, 3), out_dtype),
        grid=(b_, nj),
        in_specs=[
            pl.BlockSpec((1, 1, ty + 2, wy, 64),
                         lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((6, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
            pl.BlockSpec((6, 128, 64), lambda b, j: (0, 0, 0)),
            pl.BlockSpec((64,), lambda b, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th, w, 3), lambda b, j: (b, j, 0, 0)),
        interpret=interpret,
    )(ys, w2p, b2.astype(f32), w1p, b1.astype(f32))

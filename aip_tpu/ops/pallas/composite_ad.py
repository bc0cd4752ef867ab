"""Differentiable Pallas compositing: custom-VJP forward/backward kernels.

The training-path profile shows the composite *backward* dominating the 3DGS
step (BENCHMARKS.md): autodiff of the dense [tiles, K, 256] cumprod pipeline
materializes several such tensors. These kernels stream each tile through
VMEM instead:

* forward: the same front-to-back walk as `composite.py`, but also emitting
  the per-tile final transmittance (the backward's seed);
* backward: one reverse walk per tile carrying the suffix color accumulator
  S_k = sum_{j>k} w_j c_j and reconstructing the exclusive transmittance
  T_k = T_{k+1 onwards} / (1 - alpha_k), producing analytic gradients for
  the gathered per-tile mean/conic/color/opacity arrays. The gather's own
  transpose (scatter-add back to per-Gaussian arrays) stays in XLA.

Gradient identities (per tile, pixel p dropped for brevity):
  out = sum_k alpha_k T_k c_k + T_final bg,  T_k = prod_{j<k} (1 - alpha_j)
  dL/dc_k     = g . (alpha_k T_k)
  dL/dalpha_k = g . (T_k c_k - (S_k + T_final bg) / (1 - alpha_k))
then alpha = min(0.99, op exp(power)), power = -(a dx^2 + c dy^2)/2 - b dxdy
chains into d op, d conic, d mean (and the alpha clamp/cutoff zero the
gradient exactly where the forward clamped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16


def _alpha_terms(mean_ref, conic_ref, op_ref, valid_ref, i, px, py):
    mx = mean_ref[i, 0]
    my = mean_ref[i, 1]
    ca = conic_ref[i, 0]
    cb = conic_ref[i, 1]
    cc = conic_ref[i, 2]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    power_c = jnp.minimum(power, 0.0)
    raw = op_ref[i, 0] * jnp.exp(power_c)
    alpha = jnp.minimum(0.99, raw)
    live = (valid_ref[i, 0] > 0) & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(live, alpha, 0.0)
    # Gradient gates: clamp at 0.99 and the power clamp kill those paths.
    dalpha_draw = jnp.where(live & (raw < 0.99), 1.0, 0.0)
    dpower_gate = jnp.where(power < 0.0, 1.0, 0.0)
    return alpha, raw, dalpha_draw, dpower_gate, dx, dy


def _make_fwd_kernel(tile_w: int):
    def kernel(mean_ref, conic_ref, color_ref, op_ref, valid_ref, bg_ref,
               out_ref, tfin_ref):
        k = mean_ref.shape[0]
        tile_id = pl.program_id(0)
        x0 = ((tile_id % tile_w) * TILE).astype(jnp.float32)
        y0 = ((tile_id // tile_w) * TILE).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(jnp.float32)
        px = col + x0
        py = row + y0

        def body(i, carry):
            trans, r, g, b = carry
            alpha, _, _, _, _, _ = _alpha_terms(mean_ref, conic_ref, op_ref,
                                                valid_ref, i, px, py)
            contrib = jnp.where(trans > 1e-4, alpha * trans, 0.0)
            r = r + contrib * color_ref[i, 0]
            g = g + contrib * color_ref[i, 1]
            b = b + contrib * color_ref[i, 2]
            return trans * (1.0 - alpha), r, g, b

        zeros = jnp.zeros((TILE, TILE), jnp.float32)
        trans, r, g, b = jax.lax.fori_loop(
            0, k, body, (jnp.ones((TILE, TILE), jnp.float32), zeros, zeros, zeros))
        out_ref[0] = r + trans * bg_ref[0, 0]
        out_ref[1] = g + trans * bg_ref[0, 1]
        out_ref[2] = b + trans * bg_ref[0, 2]
        tfin_ref[:, :] = trans

    return kernel


def _make_bwd_kernel(tile_w: int):
    def kernel(mean_ref, conic_ref, color_ref, op_ref, valid_ref, bg_ref,
               tfin_ref, gout_ref,
               dmean_ref, dconic_ref, dcolor_ref, dop_ref):
        k = mean_ref.shape[0]
        tile_id = pl.program_id(0)
        x0 = ((tile_id % tile_w) * TILE).astype(jnp.float32)
        y0 = ((tile_id // tile_w) * TILE).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(jnp.float32)
        px = col + x0
        py = row + y0

        g_r = gout_ref[0]
        g_g = gout_ref[1]
        g_b = gout_ref[2]
        t_final = tfin_ref[:, :]
        bg_r = bg_ref[0, 0]
        bg_g = bg_ref[0, 1]
        bg_b = bg_ref[0, 2]

        def body(j, carry):
            # Walk back to front: i = k-1-j. Per-candidate gradients
            # accumulate in a carried [k, 16] matrix (Mosaic cannot store
            # scalars into VMEM at dynamic indices; dynamic_update_slice on
            # a carried vector value is supported).
            t_after, s_r, s_g, s_b, grads = carry
            i = k - 1 - j
            alpha, raw, d_raw_gate, d_pow_gate, dx, dy = _alpha_terms(
                mean_ref, conic_ref, op_ref, valid_ref, i, px, py)
            one_m = 1.0 - alpha
            t_exc = t_after / one_m  # exclusive transmittance before i
            # Forward used contrib only while t_exc > 1e-4.
            live = jnp.where(t_exc > 1e-4, 1.0, 0.0)
            w = alpha * t_exc * live

            c_r = color_ref[i, 0]
            c_g = color_ref[i, 1]
            c_b = color_ref[i, 2]

            # Suffix term: everything behind i (incl. background) scales by
            # 1/(1-alpha_i) when alpha_i changes.
            suffix_r = s_r + t_final * bg_r
            suffix_g = s_g + t_final * bg_g
            suffix_b = s_b + t_final * bg_b
            dalpha_pix = (
                g_r * (t_exc * c_r - suffix_r / one_m)
                + g_g * (t_exc * c_g - suffix_g / one_m)
                + g_b * (t_exc * c_b - suffix_b / one_m)
            ) * live

            # Chain into op / power.
            d_raw = dalpha_pix * d_raw_gate          # d alpha / d raw in {0,1}
            exp_pow = jnp.where(op_ref[i, 0] != 0.0, raw / op_ref[i, 0], 0.0)
            d_power = d_raw * raw * d_pow_gate       # d raw/d power = raw

            ca = conic_ref[i, 0]
            cb = conic_ref[i, 1]
            cc = conic_ref[i, 2]
            row = jnp.stack([
                jnp.sum(d_power * (ca * dx + cb * dy)),   # d mean x
                jnp.sum(d_power * (cc * dy + cb * dx)),   # d mean y
                jnp.sum(d_power * (-0.5 * dx * dx)),      # d conic a
                jnp.sum(d_power * (-dx * dy)),            # d conic b
                jnp.sum(d_power * (-0.5 * dy * dy)),      # d conic c
                jnp.sum(g_r * w),                          # d color r
                jnp.sum(g_g * w),                          # d color g
                jnp.sum(g_b * w),                          # d color b
                jnp.sum(d_raw * exp_pow),                  # d opacity
            ]).reshape(1, 9)
            # One-hot accumulate (Mosaic supports neither scalar VMEM stores
            # nor dynamic_update_slice on vector values).
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) == i
                      ).astype(jnp.float32)
            grads = grads + onehot * row

            # Update suffix accumulators with THIS candidate's contribution.
            s_r = s_r + w * c_r
            s_g = s_g + w * c_g
            s_b = s_b + w * c_b
            return t_exc, s_r, s_g, s_b, grads

        zeros = jnp.zeros((TILE, TILE), jnp.float32)
        _t, _r, _g, _b, grads = jax.lax.fori_loop(
            0, k, body,
            (t_final, zeros, zeros, zeros, jnp.zeros((k, 9), jnp.float32)))
        dmean_ref[:, :] = grads[:, 0:2]
        dconic_ref[:, :] = grads[:, 2:5]
        dcolor_ref[:, :] = grads[:, 5:8]
        dop_ref[:, :] = grads[:, 8:9]

    return kernel


def _pallas_fwd(g_mean, g_conic, g_color, g_op, g_valid, bg, tile_w, interpret):
    t, k, _ = g_mean.shape
    return pl.pallas_call(
        _make_fwd_kernel(tile_w),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((None, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 3, TILE, TILE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, 3, TILE, TILE), jnp.float32),
            jax.ShapeDtypeStruct((t, TILE, TILE), jnp.float32),
        ),
        interpret=interpret,
    )(g_mean, g_conic, g_color, g_op, g_valid, bg)


def _pallas_bwd(g_mean, g_conic, g_color, g_op, g_valid, bg, t_final, g_out,
                tile_w, interpret):
    t, k, _ = g_mean.shape
    return pl.pallas_call(
        _make_bwd_kernel(tile_w),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((None, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, TILE, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, TILE, TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 3), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 3), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 1), jnp.float32),
        ),
        interpret=interpret,
    )(g_mean, g_conic, g_color, g_op, g_valid, bg, t_final, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def composite_tiles_ad(g_mean, g_conic, g_color, g_op, g_valid, tile_w,
                       interpret, bg):
    """Differentiable streamed compositing. Inputs are the gathered per-tile
    arrays ([T, K, .]); returns [T, 3, TILE, TILE]."""
    out, _ = _pallas_fwd(g_mean, g_conic, g_color, g_op, g_valid, bg,
                         tile_w, interpret)
    return out


def _ad_fwd(g_mean, g_conic, g_color, g_op, g_valid, tile_w, interpret, bg):
    out, t_final = _pallas_fwd(g_mean, g_conic, g_color, g_op, g_valid, bg,
                               tile_w, interpret)
    return out, (g_mean, g_conic, g_color, g_op, g_valid, bg, t_final)


def _ad_bwd(tile_w, interpret, res, g_out):
    g_mean, g_conic, g_color, g_op, g_valid, bg, t_final = res
    dmean, dconic, dcolor, dop = _pallas_bwd(
        g_mean, g_conic, g_color, g_op, g_valid, bg, t_final, g_out,
        tile_w, interpret)
    return (dmean, dconic, dcolor, dop, jnp.zeros_like(g_valid), None)


composite_tiles_ad.defvjp(_ad_fwd, _ad_bwd)

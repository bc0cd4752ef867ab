"""Farneback dense optical flow (polynomial expansion), cv2-parity.

The reference's default flow algorithm (`video/utils.py:79-81`):
``cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 5, 15, 3, 7, 1.5, 0)``.
This is a from-the-paper implementation (Farneback 2003, "Two-Frame Motion
Estimation Based on Polynomial Expansion") following OpenCV's algorithmic
choices so `cv2` can serve as a numerical oracle (tests/test_flow_ops.py):

* polynomial expansion — each neighborhood fit as
  ``f(x) ~ x^T A x + b^T x + c`` by Gaussian-weighted least squares over a
  ``(2n+1)^2`` window; with the separable weight the normal equations
  decouple so the coefficients come from six separable correlations and
  four scalars of the inverted 6x6 Gram matrix (ig11/ig03/ig33/ig55);
* displacement update — ``A = (A1 + warp(A2))/2``,
  ``db = (b1 - warp(b2))/2 + A d~``, accumulate ``G = A^T A``, ``h = A db``
  over a ``winsize`` box window, solve the 2x2 system per pixel with
  OpenCV's ``+1e-3`` determinant damping, recompute matrices between
  iterations (one-iteration lag, exactly like
  ``FarnebackUpdateFlow_Blur``);
* border damping — matrix entries within 5 px of the border scaled by
  OpenCV's {0.14, 0.14, 0.4472, 0.4472, 0.4472} ramp;
* pyramid — per-level Gaussian presmooth with ``sigma=(1/scale-1)*0.5``
  then bilinear resize of the ORIGINAL frames (not a recursive pyrDown),
  flow upscaled bilinearly and multiplied by ``1/pyr_scale``.

Design for TPU: every stage is a static-shape separable correlation,
bilinear gather, or elementwise solve — one fused XLA program per level,
vmappable over frame batches (the video pipeline maps it over all frame
pairs at once). Levels whose size would degenerate (<8 px) are dropped at
trace time like OpenCV's level clamp.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.ops.flow import rgb_to_gray


def _prepare_gaussian(n: int, sigma: float):
    """OpenCV FarnebackPrepareGaussian: the weight kernels and the four
    independent entries of the inverted basis Gram matrix."""
    if sigma < 1e-6:
        sigma = n * 0.3
    k = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(k * k) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = k * g
    xxg = k * k * g

    # 6x6 Gram of basis (1, x, y, x^2, y^2, xy) under w(x,y)=g(x)g(y).
    G = np.zeros((6, 6))
    for y in k.astype(int):
        for x in k.astype(int):
            w = g[y + n] * g[x + n]
            b = np.array([1.0, x, y, x * x, y * y, x * y])
            G += w * np.outer(b, b)
    invG = np.linalg.inv(G)
    return (g, xg, xxg,
            invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5])


def _corr1d(x: jax.Array, kernel: np.ndarray, axis: int) -> jax.Array:
    """Separable correlation along one axis with replicate borders.
    x: [H, W]; kernel ordered k=-n..n."""
    n = len(kernel) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (n, n)
    xp = jnp.pad(x, pad, mode="edge")
    k = jnp.asarray(kernel, x.dtype)
    if axis == 0:
        kern = k[:, None, None, None]    # HWIO
    else:
        kern = k[None, :, None, None]
    return jax.lax.conv_general_dilated(
        xp[None, :, :, None], kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def poly_expansion(img: jax.Array, n: int, sigma: float) -> jax.Array:
    """[H, W] -> [H, W, 5] per-pixel quadratic fit
    (b1, b2, a11, a22, 2*a12), OpenCV channel convention."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _prepare_gaussian(n, sigma)

    # Vertical pass: plain / first- / second-moment smoothing.
    v0 = _corr1d(img, g, 0)
    v1 = _corr1d(img, xg, 0)
    v2 = _corr1d(img, xxg, 0)
    # Horizontal pass completes the six projections <w * basis * f>.
    p1 = _corr1d(v0, g, 1)
    px = _corr1d(v0, xg, 1)
    py = _corr1d(v1, g, 1)
    pxx = _corr1d(v0, xxg, 1)
    pyy = _corr1d(v2, g, 1)
    pxy = _corr1d(v1, xg, 1)

    b1 = ig11 * px
    b2 = ig11 * py
    a11 = ig33 * pxx + ig03 * p1
    a22 = ig33 * pyy + ig03 * p1
    axy = ig55 * pxy
    return jnp.stack([b1, b2, a11, a22, axy], axis=-1)


def _border_scale(h: int, w: int) -> np.ndarray:
    """OpenCV's 5px border damping ramp for the update matrices."""
    ramp = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)
    sy = np.ones(h, np.float32)
    sx = np.ones(w, np.float32)
    m = min(5, (h + 1) // 2)
    sy[:m] = ramp[:m]
    sy[h - m:] = ramp[:m][::-1]
    m = min(5, (w + 1) // 2)
    sx[:m] = ramp[:m]
    sx[w - m:] = ramp[:m][::-1]
    return sy[:, None] * sx[None, :]


def _bilinear5(R: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear-sample the 5-channel expansion at (ys, xs), clamped."""
    h, w = R.shape[0], R.shape[1]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    v00 = R[y0, x0]
    v01 = R[y0, x0 + 1]
    v10 = R[y0 + 1, x0]
    v11 = R[y0 + 1, x0 + 1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _update_matrices(R0: jax.Array, R1: jax.Array, flow: jax.Array,
                     border: jax.Array) -> jax.Array:
    """FarnebackUpdateMatrices: [H, W, 5] (g11, g12, g22, h1, h2)."""
    h, w = flow.shape[0], flow.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx = flow[..., 0]
    dy = flow[..., 1]
    R1w = _bilinear5(R1, ys + dy, xs + dx)

    r4 = (R0[..., 2] + R1w[..., 2]) * 0.5
    r5 = (R0[..., 3] + R1w[..., 3]) * 0.5
    r6 = (R0[..., 4] + R1w[..., 4]) * 0.25   # channel stores 2*a12
    r2 = (R0[..., 0] - R1w[..., 0]) * 0.5 + r4 * dx + r6 * dy
    r3 = (R0[..., 1] - R1w[..., 1]) * 0.5 + r6 * dx + r5 * dy

    r2 = r2 * border
    r3 = r3 * border
    r4 = r4 * border
    r5 = r5 * border
    r6 = r6 * border

    return jnp.stack([
        r4 * r4 + r6 * r6,        # g11
        (r4 + r5) * r6,           # g12
        r5 * r5 + r6 * r6,        # g22
        r4 * r2 + r6 * r3,        # h1
        r6 * r2 + r5 * r3,        # h2
    ], axis=-1)


def _box_blur(M: jax.Array, winsize: int) -> jax.Array:
    """Normalized box filter over [H, W, C] with replicate borders."""
    n = winsize // 2
    ones = np.ones(2 * n + 1, np.float32) / (2 * n + 1)
    flat = M.transpose(2, 0, 1)
    out = jax.vmap(lambda x: _corr1d(_corr1d(x, ones, 0), ones, 1))(flat)
    return out.transpose(1, 2, 0)


def _solve_flow(M: jax.Array) -> jax.Array:
    g11 = M[..., 0]
    g12 = M[..., 1]
    g22 = M[..., 2]
    h1 = M[..., 3]
    h2 = M[..., 4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    return jnp.stack([(g22 * h1 - g12 * h2) * idet,
                      (g11 * h2 - g12 * h1) * idet], axis=-1)


def _gaussian_blur(x: jax.Array, sigma: float) -> jax.Array:
    if sigma <= 0:
        return x
    # OpenCV: smooth_sz = round(sigma*5) | 1, at least 3.
    sz = max(int(round(sigma * 5)) | 1, 3)
    n = sz // 2
    k = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(k * k) / (2.0 * sigma * sigma))
    g /= g.sum()
    return _corr1d(_corr1d(x, g, 0), g, 1)


@functools.partial(jax.jit,
                   static_argnames=("pyr_scale", "levels", "winsize",
                                    "iterations", "poly_n", "poly_sigma"))
def estimate_flow_farneback(frame1: jax.Array, frame2: jax.Array,
                            pyr_scale: float = 0.5, levels: int = 5,
                            winsize: int = 15, iterations: int = 3,
                            poly_n: int = 7, poly_sigma: float = 1.5
                            ) -> jax.Array:
    """Dense flow frame1 -> frame2, [H, W, 2] (dx, dy). Defaults are the
    reference's exact cv2 call (`video/utils.py:81`)."""
    g0 = rgb_to_gray(frame1.astype(jnp.float32))
    g1 = rgb_to_gray(frame2.astype(jnp.float32))
    if frame1.dtype in (jnp.float32, jnp.float64, jnp.bfloat16):
        # cv2 operates on 0..255 grayscale; match its conditioning (the
        # determinant damping +1e-3 is tuned for that range).
        g0 = g0 * 255.0
        g1 = g1 * 255.0
    h, w = g0.shape

    # OpenCV level clamp (optflowgf.cpp min_size = 32): stop once a level
    # side would drop under 32 px — deeper sub-32 levels alias on fine
    # texture and seed displacements the oracle never produces.
    n_levels = 0
    scale = 1.0
    for _ in range(levels):
        if min(h, w) * scale * pyr_scale < 32:
            break
        scale *= pyr_scale
        n_levels += 1

    flow = None
    for k in range(n_levels, -1, -1):
        scale = pyr_scale ** k
        lh, lw = int(round(h * scale)), int(round(w * scale))
        sigma = (1.0 / scale - 1.0) * 0.5
        from aip_tpu.ops.image import resize_bilinear

        i0 = resize_bilinear(_gaussian_blur(g0, sigma)[None, ..., None],
                             (lh, lw))[0, ..., 0]
        i1 = resize_bilinear(_gaussian_blur(g1, sigma)[None, ..., None],
                             (lh, lw))[0, ..., 0]
        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            flow = resize_bilinear(flow[None], (lh, lw))[0] * (1.0 / pyr_scale)

        R0 = poly_expansion(i0, poly_n, poly_sigma)
        R1 = poly_expansion(i1, poly_n, poly_sigma)
        border = jnp.asarray(_border_scale(lh, lw))

        M = _update_matrices(R0, R1, flow, border)
        for i in range(iterations):
            flow = _solve_flow(_box_blur(M, winsize))
            if i < iterations - 1:
                M = _update_matrices(R0, R1, flow, border)
    return flow

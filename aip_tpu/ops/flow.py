"""Dense optical flow and image warping, fully in JAX.

TPU-native replacement for the reference's OpenCV CPU flow
(`video/utils.py:75-86` Farneback / DualTVL1) and `warp_image` (:89-105,
cv2.remap bilinear with reflected borders). The estimator is a coarse-to-fine
pyramidal Lucas-Kanade: Gaussian pyramid, per-level iterative LK refinement
with a box-integrated structure tensor — every step is convolutions,
elementwise algebra and gathers, so the whole flow computation jit-compiles
into one XLA program and batches over frame pairs with vmap.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma (cv2.COLOR_RGB2GRAY parity). [..., 3] -> [...]."""
    return 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]


def _conv2_same(x: jax.Array, k: np.ndarray) -> jax.Array:
    """Single-channel 2D convolution with edge padding. x: [H, W]."""
    kh, kw = k.shape
    xp = jnp.pad(x, ((kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp[None, :, :, None],
        jnp.asarray(k, jnp.float32)[:, :, None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]


_GAUSS5 = (np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]) / 256.0).astype(np.float32)


def _downsample2(x: jax.Array) -> jax.Array:
    return _conv2_same(x, _GAUSS5)[::2, ::2]


def _reflect_coords(ys, xs, h, w):
    def reflect(i, n):
        # BORDER_REFLECT (gfedcb|abcdefgh|gfedcba): period 2n, mirror without
        # repeating the edge sample of cv2's REFLECT_101? cv2 BORDER_REFLECT
        # duplicates the edge: indices ...2,1,0,0,1,2...
        i = jnp.abs(i + 0.0)
        period = 2.0 * n
        i = jnp.mod(i, period)
        return jnp.where(i > n - 1, period - 1 - i, i)

    return reflect(ys, h), reflect(xs, w)


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img ([H, W] or [H, W, C]) at float coords with reflect border.

    cv2.remap(INTER_LINEAR, BORDER_REFLECT) parity. Four scalar-corner
    gathers — robust everywhere; hot inner loops use
    ``bilinear_sample_patch`` (4x fewer gathered slices, but large batched
    instances of that gather shape have crashed the TPU compiler outside
    the TV-L1 program, so it is opt-in).
    """
    h, w = img.shape[0], img.shape[1]
    yr, xr = _reflect_coords(ys, xs, h, w)
    y0 = jnp.clip(jnp.floor(yr), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xr), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = (yr - y0)[..., None] if img.ndim == 3 else yr - y0
    fx = (xr - x0)[..., None] if img.ndim == 3 else xr - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def bilinear_sample_patch(img: jax.Array, ys: jax.Array,
                          xs: jax.Array) -> jax.Array:
    """``bilinear_sample`` with all four corners fetched as ONE
    (2, 2, C)-slice gather (TPU gather cost is per gathered slice). Used
    by the TV-L1 warp loop; see bilinear_sample for why it is opt-in."""
    h, w = img.shape[0], img.shape[1]
    if h < 2 or w < 2:
        # The (2, 2, C) static slice needs both dims >= 2 (ys0 = min(y0,
        # h-2) would go to -1); degenerate inputs (e.g. an over-deep
        # pyramid on a tiny frame) take the scalar-corner path instead.
        return bilinear_sample(img, ys, xs)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]

    yr, xr = _reflect_coords(ys, xs, h, w)
    y0 = jnp.clip(jnp.floor(yr), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xr), 0, w - 1)
    fy = (yr - y0)[..., None]
    fx = (xr - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # All four corners in ONE (2, 2[, C])-slice gather: TPU gather cost is
    # per gathered slice, so this is 4x cheaper than four scalar-corner
    # gathers. Slice starts clamp to h-2/w-2; when the start shifted
    # (y0 == h-1 / x0 == w-1, where the clipped far corner duplicates the
    # edge), the local offset o* flips to row/col 1 — the far corner is
    # always local index 1 either way.
    ys0 = jnp.minimum(y0i, h - 2)
    xs0 = jnp.minimum(x0i, w - 2)
    oy = y0i - ys0  # 0 or 1
    ox = x0i - xs0
    starts = jnp.stack([ys0, xs0], axis=-1)
    nb = ys0.ndim
    c = img.shape[2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(nb, nb + 1, nb + 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.lax.gather(img, starts, dnums, (2, 2, c),
                           mode=jax.lax.GatherScatterMode.CLIP)
    oy = oy[..., None]
    ox = ox[..., None]
    s00 = patch[..., 0, 0, :]
    s01 = patch[..., 0, 1, :]
    s10 = patch[..., 1, 0, :]
    s11 = patch[..., 1, 1, :]
    v00 = jnp.where(oy == 0, jnp.where(ox == 0, s00, s01),
                    jnp.where(ox == 0, s10, s11))
    v01 = jnp.where(oy == 0, s01, s11)
    v10 = jnp.where(ox == 0, s10, s11)
    v11 = s11
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out[..., 0] if squeeze else out


def warp_image(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp ``image`` by ``flow`` [H, W, 2] (dx, dy), remap parity
    (`video/utils.py:89-105`)."""
    h, w = image.shape[0], image.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return bilinear_sample(image, ys + flow[..., 1], xs + flow[..., 0])


def _lk_refine(i0: jax.Array, i1: jax.Array, flow: jax.Array,
               win: int = 7, iters: int = 3) -> jax.Array:
    """Iterative dense Lucas-Kanade at one pyramid level. [H, W] grays."""
    h, w = i0.shape
    box = np.ones((win, win), np.float32)

    # Spatial gradients of i0 (central differences).
    kx = np.array([[-0.5, 0.0, 0.5]], np.float32)
    ix = _conv2_same(i0, kx)
    iy = _conv2_same(i0, kx.T)

    ixx = _conv2_same(ix * ix, box)
    ixy = _conv2_same(ix * iy, box)
    iyy = _conv2_same(iy * iy, box)
    det = ixx * iyy - ixy * ixy
    # Scale-aware Tikhonov floor: tiny relative to the structure tensor so
    # well-conditioned pixels converge in few iterations.
    eps = 1e-6 * (1.0 + ixx + iyy) ** 2 + 1e-12
    inv00 = iyy / (det + eps)
    inv01 = -ixy / (det + eps)
    inv11 = ixx / (det + eps)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def body(_, flow):
        i1w = bilinear_sample(i1, ys + flow[..., 1], xs + flow[..., 0])
        it = i1w - i0
        bx = _conv2_same(ix * it, box)
        by = _conv2_same(iy * it, box)
        du = -(inv00 * bx + inv01 * by)
        dv = -(inv01 * bx + inv11 * by)
        good = det > 1e-9
        upd = jnp.stack([jnp.where(good, du, 0.0), jnp.where(good, dv, 0.0)], axis=-1)
        return flow + jnp.clip(upd, -1.5, 1.5)

    return jax.lax.fori_loop(0, iters, body, flow)


@functools.partial(jax.jit, static_argnames=("levels", "win", "iters"))
def estimate_flow(frame1: jax.Array, frame2: jax.Array,
                  levels: int = 4, win: int = 9, iters: int = 6) -> jax.Array:
    """Dense flow frame1 -> frame2 for [H, W, 3] float images in [0, 1].

    Returns [H, W, 2] (dx, dy), same convention as cv2.calcOpticalFlowFarneback.
    Coarse-to-fine pyramidal LK.
    """
    g0 = rgb_to_gray(frame1.astype(jnp.float32))
    g1 = rgb_to_gray(frame2.astype(jnp.float32))

    pyr0, pyr1 = [g0], [g1]
    for _ in range(levels - 1):
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))

    flow = jnp.zeros((*pyr0[-1].shape, 2), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        flow = _lk_refine(pyr0[lvl], pyr1[lvl], flow, win, iters)
        if lvl > 0:
            th, tw = pyr0[lvl - 1].shape
            from aip_tpu.ops.image import resize_bilinear

            flow = resize_bilinear(flow[None], (th, tw))[0] * 2.0
    return flow


def blend_images(stylized: jax.Array, warped: jax.Array, alpha: float) -> jax.Array:
    """`video/utils.py:223-229` parity: alpha*stylized + (1-alpha)*warped."""
    return jnp.clip(alpha * stylized + (1.0 - alpha) * warped, 0.0, 1.0)


# ---------------------------------------------------------------------------
# TV-L1 (Zach-Pock-Bischof) — the reference's DualTVL1 default
# (`video/utils.py:75-86`, cv2.optflow.DualTVL1OpticalFlow). Primal-dual:
# per warp, a pointwise thresholding step on the linearized data term and a
# Chambolle dual ascent for the TV prior. Everything is elementwise algebra +
# gathers, so it jit-compiles and vmaps like the LK path.
# ---------------------------------------------------------------------------

def _grad_fwd(x: jax.Array):
    """Forward differences with Neumann boundary (zero at the far edge)."""
    gx = jnp.diff(x, axis=1, append=x[:, -1:])
    gy = jnp.diff(x, axis=0, append=x[-1:, :])
    return gx, gy


def _div(px: jax.Array, py: jax.Array) -> jax.Array:
    """Backward divergence, the negative adjoint of ``_grad_fwd``."""
    dx = px - jnp.roll(px, 1, axis=1)
    dx = dx.at[:, 0].set(px[:, 0]).at[:, -1].set(-px[:, -2])
    dy = py - jnp.roll(py, 1, axis=0)
    dy = dy.at[0, :].set(py[0, :]).at[-1, :].set(-py[-2, :])
    return dx + dy


def _tvl1_level(i0, i1, flow, warps, iters, lam, theta, tau):
    # lam/theta/tau are static floats (estimate_flow_tvl1 marks them
    # static) so the Pallas inner kernel can close over them.
    h, w = i0.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    kx = np.array([[-0.5, 0.0, 0.5]], np.float32)
    i1x_full = _conv2_same(i1, kx)
    i1y_full = _conv2_same(i1, kx.T)
    fields = jnp.stack([i1, i1x_full, i1y_full], axis=-1)  # [H, W, 3]
    l_t = lam * theta
    taut = tau / theta

    def warp_body(_, carry):
        u1, u2, p = carry
        u1_0 = jax.lax.stop_gradient(u1)
        u2_0 = jax.lax.stop_gradient(u2)
        # One 3-channel gather instead of three scalar gathers: TPU gather
        # cost is per gathered slice, so packing the image and its two
        # gradient fields into the channel dim cuts the warp cost 3x.
        sampled = bilinear_sample_patch(fields, ys + u2_0, xs + u1_0)
        i1w = sampled[..., 0]
        i1wx = sampled[..., 1]
        i1wy = sampled[..., 2]
        grad2 = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u1_0 - i1wy * u2_0 - i0

        # On TPU the whole inner recursion runs as one Pallas kernel per
        # warp (fields stay in VMEM for all iterations; ops/pallas/tvl1.py)
        # — the XLA loop splits each iteration into several
        # HBM-round-tripping stencil kernels. Dispatch is platform-resolved
        # at lowering (lax.platform_dependent), not via the process-global
        # default backend, so CPU-placed jits and AOT lowering pick right.
        def pallas_branch(rho_c, i1wx, i1wy, grad2, u1, u2, p):
            from aip_tpu.ops.pallas.tvl1 import tvl1_inner_pallas

            u1n, u2n, pn = tvl1_inner_pallas(
                rho_c[None], i1wx[None], i1wy[None], grad2[None],
                u1[None], u2[None], tuple(x[None] for x in p),
                iters, l_t, theta, taut)
            return u1n[0], u2n[0], tuple(x[0] for x in pn)

        def inner(_, carry):
            u1, u2, p = carry
            rho = rho_c + i1wx * u1 + i1wy * u2
            mask_lo = rho < -l_t * grad2
            mask_hi = rho > l_t * grad2
            safe = jnp.maximum(grad2, 1e-8)
            d1 = jnp.where(mask_lo, l_t * i1wx,
                           jnp.where(mask_hi, -l_t * i1wx, -rho * i1wx / safe))
            d2 = jnp.where(mask_lo, l_t * i1wy,
                           jnp.where(mask_hi, -l_t * i1wy, -rho * i1wy / safe))
            v1 = u1 + d1
            v2 = u2 + d2
            # TV denoise each flow component via one Chambolle dual step.
            p11, p12, p21, p22 = p
            u1 = v1 + theta * _div(p11, p12)
            u2 = v2 + theta * _div(p21, p22)
            u1x, u1y = _grad_fwd(u1)
            u2x, u2y = _grad_fwd(u2)
            n1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            n2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            p = ((p11 + taut * u1x) / n1, (p12 + taut * u1y) / n1,
                 (p21 + taut * u2x) / n2, (p22 + taut * u2y) / n2)
            return u1, u2, p

        def xla_branch(rho_c, i1wx, i1wy, grad2, u1, u2, p):
            del rho_c, i1wx, i1wy, grad2  # closed over by `inner`
            return jax.lax.fori_loop(0, iters, inner, (u1, u2, p))

        return jax.lax.platform_dependent(
            rho_c, i1wx, i1wy, grad2, u1, u2, p,
            tpu=pallas_branch, default=xla_branch)

    zeros = jnp.zeros((h, w), jnp.float32)
    u1, u2, _p = jax.lax.fori_loop(
        0, warps, warp_body,
        (flow[..., 0], flow[..., 1], (zeros, zeros, zeros, zeros)))
    return jnp.stack([u1, u2], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("levels", "warps", "iters", "lam",
                                    "theta", "tau"))
def estimate_flow_tvl1(frame1: jax.Array, frame2: jax.Array,
                       levels: int = 4, warps: int = 5, iters: int = 300,
                       lam: float = 0.15, theta: float = 0.3,
                       tau: float = 0.25) -> jax.Array:
    """DualTVL1-style dense flow frame1 -> frame2, [H, W, 2] (dx, dy).

    Zach-Pock-Bischof primal-dual TV-L1; validated against a straight-line
    numpy implementation of the published scheme (IPOL, Sanchez et al.
    Algorithm 1 — tests/test_flow_ops.py `_np_tvl1_level`) and against
    synthetic ground-truth flow (mean EPE < 0.25 px on translations).
    PARAMETERS mirror cv2 DualTVL1's defaults (lambda 0.15, theta 0.3,
    tau 0.25, 5 warps, 300 = outer 10 x inner 30 iterations per warp — TV
    information propagates one pixel per iteration, so the full budget is
    needed for convergence), but this is not a bit-for-bit cv2 port:
    median filtering is omitted (the TV prior already regularizes) and
    fixed trip counts replace cv2's epsilon exit to keep the program a
    static-shape lax.fori_loop nest for XLA (cv2.optflow is absent in this
    environment, so no direct cv2 oracle exists — unlike Farneback)."""
    g0 = rgb_to_gray(frame1.astype(jnp.float32))
    g1 = rgb_to_gray(frame2.astype(jnp.float32))

    pyr0, pyr1 = [g0], [g1]
    for _ in range(levels - 1):
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))

    flow = jnp.zeros((*pyr0[-1].shape, 2), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        flow = _tvl1_level(pyr0[lvl], pyr1[lvl], flow, warps, iters,
                           lam, theta, tau)
        if lvl > 0:
            th, tw = pyr0[lvl - 1].shape
            from aip_tpu.ops.image import resize_bilinear

            flow = resize_bilinear(flow[None], (th, tw))[0] * 2.0
    return flow


def _farneback(frame1, frame2, **kw):
    from aip_tpu.ops.farneback import estimate_flow_farneback

    return estimate_flow_farneback(frame1, frame2, **kw)


FLOW_METHODS = {"lk": estimate_flow, "tvl1": estimate_flow_tvl1,
                "farneback": _farneback}


def estimate_flow_method(frame1, frame2, method: str = "farneback", **kw):
    """Dispatch on flow algorithm (`video/utils.py:75-86`'s
    Farneback-vs-DualTVL1 switch; Farneback is the reference's
    `estimate_optical_flow` default, plus TV-L1 and pyramidal LK)."""
    return FLOW_METHODS[method](frame1, frame2, **kw)

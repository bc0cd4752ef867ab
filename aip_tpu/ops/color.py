"""Color-space transforms and distribution matching (Reinhard lab, PCA, CDF).

Parity targets in `Style_3DGS/localized_style_transfer.py`:
* RGB_TO_LMS / LMS_TO_LAB matrices (:12-19),
* rgb_to_lab / lab_to_rgb (:22-89) — log-LMS "lab" space (Reinhard et al.),
* apply_pca (:92-96) — 1-component PCA of lab pixels,
* match_cdf (:99-125) — sort + np.interp quantile matching.

TPU-first: everything here is jittable with *static shapes*. Masked pixel
sets (foreground/background) are handled with weight vectors instead of
boolean fancy-indexing (dynamic shapes don't compile); quantile functions
are resampled onto a fixed K-point grid so CDF matching is a gather + interp
with static shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Reinhard's transform matrices (localized_style_transfer.py:12-19).
RGB_TO_LMS = np.array(
    [[0.3811, 0.5783, 0.0402], [0.1967, 0.7244, 0.0782], [0.0241, 0.1288, 0.8444]]
)
LMS_TO_LAB = np.array(
    [[1 / np.sqrt(3), 0, 0], [0, 1 / np.sqrt(6), 0], [0, 0, 1 / np.sqrt(2)]]
) @ np.array([[1, 1, 1], [1, 1, -2], [1, -1, 0]])
LAB_TO_LMS = np.linalg.inv(LMS_TO_LAB)
LMS_TO_RGB = np.linalg.inv(RGB_TO_LMS)


def rgb_to_lab(rgb01: jax.Array) -> jax.Array:
    """[..., 3] RGB in [0,1] -> Reinhard lab (log-LMS decorrelated)."""
    x = rgb01.astype(jnp.float32)
    lms = x @ jnp.asarray(RGB_TO_LMS.T, jnp.float32)
    lms = jnp.maximum(lms, 1e-6)
    log_lms = jnp.log10(lms)
    return log_lms @ jnp.asarray(LMS_TO_LAB.T, jnp.float32)


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    """Reinhard lab -> [..., 3] RGB in [0,1] (clipped)."""
    log_lms = lab.astype(jnp.float32) @ jnp.asarray(LAB_TO_LMS.T, jnp.float32)
    lms = jnp.power(10.0, log_lms)
    rgb = lms @ jnp.asarray(LMS_TO_RGB.T, jnp.float32)
    return jnp.clip(rgb, 0.0, 1.0)


def weighted_pca1(x: jax.Array, w: jax.Array):
    """1-component weighted PCA of [N, D] points with weights [N] in {0,1}.

    Returns (projection [N], mean [D], component [D]). Matches sklearn
    PCA(n_components=1) fit on the w==1 subset (up to component sign).
    """
    w = w.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    xc = (x - mean) * w[:, None]
    cov = (xc.T @ xc) / n
    # D is tiny (3); closed-form eigendecomposition.
    evals, evecs = jnp.linalg.eigh(cov)
    comp = evecs[:, -1]
    # sklearn sign convention: largest-|.| entry of the component is positive.
    comp = comp * jnp.sign(comp[jnp.argmax(jnp.abs(comp))])
    proj = (x - mean) @ comp
    return proj, mean, comp


def masked_quantile_grid(values: jax.Array, w: jax.Array, k: int = 1024) -> jax.Array:
    """Sample the quantile function of the w==1 subset of ``values`` at k
    uniform positions. Static-shape replacement for "sort the valid pixels".
    """
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    keyed = jnp.where(w > 0, values.astype(jnp.float32), big)
    s = jnp.sort(keyed)
    n = jnp.maximum(jnp.sum(w > 0), 1)
    pos = jnp.linspace(0.0, 1.0, k) * (n - 1).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = pos - lo.astype(jnp.float32)
    return s[lo] * (1.0 - frac) + s[hi] * frac


def masked_cdf_match(
    target: jax.Array,
    target_w: jax.Array,
    source: jax.Array,
    source_w: jax.Array,
    k: int = 1024,
) -> jax.Array:
    """Map ``target`` values so their (masked) CDF matches ``source``'s.

    Parity with reference match_cdf (:99-125): both quantile functions are
    resampled to a common length, then each target value is pushed through
    Q_source(CDF_target(.)) by piecewise-linear interpolation.
    """
    t_grid = masked_quantile_grid(target, target_w, k)
    s_grid = masked_quantile_grid(source, source_w, k)
    return jnp.interp(target.astype(jnp.float32), t_grid, s_grid)


@functools.partial(jax.jit, static_argnames=("k",))
def harmonize_foreground(
    fg_rgb01: jax.Array,
    bg_rgb01: jax.Array,
    fg_mask: jax.Array,
    bg_mask: jax.Array,
    k: int = 1024,
):
    """Recolor fg pixels so their dominant-color distribution matches bg's.

    Full-parity pipeline of ``color_transfer_foreground``
    (localized_style_transfer.py:128-168): lab -> PCA(1) per region ->
    CDF-match fg projection to bg's -> inverse PCA -> RGB. Inputs are HWC
    RGB [0,1] with [H, W] {0,1} masks; returns the recolored fg image (only
    fg_mask pixels changed).
    """
    h, w, _ = fg_rgb01.shape
    fgm = fg_mask.reshape(-1).astype(jnp.float32)
    bgm = bg_mask.reshape(-1).astype(jnp.float32)
    fg_lab = rgb_to_lab(fg_rgb01.reshape(-1, 3))
    bg_lab = rgb_to_lab(bg_rgb01.reshape(-1, 3))

    fg_proj, fg_mean, fg_comp = weighted_pca1(fg_lab, fgm)
    bg_proj, _, _ = weighted_pca1(bg_lab, bgm)

    matched = masked_cdf_match(fg_proj, fgm, bg_proj, bgm, k)
    adjusted_lab = fg_mean + matched[:, None] * fg_comp[None, :]
    adjusted_rgb = lab_to_rgb(adjusted_lab)

    out = jnp.where(fgm[:, None] > 0, adjusted_rgb, fg_rgb01.reshape(-1, 3))
    return out.reshape(h, w, 3)

"""Render a GaussianState through the tile rasterizer with neural colors.

Parity with reference `Style_3DGS/gaussian_renderer/__init__.py:18-130`:
three modes —
* inference (``itr == -1``): raw params, style-conditioned SH from the color
  field (optionally with precomputed hash features);
* train pre-RVQ: STE-mask-gated scales & opacity;
* train RVQ phase: codebook-quantized scales/rotations (mask-gated).

SH -> RGB happens inside this wrapper via eval_sh on the view direction
(the CUDA rasterizer does this internally; same math, reference
`utils/sh_utils.py` + `convert SHs` in the CUDA kernel: clamp(rgb+0.5, min 0)).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aip_tpu.gs import gaussians as G
from aip_tpu.gs.colorfield import ColorFieldParams, predict_sh
from aip_tpu.gs.rasterizer import RasterSettings, rasterize
from aip_tpu.gs import rvq as rvq_mod
from aip_tpu.ops.sh import eval_sh


class RenderOutput(NamedTuple):
    render: jax.Array        # [H, W, 3]
    radii: jax.Array         # [C]
    visibility: jax.Array    # [C] bool


def make_settings(camera, max_per_tile: int = 128, chunk: int = 4096) -> RasterSettings:
    return RasterSettings(
        image_height=camera.image_height,
        image_width=camera.image_width,
        max_per_tile=max_per_tile,
        chunk=chunk,
    )


# Selection-dict keys that map 1:1 onto RasterSettings fields (the schema
# of fit_selection's return value and cfg_args.json["selection"]; absent
# keys keep the RasterSettings defaults, so legacy recorded shapes load).
SELECTION_KEYS = ("macro_capacity", "dup_span", "giant_capacity",
                  "giant_backend", "giant_span", "giant_pool",
                  "giant_pool_full", "giant_tiers")


def settings_from_selection(sel: dict, height: int, width: int,
                            max_per_tile: int = 128, **kw) -> RasterSettings:
    """RasterSettings from a (possibly legacy) selection dict."""
    fields = {k: sel[k] for k in SELECTION_KEYS if k in sel}
    if "giant_tiers" in fields:
        # JSON round-trips tuples as lists; RasterSettings is a jit static
        # arg and must stay hashable.
        fields["giant_tiers"] = tuple(
            (int(s), int(p)) for s, p in fields["giant_tiers"])
    return RasterSettings(image_height=height, image_width=width,
                          max_per_tile=max_per_tile, **fields, **kw)


def fit_selection(state: G.GaussianState, cams, macro: int = 4,
                  sample: int = 8, margin: float = 1.15,
                  lo: int = 1024, hi: int = 4096,
                  max_span: int = 6, opacity_cull: bool = True) -> dict:
    """Fit the pairsort selection shape to the scene's measured demand.

    Returns ``{"macro_capacity", "dup_span", "giant_capacity",
    "giant_tiers", ...}``.

    * ``macro_capacity``: the macro selection keeps only that many
      front-most splats per (macro*16)px block; when per-block demand
      exceeds it, the rearmost splats vanish as screen-aligned rectangles
      (the CUDA rasterizer's per-tile lists are unbounded, reference
      diff-gaussian-rasterization/forward.cu duplicate keys). Fitted to
      max demand * margin, rounded to a multiple of 64 (the MXU composite
      group), clamped to [lo, hi].
    * ``dup_span`` / ``giant_tiers`` / ``giant_pool_full``: splats
      spanning more than dup_span macro blocks emit through anchored
      tiers — and trained real scenes carry MANY such splats (bed_0037
      at 800^2: 13.8k giants at dup_span=2 vs a 128-slot cap, which
      visibly truncated renders). Fitted jointly by minimizing total
      emitted pair slots (the pair sort and emission elementwise work
      scale with slots, sentinels included): normal ``n_alive * d^2`` +
      per anchored tier ``pool * span^2`` + full-grid ``pool_full *
      n_blocks``, over dup_span in [2, max_span] and subsets of up to 3
      anchored tier spans, subject to each pool covering the worst
      measured per-tier count * margin — selection is exact for the
      sampled views. Demand is measured on the opacity-culled radii
      (``selection_radii``) the selection itself uses; the raw 3-sigma
      footprints overfit pools ~1.3x on trained scenes.

    One host-side pre-pass over ``sample`` evenly-spaced cameras
    (summed-area tables over bounding rects); one value set per scene so
    the compiled program stays static across cameras.
    """
    import itertools

    import numpy as np

    from aip_tpu.gs.rasterizer import (TILE, project_gaussians,
                                       selection_radii)

    cams = list(cams)
    if not cams:
        return {"macro_capacity": lo, "dup_span": 2, "giant_capacity": 128,
                "giant_backend": "merge", "max_per_tile": 128}
    step = max(1, len(cams) // sample)
    scales = jnp.exp(state.scaling)
    opac = jax.nn.sigmoid(state.opacity)[:, 0]
    bs = macro * TILE
    worst = 0
    worst_tile = 0
    n_alive_max = 0
    n_blocks_max = 1
    # worst per-supertile giant count for each candidate dup_span
    spans = list(range(2, max_span + 1))
    worst_giants = {d: 0 for d in spans}
    # Anchored-tier candidates: per (cam, dup_span) the count of giants
    # whose clipped rect fits each candidate span (cumulative), plus the
    # total giant count — the host-side subset search below turns these
    # into per-tier exclusive counts.
    tier_spans = [2, 3, 4, 6, 8, 12, 16, 24, 32]
    cum_fit = []   # list over cams of {d: np.array[len(tier_spans)]}
    tot_g = []     # list over cams of {d: int}
    for cam in cams[::step]:
        s = RasterSettings(image_height=cam.image_height,
                           image_width=cam.image_width)
        mean2d, _depths, _conics, radii, valid = project_gaussians(
            state.xyz, scales, state.rotation,
            jnp.asarray(cam.world_view_transform, jnp.float32),
            jnp.asarray(cam.full_proj_transform, jnp.float32),
            math.tan(cam.FoVx * 0.5), math.tan(cam.FoVy * 0.5), s)
        if opacity_cull:
            radii = selection_radii(radii, opac)
        v = (np.asarray(valid & state.active & (opac > 1.0 / 255.0))
             & (np.asarray(radii) > 0))
        mx = np.asarray(mean2d[:, 0])[v]
        my = np.asarray(mean2d[:, 1])[v]
        r = np.asarray(radii)[v]
        n_alive_max = max(n_alive_max, int(v.sum()))
        th = -(-s.image_height // bs)
        tw = -(-s.image_width // bs)
        n_blocks_max = max(n_blocks_max, th * tw)
        # UNCLIPPED span in blocks (matches select_macro_pairsort's
        # normal/giant split, rasterizer.py).
        ux0 = np.floor((mx - r) / bs).astype(int)
        ux1 = np.floor((mx + r) / bs).astype(int)
        uy0 = np.floor((my - r) / bs).astype(int)
        uy1 = np.floor((my + r) / bs).astype(int)
        x0 = np.clip(ux0, 0, tw - 1)
        x1 = np.clip(ux1, 0, tw - 1)
        y0 = np.clip(uy0, 0, th - 1)
        y1 = np.clip(uy1, 0, th - 1)

        def rect_hist(shape, ry0, rx0, ry1, rx1):
            d = np.zeros((shape[0] + 1, shape[1] + 1), np.int64)
            np.add.at(d, (ry0, rx0), 1)
            np.add.at(d, (ry0, rx1 + 1), -1)
            np.add.at(d, (ry1 + 1, rx0), -1)
            np.add.at(d, (ry1 + 1, rx1 + 1), 1)
            return d.cumsum(0).cumsum(1)[: shape[0], : shape[1]]

        worst = max(worst, int(rect_hist((th, tw), y0, x0, y1, x1).max()))

        # Per-16px-TILE demand: sizes max_per_tile (the training composite's
        # dense [tiles, K, 256] K) to the scene instead of a blind 128 —
        # exact when demand is lower AND when it is higher.
        th16 = -(-s.image_height // TILE)
        tw16 = -(-s.image_width // TILE)
        tx0 = np.clip(np.floor((mx - r) / TILE).astype(int), 0, tw16 - 1)
        tx1 = np.clip(np.floor((mx + r) / TILE).astype(int), 0, tw16 - 1)
        ty0 = np.clip(np.floor((my - r) / TILE).astype(int), 0, th16 - 1)
        ty1 = np.clip(np.floor((my + r) / TILE).astype(int), 0, th16 - 1)
        worst_tile = max(worst_tile,
                         int(rect_hist((th16, tw16), ty0, tx0, ty1, tx1).max()))

        # Per-supertile giant counts (mirror the super grid the pairsort
        # selection builds: sb = ceil(max(mth, mtw) / 4)).
        sb = max(1, -(-max(th, tw) // 4))
        sth, stw = -(-th // sb), -(-tw // sb)
        sx0, sx1 = x0 // sb, x1 // sb
        sy0, sy1 = y0 // sb, y1 // sb
        cam_cum = {}
        cam_tot = {}
        for d_span in spans:
            g = (ux1 - ux0 >= d_span) | (uy1 - uy0 >= d_span)
            cam_tot[d_span] = int(g.sum())
            if g.any():
                h = rect_hist((sth, stw), sy0[g], sx0[g], sy1[g], sx1[g])
                worst_giants[d_span] = max(worst_giants[d_span], int(h.max()))
                # Clipped per-axis span: a giant fits anchored tier t iff
                # max(x1-x0, y1-y0) < t (select_macro_pairsort emission).
                cs = np.maximum(x1 - x0, y1 - y0)[g]
                cam_cum[d_span] = np.array(
                    [int((cs < t).sum()) for t in tier_spans])
            else:
                cam_cum[d_span] = np.zeros(len(tier_spans), np.int64)
        cum_fit.append(cam_cum)
        tot_g.append(cam_tot)

    cap = -(-int(worst * margin) // 64) * 64
    kc = max(lo, min(hi, cap))

    def giant_cap(d_span):
        return max(128, -(-int(worst_giants[d_span] * margin) // 64) * 64)

    def bucket(count, floor):
        return max(floor, -(-int(count * margin) // 64) * 64)

    # Direct emission: pairs = normal duplicates + anchored tier slots +
    # full-grid monster slots. Minimizing emitted slots picks dup_span AND
    # the tier set; each pool sizes to the measured per-tier count
    # (+margin for novel views) — exact coverage whenever the live counts
    # stay under the pools (beyond-pool giants drop rearmost-first, like
    # a capped CUDA tile list).
    idx_of = {t: i for i, t in enumerate(tier_spans)}
    useful = [t for t in tier_spans if t * t < n_blocks_max]
    # Each anchored tier adds a depth-compaction sort over N plus its own
    # emission segment; charge slot-equivalents so marginal tiers don't
    # proliferate.
    tier_tax = max(4096, n_alive_max // 4)

    def fit_direct(d, subset):
        cost = n_alive_max * d * d
        pools = []
        for j, t in enumerate(subset):
            w = 0
            for cc in cum_fit:
                c_hi = int(cc[d][idx_of[t]])
                c_lo = int(cc[d][idx_of[subset[j - 1]]]) if j else 0
                w = max(w, c_hi - c_lo)
            p = bucket(w, 128)
            pools.append((t, p))
            cost += p * t * t + tier_tax
        w_far = 0
        for cc, tg in zip(cum_fit, tot_g):
            c_hi = int(cc[d][idx_of[subset[-1]]]) if subset else 0
            w_far = max(w_far, tg[d] - c_hi)
        p_far = bucket(w_far, 64)
        cost += p_far * n_blocks_max
        return cost, tuple(pools), p_far

    best = None
    for d in spans:
        if not useful:
            # Grid too small for any anchored tier to beat full-grid
            # emission (n_blocks <= 4): keep one minimal tier so
            # giant_tiers=() never falls back to the legacy default pool.
            cost, pools, p_far = fit_direct(d, (2,))
            best = min(best, (cost, d, pools, p_far)) if best else (
                cost, d, pools, p_far)
            continue
        for k in range(1, min(3, len(useful)) + 1):
            for subset in itertools.combinations(useful, k):
                cost, pools, p_far = fit_direct(d, subset)
                if best is None or cost < best[0]:
                    best = (cost, d, pools, p_far)
    _, dup, tiers, pool_full = best

    k_tile = max(32, min(512, -(-int(worst_tile * margin) // 32) * 32))
    return {"macro_capacity": kc, "dup_span": dup,
            "giant_capacity": giant_cap(dup),
            "giant_backend": "direct", "giant_tiers": tiers,
            "giant_pool_full": pool_full,
            "max_per_tile": k_tile}


def fit_macro_capacity(state: G.GaussianState, cams, macro: int = 4,
                       sample: int = 8, margin: float = 1.15,
                       lo: int = 1024, hi: int = 4096) -> int:
    """Backward-compatible wrapper: just the fitted macro_capacity (see
    fit_selection)."""
    return fit_selection(state, cams, macro=macro, sample=sample,
                         margin=margin, lo=lo, hi=hi)["macro_capacity"]


def _sh_colors(sh: jax.Array, xyz: jax.Array, campos: jax.Array) -> jax.Array:
    """View-dependent RGB from per-gaussian deg-3 SH (CUDA computeColor
    parity: normalize dir, eval, +0.5, clamp at 0)."""
    dirs = xyz - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    # eval_sh wants [..., C, coeffs]: transpose [N, 16, 3] -> [N, 3, 16].
    rgb = eval_sh(3, jnp.swapaxes(sh, 1, 2), dirs)
    return jnp.maximum(rgb + 0.5, 0.0)


def make_inference_frame_fn(
    state: G.GaussianState,
    field: ColorFieldParams | None,
    settings: RasterSettings,
    bg_color,
    style_f: jax.Array | None = None,
    precomputed_enc: jax.Array | None = None,
    sh_override: jax.Array | None = None,
    interpret: bool | None = None,
):
    """One jitted camera->image program for inference serving.

    The eager ``render()`` wrapper dispatches the field decode, SH->RGB,
    and rasterizer as separate programs per frame (+21 ms/frame measured
    on the bed_0037 1080p bench vs a single jitted program). This builds
    the whole frame as ONE program and hoists everything
    camera-independent out of it entirely: the SH coefficients — the
    color field does not see the camera (reference
    ``gaussian_model.precompute()``, `scene/gaussian_model.py:653`, plus
    the style-conditioned MLP head) — and the activation transforms.
    Only the view-direction SH evaluation and the rasterizer run per
    frame.

    Returns ``frame(vm, pm, campos, tanfovx, tanfovy) -> [H, W, 3]``;
    all five arguments are traced operands, so one compiled program
    serves every camera at the settings' resolution.
    """
    from aip_tpu.gs.rasterizer import rasterize_matmul

    if settings.macro <= 1:
        settings = settings._replace(
            macro=4, macro_capacity=max(settings.macro_capacity, 1024),
            composite_backend="mxu")
    if interpret is None:
        # The Pallas 'mxu' composite lowers natively only on TPU; resolve
        # interpret mode at construction (serving builds one fn per model,
        # and the tests force the CPU backend process-wide).
        interpret = (settings.composite_backend in ("mxu", "pallas")
                     and jax.default_backend() != "tpu")
    if sh_override is not None:
        sh = sh_override
    else:
        sh = predict_sh(field, state.xyz, style_f,
                        precomputed_enc=precomputed_enc)
    xyz = state.xyz
    scales = jnp.exp(state.scaling)
    rotations = state.rotation
    opacity = jnp.where(state.active,
                        jax.nn.sigmoid(state.opacity)[:, 0], 0.0)
    bg = jnp.asarray(bg_color, jnp.float32)

    @jax.jit
    def frame(vm, pm, campos, tanfovx, tanfovy):
        colors = _sh_colors(sh, xyz, campos)
        img, _radii = rasterize_matmul(
            xyz, scales, rotations, opacity, colors, vm, pm, bg, settings,
            tanfovx=tanfovx, tanfovy=tanfovy, interpret=interpret)
        return img

    return frame


def render_frame(frame_fn, camera) -> jax.Array:
    """Drive a make_inference_frame_fn program with a Camera."""
    return frame_fn(
        jnp.asarray(camera.world_view_transform, jnp.float32),
        jnp.asarray(camera.full_proj_transform, jnp.float32),
        jnp.asarray(camera.camera_center, jnp.float32),
        math.tan(camera.FoVx * 0.5), math.tan(camera.FoVy * 0.5))


def render(
    camera,
    state: G.GaussianState,
    field: ColorFieldParams,
    bg_color: jax.Array,
    style_f: jax.Array | None = None,
    mode: str = "train",                  # 'train' | 'train_rvq' | 'inference'
    rvq_scale: rvq_mod.RVQState | None = None,
    rvq_rot: rvq_mod.RVQState | None = None,
    scaling_modifier: float = 1.0,
    settings: RasterSettings | None = None,
    screenspace_offset: jax.Array | None = None,
    precomputed_enc: jax.Array | None = None,
    tanfovx=None,
    tanfovy=None,
    use_pallas: bool = False,
    renderer: str = "auto",   # 'auto' | 'xla' | 'pallas' | 'matmul'
    sh_override: jax.Array | None = None,
    mesh=None,
    mesh_axis: str = "dp",
) -> RenderOutput:
    if settings is None:
        settings = make_settings(camera)
    if tanfovx is None:
        tanfovx = math.tan(camera.FoVx * 0.5)
    if tanfovy is None:
        tanfovy = math.tan(camera.FoVy * 0.5)

    vm = jnp.asarray(camera.world_view_transform, jnp.float32)
    pm = jnp.asarray(camera.full_proj_transform, jnp.float32)
    campos = jnp.asarray(camera.camera_center, jnp.float32)

    xyz = state.xyz
    active = state.active

    if mode == "inference":
        scales = jnp.exp(state.scaling)
        rotations = state.rotation
        opacity = jax.nn.sigmoid(state.opacity)[:, 0]
    else:
        m = G.ste_mask(state)
        if mode == "train_rvq":
            assert rvq_scale is not None and rvq_rot is not None
            scales_q, _ = rvq_mod.quantize(rvq_scale, G.get_scaling(state))
            rot_q, _ = rvq_mod.quantize(rvq_rot, G.get_rotation(state))
            scales = scales_q * m
            rotations = rot_q
        else:
            scales = G.get_scaling(state) * m
            rotations = G.get_rotation(state)
        opacity = (G.get_opacity(state) * m)[:, 0]

    # Inactive slots contribute nothing.
    opacity = jnp.where(active, opacity, 0.0)

    if sh_override is not None:
        # Baked SH (e.g. loaded from a standard 3DGS PLY) instead of the
        # neural field (reference override_color parameter).
        sh = sh_override
    else:
        sh = predict_sh(field, xyz, style_f, precomputed_enc=precomputed_enc)
    colors = _sh_colors(sh, xyz, campos)

    if mesh is not None and mode == "inference":
        # Gaussian-sharded rendering (parallel/gs.py): splat set sharded
        # over the mesh, all_to_all to block sharding, exact vs replicated.
        # Eager path (per-frame device_put placements) — inference only.
        from aip_tpu.parallel.gs import rasterize_sharded, shard_gaussian_arrays

        if settings.macro <= 1:
            settings = settings._replace(
                macro=4, macro_capacity=max(settings.macro_capacity, 1024))
        if scaling_modifier != 1.0:
            scales = scales * scaling_modifier
        sharded = shard_gaussian_arrays(mesh, xyz, scales, rotations,
                                        opacity, colors, axis=mesh_axis)
        img, radii = rasterize_sharded(
            mesh, *sharded, vm, pm, jnp.asarray(bg_color, jnp.float32),
            settings, tanfovx=tanfovx, tanfovy=tanfovy, axis=mesh_axis)
        return RenderOutput(render=img, radii=radii,
                            visibility=(radii > 0) & active)

    if renderer == "auto":
        if use_pallas:
            renderer = "pallas"
        elif mode == "inference" and settings.image_height * settings.image_width >= 512 * 512:
            # The dense-group MXU macro compositor wins at high resolution
            # (count-bounded with transmittance early-exit, BENCHMARKS.md);
            # plain XLA compiles faster and is quicker for small previews.
            renderer = "matmul"
        else:
            renderer = "xla"
    if renderer == "matmul" and mode == "inference":
        from aip_tpu.gs.rasterizer import rasterize_matmul

        if settings.macro <= 1:
            # Keep a caller-fitted macro_capacity (fit_macro_capacity);
            # only the hierarchy level and backend are forced here.
            settings = settings._replace(
                macro=4, macro_capacity=max(settings.macro_capacity, 1024),
                composite_backend="mxu")
        img, radii = rasterize_matmul(
            xyz, scales, rotations, opacity, colors, vm, pm,
            jnp.asarray(bg_color, jnp.float32), settings,
            tanfovx=tanfovx, tanfovy=tanfovy, scale_modifier=scaling_modifier,
        )
    elif renderer == "pallas" and mode == "inference":
        from aip_tpu.gs.rasterizer import rasterize_fast

        img, radii = rasterize_fast(
            xyz, scales, rotations, opacity, colors, vm, pm,
            jnp.asarray(bg_color, jnp.float32), settings,
            tanfovx=tanfovx, tanfovy=tanfovy, scale_modifier=scaling_modifier,
        )
    else:
        img, radii = rasterize(
            xyz, scales, rotations, opacity, colors, vm, pm,
            jnp.asarray(bg_color, jnp.float32), settings,
            tanfovx=tanfovx, tanfovy=tanfovy, scale_modifier=scaling_modifier,
            screenspace_offset=screenspace_offset,
        )
    return RenderOutput(render=img, radii=radii, visibility=(radii > 0) & active)

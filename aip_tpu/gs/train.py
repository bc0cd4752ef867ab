"""Stylized 3DGS training loop (Compact-3DGS schedule + AdaIN style phase).

Parity with reference `Style_3DGS/train.py:42-307` and the defaults in
`arguments/__init__.py:75-99`:
* two-phase loss — photometric ``0.8*L1 + 0.2*(1-SSIM) + 5e-4*mean(sigmoid
  (mask))`` until ``freeze_iters``, then pure L1 against the per-view AdaIN
  style guide (pre-computed once per camera, train.py:87-115);
* densify/clone/split every 100 iters in [500, 15000), opacity reset every
  3000, mask-prune every 1000 after densification ends, RVQ fine-tune phase
  from iter 29000 (15000-iter GUI schedule: proportionally earlier);
* two optimizers — per-group Adam (eps 1e-15) with the log-lerp xyz schedule
  (general_utils.py:29-62), and the network Adam with 100-iter linear warmup
  + MultiStep(0.33 @ [5k, 15k, 25k]);
* final mask-prune + RVQ + Morton sort + storage report at the last iter.

TPU design: the train step is ONE jitted program (render + loss + both
optimizer updates); densification ops are separate jitted shape-stable
functions on the fixed-capacity state; Adam moments for re-used slots are
zeroed through the same slot masks. Guide images live on device for the
whole style phase (the reference reloads them from disk every iteration —
SURVEY.md §3.2 flags this; here it is a device-resident cache).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field
from pathlib import Path
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from aip_tpu.gs import gaussians as G
from aip_tpu.gs import rvq as rvq_mod
from aip_tpu.gs.colorfield import ColorFieldParams, init_colorfield
from aip_tpu.gs.render import render, make_settings
from aip_tpu.ops.metrics import l1_loss, ssim


@dataclass(frozen=True)
class GSTrainConfig:
    iterations: int = 15_000
    freeze_iters: int = 7_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    mask_lr: float = 0.01
    net_lr: float = 0.01
    net_lr_step: tuple = (5_000, 15_000, 25_000)
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_mask: float = 0.0005
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    mask_prune_iter: int = 1_000
    rvq_iter: int = 29_000
    rvq_size: int = 64
    rvq_num: int = 6
    style_dim: int = 256
    log2_hashmap: int = 19
    capacity: int = 1 << 17
    max_per_tile: int = 128
    raster_chunk: int = 4096
    # Hierarchical selection kicks in automatically for images of at least
    # this many pixels (the pair-sort macro binning beats the flat chunked
    # top_k merge once the tile count is large; see BENCHMARKS.md).
    macro_above_pixels: int = 256 * 256
    macro: int = 4
    macro_capacity: int = 1024
    # Pair-sort selection shape for TRAINING renders. The defaults
    # truncate: splats spanning > dup_span macro blocks route through a
    # giant_capacity-capped per-supertile merge, and trained scenes grow
    # thousands of such splats (BENCHMARKS.md "Real-scene exactness") —
    # the model then learns to look right UNDER that truncation, so
    # inference must render with the SAME shape (recorded in
    # cfg_args.json "selection"). Fit them up front with
    # render.fit_selection on the initial scene (+ margin) to train
    # exactly instead; selection cost grows with the fitted
    # giant_capacity (~+30% frame time on giant-heavy scenes).
    dup_span: int = 3
    giant_capacity: int = 128
    # Giant handling backend (RasterSettings.giant_backend): 'direct' emits
    # giant pairs straight into the pair sort from depth-compacted pools
    # (exact coverage per pooled splat, no supertile merge) — the fitted
    # selection path uses it; 'merge' is the legacy capped supertile merge.
    giant_backend: str = "merge"
    giant_span: int = 8
    giant_pool: int = 16384
    giant_pool_full: int = 1024
    white_background: bool = False
    # Capacity-bucket recompaction (TPU-first; see G.capacity_bucket):
    # after prune events the live set is packed to the front and every
    # [C, ...] buffer shrinks to the next pow-2 bucket, so colorfield and
    # rasterizer work track the live count instead of the initial cloud.
    # Set floor=0 to disable (fixed capacity for the whole run).
    recompact_floor: int = 8192
    # Streamed-composite threshold: when ONE view's dense autodiff
    # intermediates ([tiles, K, 256] fp32) exceed this many bytes, no
    # amount of view chunking or remat bounds the working set — training
    # switches to the streamed Pallas custom-VJP composite (constant VMEM;
    # ops/pallas/composite_ad.py, ~35% slower per step where both fit, see
    # BENCHMARKS.md "Differentiable composite backends").
    ad_stream_above_bytes: int = 2 << 30
    # Opacity-aware selection tightening (rasterizer.selection_radii):
    # exact; False restores raw 3-sigma footprints for A/B benching.
    opacity_cull: bool = True


class CameraArrays(NamedTuple):
    """Device-side camera bundle (one resolution -> one compiled step)."""

    world_view: jax.Array
    full_proj: jax.Array
    campos: jax.Array
    image: jax.Array       # [H, W, 3] ground truth (or style guide)
    height: int
    width: int
    tanfovx: float
    tanfovy: float


def camera_to_arrays(cam, image=None) -> CameraArrays:
    import math

    img = cam.image if image is None else image
    return CameraArrays(
        world_view=jnp.asarray(cam.world_view_transform, jnp.float32),
        full_proj=jnp.asarray(cam.full_proj_transform, jnp.float32),
        campos=jnp.asarray(cam.camera_center, jnp.float32),
        image=jnp.asarray(img, jnp.float32),
        height=cam.image_height,
        width=cam.image_width,
        tanfovx=math.tan(cam.FoVx * 0.5),
        tanfovy=math.tan(cam.FoVy * 0.5),
    )


def expon_lr(step, lr_init, lr_final, lr_delay_mult, max_steps, delay_steps=0):
    """Log-lerp schedule (general_utils.py:29-62), jnp-traceable."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return log_lerp


def make_gaussian_optimizer(cfg: GSTrainConfig, spatial_lr_scale: float,
                            iter_scale: int = 1):
    """Per-group Adam, eps=1e-15, xyz on the log-lerp schedule.

    ``iter_scale``: reference iterations represented by one optimizer
    update (= views_per_step), so schedules stay in the reference's
    iteration domain when views are batched."""

    def xyz_schedule(step):
        return expon_lr(
            step * iter_scale,
            cfg.position_lr_init * spatial_lr_scale,
            cfg.position_lr_final * spatial_lr_scale,
            cfg.position_lr_delay_mult,
            cfg.position_lr_max_steps,
        )

    def adam(lr):
        return optax.adam(lr, eps=1e-15)

    return optax.multi_transform(
        {
            "xyz": adam(xyz_schedule),
            "opacity": adam(cfg.opacity_lr),
            "scaling": adam(cfg.scaling_lr),
            "rotation": adam(cfg.rotation_lr),
            "mask": adam(cfg.mask_lr),
        },
        param_labels={"xyz": "xyz", "opacity": "opacity", "scaling": "scaling",
                      "rotation": "rotation", "mask": "mask"},
    )


def make_net_optimizer(cfg: GSTrainConfig, iter_scale: int = 1):
    """Adam with LinearLR(0.01 -> 1 over 100) * MultiStep(0.33 @ steps)."""

    def schedule(step):
        it = step * iter_scale
        warm = jnp.minimum(1.0, 0.01 + 0.99 * it / 100.0)
        gamma = jnp.asarray(1.0)
        for m in cfg.net_lr_step:
            gamma = gamma * jnp.where(it >= m, 0.33, 1.0)
        return cfg.net_lr * warm * gamma

    return optax.adam(schedule, eps=1e-15)


class TrainerState(NamedTuple):
    gstate: G.GaussianState
    field: ColorFieldParams
    opt_g: optax.OptState
    opt_net: optax.OptState
    rvq_scale: rvq_mod.RVQState | None
    rvq_rot: rvq_mod.RVQState | None
    step: jax.Array


def _gparams(gstate: G.GaussianState) -> dict:
    return {"xyz": gstate.xyz, "opacity": gstate.opacity, "scaling": gstate.scaling,
            "rotation": gstate.rotation, "mask": gstate.mask}


def _with_gparams(gstate: G.GaussianState, p: dict) -> G.GaussianState:
    return gstate._replace(xyz=p["xyz"], opacity=p["opacity"], scaling=p["scaling"],
                           rotation=p["rotation"], mask=p["mask"])


def init_trainer(cfg: GSTrainConfig, points, colors, spatial_lr_scale: float,
                 seed: int = 0):
    gstate, _sh_dc = G.create_from_pcd(jnp.asarray(points), jnp.asarray(colors),
                                       cfg.capacity)
    field = init_colorfield(jax.random.PRNGKey(seed),
                            style_dim=cfg.style_dim or None,
                            log2_hashmap=cfg.log2_hashmap)
    opt_g = make_gaussian_optimizer(cfg, spatial_lr_scale).init(_gparams(gstate))
    opt_net = make_net_optimizer(cfg).init(field)
    return TrainerState(gstate, field, opt_g, opt_net, None, None,
                        jnp.zeros((), jnp.int32))


def stack_cameras(cams: list) -> CameraArrays:
    """Stack same-resolution CameraArrays into a view batch (leading dim B)
    for a views_per_step>1 train step."""
    assert len({(c.height, c.width) for c in cams}) == 1
    return CameraArrays(
        world_view=jnp.stack([c.world_view for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        image=jnp.stack([c.image for c in cams]),
        height=cams[0].height, width=cams[0].width,
        tanfovx=jnp.asarray([c.tanfovx for c in cams], jnp.float32),
        tanfovy=jnp.asarray([c.tanfovy for c in cams], jnp.float32),
    )


def make_train_step(cfg: GSTrainConfig, spatial_lr_scale: float,
                    phase: str, height: int, width: int, use_rvq: bool = False,
                    views_per_step: int = 1, view_chunk: int | None = None,
                    gaussian_shard=None):
    """Build the jitted step for 'photometric' or 'style' phase at a fixed
    image resolution (one compiled program per resolution).

    Returns step(trainer, camera: CameraArrays, style_f, bg) ->
    (trainer, metrics).

    ``views_per_step`` (TPU-first redesign; the reference is strictly one
    view per iteration) renders a BATCH of views per optimizer step: the
    per-Gaussian colorfield fwd+bwd — the dominant per-step cost at scale —
    runs ONCE for the batch because every view queries the same positions,
    so B views cost roughly one colorfield plus B rasterizations.
    ``camera`` must then be a stacked batch (``stack_cameras``); the
    gradient is the mean over views, densification stats accumulate each
    view's full-magnitude gradient exactly as B reference iterations would.
    On a device mesh, shard the camera batch's leading axis over ``dp`` and
    XLA turns the mean into a psum (see parallel/gs.py).

    ``gaussian_shard=(mesh, axis)`` additionally shards the colorfield
    compute over the GAUSSIAN axis (parallel.gs.predict_sh_sharded): under
    plain view-dp the colorfield is recomputed identically on every device,
    so this divides its fwd+bwd — ~80% of the step at 512^2/131k — by the
    mesh size. Composable with view sharding on the same axis (different
    tensors, same devices). Requires capacity % mesh.shape[axis] == 0.
    """
    opt_gaussian = make_gaussian_optimizer(cfg, spatial_lr_scale,
                                           iter_scale=views_per_step)
    opt_network = make_net_optimizer(cfg, iter_scale=views_per_step)
    mode = "train_rvq" if use_rvq else "train"
    n_views = views_per_step
    settings = make_settings_from_dims(height, width, cfg,
                                       views=views_per_step)
    # Views per vmapped chunk: bound the live per-view working set to
    # ~1 GB per chunk (~4 such tensors are alive under grad). The charge
    # is the [vchunk, tiles, K, 256] dense autodiff intermediates PLUS
    # the per-view SELECTION buffers — pair-sort emission and the phase-2
    # macro refinement that macro_capacity inflates. Sizing only the
    # composite let the 800^2 B=8 kc=2048/K=192 real-scene step pick
    # vchunk=2 and RESOURCE_EXHAUST on-chip (r4 spot-check,
    # BENCHMARKS.md "Known issue"). Chunks beyond the first run under
    # lax.scan.
    per_view = _per_view_bytes(height, width, cfg, settings)
    if view_chunk:
        assert n_views % view_chunk == 0, (n_views, view_chunk)
        vchunk = view_chunk  # explicit (e.g. dp-sharded: memory divides)
    else:
        vchunk = n_views
        while vchunk > 1 and (n_views % vchunk
                              or vchunk * per_view > (1 << 30)):
            vchunk -= 1

    def view_loss(gstate, field, camera, style_f, bg, offs, rvq_s, rvq_r,
                  sh=None):
        out = render_from_arrays(camera, gstate, field, bg, style_f, mode,
                                 rvq_s, rvq_r, settings, offs,
                                 sh_override=sh)
        img = out.render
        gt = camera.image
        ll1 = l1_loss(img, gt)
        if phase == "photometric":
            # Mask regularizer over LIVE slots only (the reference's tensor
            # has no dead rows, train.py:199-205) — also keeps the term
            # invariant under capacity-bucket recompaction.
            act = gstate.active[:, None]
            mask_reg = (jnp.sum(jax.nn.sigmoid(gstate.mask) * act)
                        / jnp.maximum(jnp.sum(act), 1))
            loss = (
                (1.0 - cfg.lambda_dssim) * ll1
                + cfg.lambda_dssim * (1.0 - ssim(img[None], gt[None]))
                + cfg.lambda_mask * mask_reg
            )
        else:
            loss = ll1  # gt here is the stylized guide
        return loss, ll1, out.radii

    def compute_sh(field, gstate, style_f):
        if gaussian_shard is not None:
            from aip_tpu.parallel.gs import predict_sh_sharded

            mesh_, ax_ = gaussian_shard
            return predict_sh_sharded(mesh_, field, gstate.xyz, style_f,
                                      axis=ax_)
        from aip_tpu.gs.colorfield import predict_sh

        return predict_sh(field, gstate.xyz, style_f)

    def loss_fn(gparams, field, gstate, camera, style_f, bg, offs, rvq_s, rvq_r):
        gstate = _with_gparams(gstate, gparams)
        if n_views == 1:
            # Under gaussian_shard the colorfield is precomputed (sharded)
            # and injected via sh_override (style conditioning folded in);
            # the replicated single-view step keeps computing it inside
            # render, unchanged.
            if gaussian_shard:
                sh1, sty1 = compute_sh(field, gstate, style_f), None
            else:
                sh1, sty1 = None, style_f
            loss, ll1, radii = view_loss(gstate, field, camera, sty1, bg,
                                         offs, rvq_s, rvq_r, sh=sh1)
            return loss, (ll1, radii)
        # Batched path: the view-invariant colorfield (hashgrid + MLP -> SH,
        # the dominant cost) runs ONCE for the batch; views then render in
        # memory-bounded chunks — vmap inside a chunk, lax.scan across
        # chunks — so at most ``vchunk`` views' [tiles, K, 256] composite
        # buffers are live at once. (A flat vmap materializes all B views'
        # buffers simultaneously — OOM at 800^2 x B=4 on a 16G chip.)
        sh = compute_sh(field, gstate, style_f)
        cam_axes = CameraArrays(0, 0, 0, 0, None, None, 0, 0)

        def chunk_loss(camera_c, offs_c):
            return jax.vmap(
                view_loss,
                in_axes=(None, None, cam_axes, None, None, 0, None, None,
                         None),
            )(gstate, field, camera_c, None, bg, offs_c, rvq_s, rvq_r, sh)

        if vchunk == n_views:
            losses, ll1s, radii = chunk_loss(camera, offs)
        else:
            def resh(x):
                return (x.reshape((n_views // vchunk, vchunk) + x.shape[1:])
                        if isinstance(x, jax.Array) and x.ndim >= 1
                        and x.shape[0] == n_views else x)

            # Only array fields ride the scan xs (height/width are static).
            xs = ((resh(camera.world_view), resh(camera.full_proj),
                   resh(camera.campos), resh(camera.image),
                   resh(camera.tanfovx), resh(camera.tanfovy)), resh(offs))

            def body(_, inp):
                (wv, fp, cp, im, tx, ty), offs_c = inp
                camera_c = CameraArrays(wv, fp, cp, im, camera.height,
                                        camera.width, tx, ty)
                return None, chunk_loss(camera_c, offs_c)

            _, (losses, ll1s, radii) = jax.lax.scan(body, None, xs)
            losses = losses.reshape(-1)
            ll1s = ll1s.reshape(-1)
            radii = radii.reshape((n_views,) + radii.shape[2:])
        return jnp.mean(losses), (jnp.mean(ll1s), radii)

    @jax.jit
    def step(trainer: TrainerState, camera: CameraArrays, style_f, bg):
        gparams = _gparams(trainer.gstate)
        cap = trainer.gstate.capacity  # runtime bucket, not cfg.capacity
        if n_views == 1:
            offs = jnp.zeros((cap, 2))
        else:
            offs = jnp.zeros((n_views, cap, 2))
        (loss, (ll1, radii)), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 6), has_aux=True)(
            gparams, trainer.field, trainer.gstate, camera, style_f, bg, offs,
            trainer.rvq_scale, trainer.rvq_rot,
        )
        g_gauss, g_field, g_offs = grads

        upd_g, opt_g = opt_gaussian.update(g_gauss, trainer.opt_g, gparams)
        gparams = optax.apply_updates(gparams, upd_g)
        upd_n, opt_net = opt_network.update(g_field, trainer.opt_net, trainer.field)
        field = optax.apply_updates(trainer.field, upd_n)

        gstate = _with_gparams(trainer.gstate, gparams)
        if n_views == 1:
            gstate = G.add_densification_stats(gstate, g_offs, radii,
                                               width=width, height=height)
        else:
            # Per-view stats at full (un-averaged) magnitude, exactly as B
            # sequential reference iterations would accumulate them.
            def acc(gs, inp):
                g, r = inp
                return G.add_densification_stats(
                    gs, g * n_views, r, width=width, height=height), None

            gstate, _ = jax.lax.scan(acc, gstate, (g_offs, radii))

        new_trainer = trainer._replace(
            gstate=gstate, field=field, opt_g=opt_g, opt_net=opt_net,
            step=trainer.step + n_views,  # step counts reference iterations
        )
        return new_trainer, {"loss": loss, "l1": ll1}

    return step


def _per_view_bytes(height: int, width: int, cfg: GSTrainConfig,
                    settings) -> int:
    """Live bytes ONE rendered view holds during the train step, for the
    view-chunk budget: the dense composite autodiff intermediates
    ([tiles, K, 256] fp32 — the reference CUDA kernel streams these in
    registers, diff-gaussian-rasterization/backward.cu) plus the
    selection working set the chunk bound must also charge:

    * pair-sort emission: the static slot table (`_pairsort_slots` rows
      — blk/gid/dqv pre-sort plus the sorted copies, ~6 int32 arrays);
    * phase-2 macro refinement: the [MB, Kc, m^2] hit/key tensors, the
      [MB*m^2, Kc] transpose + repeated-candidate copies, and the
      gathered per-block candidate rows ([MB, Kc] x ~4 f32);
    * the per-tile attribute gather [tiles, K, 16] feeding the
      composite.

    All are per-view under the views_per_step vmap; capacity is charged
    at cfg.capacity (the largest runtime bucket)."""
    import math as _math

    from aip_tpu.gs.rasterizer import TILE, _pairsort_slots

    th = -(-height // TILE)
    tw = -(-width // TILE)
    n_tiles = th * tw
    k = cfg.max_per_tile
    total = n_tiles * k * 256 * 4          # dense composite AD buffers
    total += n_tiles * k * 16 * 4          # per-tile attribute gather
    if settings.macro > 1:
        m = settings.macro
        mb = _math.ceil(th / m) * _math.ceil(tw / m)
        kc = settings.macro_capacity
        # hit (bool) + key (f32) + key_t (f32) + cand_rep (i32) + the
        # [MB, Kc] candidate attribute rows (mean2d/radii/depth ~ 4 f32).
        total += mb * kc * (m * m * 13 + 16)
        if settings.select_backend == "pairsort":
            s = _pairsort_slots(cfg.capacity, settings,
                                _math.ceil(th / m), _math.ceil(tw / m))
            total += s * 4 * 6
    return total


def make_settings_from_dims(height: int, width: int, cfg: GSTrainConfig,
                            views: int = 1):
    from aip_tpu.gs.rasterizer import RasterSettings

    macro = cfg.macro if height * width >= cfg.macro_above_pixels else 1
    # Remat only when the [views, tiles, K, 256] autodiff intermediates
    # would be large (>~0.5 GB); below that, storing them is faster than
    # recompute. ``views`` is the vmapped view batch (views_per_step) —
    # the batch multiplies every composite intermediate.
    # Remat/AD-backend decisions charge the DENSE composite intermediates
    # only (they are what remat recomputes and what the streamed Pallas
    # VJP eliminates); the vchunk budget separately charges the full
    # per-view working set including selection (_per_view_bytes).
    n_tiles = ((height + 15) // 16) * ((width + 15) // 16)
    per_view = n_tiles * cfg.max_per_tile * 256 * 4
    remat = views * per_view > (1 << 29)
    # When even a SINGLE view's dense intermediates exceed the streaming
    # threshold, chunking (vchunk=1) and remat can no longer bound the
    # autodiff working set — fall back to the streamed Pallas custom-VJP
    # composite, whose working set is constant in resolution. Remat is
    # meaningless there (the kernel never materializes the dense buffers).
    ad_backend = "pallas" if per_view > cfg.ad_stream_above_bytes else "xla"
    return RasterSettings(
        image_height=height, image_width=width,
        max_per_tile=cfg.max_per_tile, chunk=cfg.raster_chunk,
        macro=macro, macro_capacity=cfg.macro_capacity,
        dup_span=cfg.dup_span, giant_capacity=cfg.giant_capacity,
        giant_backend=cfg.giant_backend, giant_span=cfg.giant_span,
        giant_pool=cfg.giant_pool, giant_pool_full=cfg.giant_pool_full,
        remat_composite=remat and ad_backend == "xla",
        ad_backend=ad_backend,
        opacity_cull=cfg.opacity_cull,
    )


def render_from_arrays(camera: CameraArrays, gstate, field, bg, style_f, mode,
                       rvq_s, rvq_r, settings, screenspace_offset=None,
                       sh_override=None):
    """render() over a CameraArrays bundle (avoids host Camera objects in jit)."""

    class _Cam:
        world_view_transform = camera.world_view
        full_proj_transform = camera.full_proj
        camera_center = camera.campos
        image_height = settings.image_height
        image_width = settings.image_width
        FoVx = 0.0  # unused when settings given
        FoVy = 0.0

    return render(_Cam, gstate, field, bg, style_f=style_f, mode=mode,
                  rvq_scale=rvq_s, rvq_rot=rvq_r, settings=settings,
                  screenspace_offset=screenspace_offset,
                  tanfovx=camera.tanfovx, tanfovy=camera.tanfovy,
                  sh_override=sh_override)


def zero_moment_slots(opt_state, slot_mask: jax.Array):
    """Zero Adam moments at re-used slots after densification appends."""
    c = slot_mask.shape[0]

    def fix(leaf):
        if isinstance(leaf, jax.Array) and leaf.ndim >= 1 and leaf.shape[0] == c:
            return jnp.where(
                slot_mask.reshape((c,) + (1,) * (leaf.ndim - 1)), 0.0, leaf
            )
        return leaf

    return jax.tree.map(fix, opt_state)


def train(
    scene,
    style_image,
    cfg: GSTrainConfig = GSTrainConfig(),
    use_depth: bool = False,
    img_size: int = 512,
    depth_offset: float = 0.5,
    depth_prominence: float = 20.0,
    guide_dir=None,
    progress_every: int = 0,
    seed: int = 0,
    checkpoint_iterations=(),
    start_checkpoint=None,
    checkpoint_dir=None,
    test_iterations=(),
    logger=None,
    network_gui=None,
    views_per_step: int = 1,
    guide_batch: int = 8,
    mesh=None,
    mesh_axis: str = "dp",
    gaussian_shard: bool = False,
):
    """Full two-phase stylized training. Returns (TrainerState, style_f).

    ``scene`` is an aip_tpu.gs.dataset.Scene; ``style_image`` a path/array.

    ``views_per_step`` > 1 (TPU-first; the reference is strictly one view
    per iteration) consumes B views per optimizer step: one step covers B
    reference iterations — the per-Gaussian colorfield fwd+bwd, the
    dominant cost, runs once for the batch (see make_train_step). LR
    schedules and all iteration-indexed events stay in the reference's
    iteration domain; the optimizer applies 1/B as many Adam updates on
    B-view mean gradients (standard batching trade). Requires all train
    cameras at one resolution and iterations aligned to B.

    ``mesh`` (a jax.sharding.Mesh) makes the loop multi-chip first-class:
    the trainer is replicated over ``mesh_axis``, each step's view batch is
    sharded over it (B % dp == 0), and with ``gaussian_shard=True`` the
    colorfield compute additionally shards over the Gaussian axis
    (parallel.gs.predict_sh_sharded) — XLA inserts the gradient psums. All
    host-side machinery (densify/prune, recompaction, RVQ, checkpoints,
    viewer) is sharding-transparent: it consumes replicated arrays.
    """
    from aip_tpu.pipelines.adain_infer import (
        adain_inference, get_style_embeddings, _to_array,
    )

    rng = np.random.default_rng(seed)
    pcd = scene.point_cloud
    trainer = init_trainer(cfg, pcd.points, pcd.colors, scene.cameras_extent, seed)
    first_iter = 0
    if start_checkpoint is not None:
        from aip_tpu.gs.checkpoint import load_checkpoint

        trainer = load_checkpoint(start_checkpoint, trainer)
        first_iter = int(trainer.step)

    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0])

    # Pooled style embedding [1, 512] (train.py:80-84).
    style_f = None
    if cfg.style_dim:
        feat = get_style_embeddings(_to_array(style_image))  # [1, h, w, 512]
        style_f = jnp.mean(feat, axis=(1, 2))  # adaptive_avg_pool2d to 1x1

    _pgs = None
    if mesh is not None:
        from aip_tpu.parallel import gs as _pgs

        dp = mesh.shape[mesh_axis]
        if views_per_step > 1 and views_per_step % dp:
            raise ValueError(f"views_per_step ({views_per_step}) must be a "
                             f"multiple of mesh axis {mesh_axis!r} ({dp})")
        if gaussian_shard and (dp & (dp - 1) or cfg.recompact_floor % dp):
            raise ValueError(
                "gaussian_shard needs a power-of-two mesh axis dividing "
                f"recompact_floor (got dp={dp}, floor={cfg.recompact_floor})")
        trainer = _pgs.replicate_trainer(mesh, trainer)
        bg = _pgs.replicated_scalars(mesh, bg)
        if style_f is not None:
            style_f = _pgs.replicated_scalars(mesh, style_f)
    elif gaussian_shard:
        raise ValueError("gaussian_shard requires a mesh")

    cams = scene.getTrainCameras()

    # Pre-pass: one stylized guide per camera, cached on device
    # (train.py:87-115). The reference stylizes each view serially; when no
    # depth map is involved and all cameras share a resolution, views go
    # through the batched serving path instead (style stats computed once,
    # 8 views per dispatch) — same math as adain_inference's
    # stylize_simple + mask composite, ~8x fewer dispatches.
    guides = {}
    import tempfile

    from aip_tpu.ops.image import resize_bilinear

    guide_out = guide_dir or tempfile.mkdtemp(prefix="aip_gs_guides_")
    same_res = len({(c.image_height, c.image_width) for c in cams}) == 1
    if guide_batch > 1 and not use_depth and same_res and len(cams) > 1:
        from aip_tpu.models import weights as weights_mod
        from aip_tpu.ops.image import resize_nearest
        from aip_tpu.pipelines.adain_infer import (
            _test_transform, precompute_style_stats, save_image,
            stylize_batch_with_stats,
        )

        vggp = weights_mod.get_vgg_params()
        decp = weights_mod.get_decoder_params()
        style_t = _test_transform(style_image, img_size, False)
        s_mean, s_std = precompute_style_stats(vggp, style_t[None])
        Path(guide_out).mkdir(parents=True, exist_ok=True)
        bsz = guide_batch
        for i0 in range(0, len(cams), bsz):
            chunk = cams[i0:i0 + bsz]
            gts = [(c.image * 255).astype(np.uint8) for c in chunk]
            cb = jnp.stack([_test_transform(g, img_size, False)
                            for g in gts])
            # Binary mask composite at the working size (test.py:222-236);
            # stylize_batch_with_stats also restores the content size when
            # the decoder output came back 8*floor(H/8).
            masks = jnp.stack([
                resize_nearest(
                    jnp.asarray((g[..., :1] > 0).astype(np.float32))[None],
                    (cb.shape[1], cb.shape[2]))[0]
                for g in gts])
            out = jnp.clip(
                stylize_batch_with_stats(vggp, decp, cb, s_mean, s_std,
                                         masks=masks, alpha=0.5), 0.0, 1.0)
            for c, o in zip(chunk, out):
                # Same artifact trail as the serial path: guide JPEG on
                # disk, reloaded and resized to the camera resolution.
                p = Path(guide_out) / f"{c.image_name}.jpg"
                save_image(o[None], p)
                guides[c.image_name] = resize_bilinear(
                    jnp.asarray(_to_array(p)),
                    (c.image_height, c.image_width))
    else:
        for cam in cams:
            gt = (cam.image * 255).astype(np.uint8)
            mask = (gt > 0).transpose(2, 0, 1)[:1].astype(np.float32)
            path = adain_inference(
                content_img=gt, style_img=style_image,
                content_size=img_size, style_size=img_size,
                content_mask=mask, output=str(guide_out),
                file_name=cam.image_name,
                use_depth=use_depth, depth_offset=depth_offset,
                depth_prominence=depth_prominence,
                compute_dtype=jnp.bfloat16,  # match the batched guide path
            )
            guides[cam.image_name] = resize_bilinear(
                jnp.asarray(_to_array(path)),
                (cam.image_height, cam.image_width))

    # One compiled step per (phase, resolution, rvq?).
    step_cache = {}

    def get_step(phase, cam, use_rvq=False):
        key_ = (phase, cam.image_height, cam.image_width, use_rvq)
        if key_ not in step_cache:
            step_cache[key_] = make_train_step(
                cfg, scene.cameras_extent, phase, cam.image_height,
                cam.image_width, use_rvq=use_rvq,
                views_per_step=views_per_step,
                # dp-sharded view axis: per-device composite memory is
                # already B/dp views — don't serialize it with host-size
                # chunking (parallel/gs.py usage contract).
                view_chunk=(views_per_step
                            if mesh is not None and views_per_step > 1
                            else None),
                gaussian_shard=((mesh, mesh_axis) if gaussian_shard else None))
        return step_cache[key_]

    # Quantization-aware fine-tune boundary: the reference runs the final
    # 1/30 of the schedule (rvq_iter=29k of 30k, arguments/__init__.py:75-99)
    # with codebook-quantized scale/rot so geometry adapts to quantization;
    # scale that fraction down when iterations < the stock 30k schedule.
    rvq_start = min(cfg.rvq_iter, cfg.iterations - max(1, cfg.iterations // 30))

    cam_arrays = [camera_to_arrays(c) for c in cams]
    guide_arrays = [camera_to_arrays(c, image=np.asarray(guides[c.image_name]))
                    for c in cams]

    B = views_per_step
    if B > 1:
        if len({(c.image_height, c.image_width) for c in cams}) != 1:
            raise ValueError(
                "views_per_step > 1 requires all train cameras at one "
                "resolution (one compiled step)")
        if first_iter % B or (cfg.iterations - first_iter) % B:
            raise ValueError(
                f"iterations ({cfg.iterations}) and resume point "
                f"({first_iter}) must be multiples of views_per_step ({B})")
    if start_checkpoint is not None:
        # LR schedules evaluate (optimizer count * B) to stay in the
        # reference's iteration domain; a checkpoint trained with a
        # DIFFERENT B carries counts in its own step units, so rebase
        # every Adam count to first_iter // B — otherwise schedules jump
        # (e.g. B=1 -> B=4 resume would read 4x the true iteration).
        cnt = first_iter // B

        def _rebase(leaf):
            if (isinstance(leaf, jax.Array) and leaf.ndim == 0
                    and jnp.issubdtype(leaf.dtype, jnp.integer)):
                return jnp.asarray(cnt, leaf.dtype)
            return leaf

        trainer = trainer._replace(
            opt_g=jax.tree.map(_rebase, trainer.opt_g),
            opt_net=jax.tree.map(_rebase, trainer.opt_net))

    stack = []
    key = jax.random.PRNGKey(seed)
    # One pass of this loop covers reference iterations (it-B, it]. With
    # B == 1 every guard below reduces exactly to the per-iteration
    # original (mod_fire(m) == (it % m == 0), crossed(x) == (it == x)).
    for it in range(first_iter + B, cfg.iterations + 1, B):
        prev = it - B

        def crossed(x):
            return prev < x <= it

        def mod_fire(m):
            return it // m > prev // m
        # Remote-viewer poll (train.py:125-156 parity): serve a frame to a
        # connected SIBR viewer once per loop pass (= per iteration at
        # B=1; per B-iteration window when view batching).
        if network_gui is not None:
            network_gui.try_connect()
            if network_gui.conn is not None:
                try:
                    cam_req, _do_train, keep_alive, scaling = network_gui.receive()
                    if cam_req is not None:
                        from aip_tpu.gs.render import render as gs_render
                        from aip_tpu.gs.rasterizer import RasterSettings as RS

                        out = gs_render(
                            cam_req, trainer.gstate, trainer.field, bg,
                            style_f=style_f, mode="inference",
                            scaling_modifier=scaling,
                            settings=RS(cam_req.image_height, cam_req.image_width,
                                        max_per_tile=cfg.max_per_tile),
                        )
                        frame = (np.clip(np.asarray(out.render), 0, 1) * 255
                                 ).astype(np.uint8)
                        network_gui.send(frame, scene.scene_info.ply_path)
                    else:
                        network_gui.send(None, scene.scene_info.ply_path)
                    if not keep_alive:
                        network_gui.disconnect()
                except Exception:
                    network_gui.disconnect()
        cis = []
        for _ in range(B):
            if not stack:
                stack = list(rng.permutation(len(cams)))
            cis.append(stack.pop())
        ci = cis[0]

        # Seed RVQ codebooks at the QAT boundary (final_prune's k-means init
        # moved up so the remaining iterations train through quantization).
        if crossed(rvq_start + 1) and trainer.rvq_scale is None:
            key, k1, k2 = jax.random.split(key, 3)
            active_np = np.asarray(trainer.gstate.active)
            scales_a = G.get_scaling(trainer.gstate)[active_np]
            rots_a = G.get_rotation(trainer.gstate)[active_np]
            trainer = trainer._replace(
                rvq_scale=rvq_mod.kmeans_init(k1, scales_a, cfg.rvq_num, cfg.rvq_size),
                rvq_rot=rvq_mod.kmeans_init(k2, rots_a, cfg.rvq_num, cfg.rvq_size),
            )
        use_rvq = it > rvq_start and trainer.rvq_scale is not None

        # Phase of the window's FIRST iteration (train.py:199-208; a window
        # straddling freeze_iters shifts the boundary by < B iterations).
        phase = "photometric" if prev + 1 < cfg.freeze_iters else "style"
        arrays = cam_arrays if phase == "photometric" else guide_arrays
        batch = (arrays[ci] if B == 1
                 else stack_cameras([arrays[c] for c in cis]))
        if _pgs is not None and B > 1:
            batch = _pgs.shard_view_batch(mesh, batch, axis=mesh_axis)
        trainer, metrics = get_step(phase, cams[ci], use_rvq)(
            trainer, batch, style_f, bg)

        if use_rvq:
            # Learnable-codebook stand-in: one masked means step per
            # reference ITERATION (the reference attaches the codebooks to
            # its Adam optimizer) — B applications per window keep the QAT
            # adaptation cadence in the iteration domain.
            act = trainer.gstate.active
            for _ in range(B):
                trainer = trainer._replace(
                    rvq_scale=rvq_mod.update_codebooks(
                        trainer.rvq_scale, G.get_scaling(trainer.gstate), act),
                    rvq_rot=rvq_mod.update_codebooks(
                        trainer.rvq_rot, G.get_rotation(trainer.gstate), act),
                )

        # Densification schedule (train.py:264-293).
        if it < cfg.densify_until_iter:
            if it > cfg.densify_from_iter and mod_fire(cfg.densification_interval):
                # Capture grads before cloning: appends reset the accumulators.
                grads = G.avg_densify_grads(trainer.gstate)
                gstate, slots_c = G.densify_and_clone(
                    trainer.gstate, cfg.densify_grad_threshold,
                    cfg.percent_dense, scene.cameras_extent, grads=grads)
                key, sub = jax.random.split(key)
                gstate, slots_s = G.densify_and_split(
                    gstate, sub, cfg.densify_grad_threshold,
                    cfg.percent_dense, scene.cameras_extent, grads=grads)
                size_thr = 20.0 if it > cfg.opacity_reset_interval else 0.0
                gstate = G.prune(gstate, 0.005, scene.cameras_extent, size_thr)
                gstate = G.reset_stats(gstate)
                opt_g = zero_moment_slots(trainer.opt_g, slots_c | slots_s)
                trainer = trainer._replace(gstate=gstate, opt_g=opt_g)
            if mod_fire(cfg.opacity_reset_interval) or (
                cfg.white_background and crossed(cfg.densify_from_iter)
            ):
                trainer = trainer._replace(gstate=G.reset_opacity(trainer.gstate))
        else:
            if mod_fire(cfg.mask_prune_iter):
                trainer = trainer._replace(gstate=G.mask_prune(trainer.gstate))

        # Capacity-bucket resize after prune/densify events: pack live
        # slots to the front and drop dead rows (shrink), or zero-pad back
        # toward cfg.capacity when densification refills past 3/4
        # occupancy (so a transient prune dip never permanently caps
        # growth). jit retraces once per bucket; each retrace is amortized
        # over thousands of proportionally cheaper steps.
        if cfg.recompact_floor and mod_fire(cfg.densification_interval):
            n = int(trainer.gstate.n_active)
            cap_now = trainer.gstate.capacity
            bucket = G.capacity_bucket(n, floor=cfg.recompact_floor)
            if bucket < cap_now:
                order = G.recompact_order(trainer.gstate)
                trainer = trainer._replace(
                    gstate=G.shrink_tree(trainer.gstate, order, bucket),
                    opt_g=G.shrink_tree(trainer.opt_g, order, bucket),
                )
                if progress_every:
                    print(f"iter {it}: recompact {n} live -> capacity {bucket}")
            elif 4 * n > 3 * cap_now and cap_now < cfg.capacity:
                new_cap = min(bucket, cfg.capacity)
                trainer = trainer._replace(
                    gstate=G.grow_tree(trainer.gstate, cap_now, new_cap),
                    opt_g=G.grow_tree(trainer.opt_g, cap_now, new_cap),
                )
                if progress_every:
                    print(f"iter {it}: regrow {n} live -> capacity {new_cap}")

        if progress_every and mod_fire(progress_every):
            print(f"iter {it}: loss={float(metrics['loss']):.5f} "
                  f"n={int(trainer.gstate.n_active)}")
        if logger is not None and mod_fire(10):
            logger.scalar("train/loss", float(metrics["loss"]), it)
            logger.scalar("train/l1", float(metrics["l1"]), it)
            logger.scalar("train/n_gaussians", int(trainer.gstate.n_active), it)

        # Test-iteration report (training_report parity, train.py:333-415).
        if any(crossed(x) for x in test_iterations):
            from aip_tpu.ops.metrics import psnr

            mode_ = "train"
            psnrs, l1s = [], []
            for ca in cam_arrays[: min(4, len(cam_arrays))]:
                settings = make_settings_from_dims(
                    ca.image.shape[0], ca.image.shape[1], cfg)
                out = render_from_arrays(ca, trainer.gstate, trainer.field, bg,
                                         style_f, mode_, None, None, settings)
                img = jnp.clip(out.render, 0.0, 1.0)
                psnrs.append(float(psnr(img[None], ca.image[None])[0, 0]))
                l1s.append(float(jnp.mean(jnp.abs(img - ca.image))))
            if logger is not None:
                logger.scalar("test/psnr", float(np.mean(psnrs)), it)
                logger.scalar("test/l1", float(np.mean(l1s)), it)
            if progress_every:
                print(f"[ITER {it}] eval: L1 {np.mean(l1s):.4f} PSNR {np.mean(psnrs):.2f}")

        for x in checkpoint_iterations:
            if crossed(x):
                from aip_tpu.gs.checkpoint import save_checkpoint

                # Saved under the REQUESTED iteration's name so callers
                # find it; with B>1 the state is <=B-1 iterations newer.
                ckpt_dir = Path(checkpoint_dir
                                or (Path(guide_out) / "checkpoints"))
                save_checkpoint(ckpt_dir / f"chkpnt{x}", trainer)

    # Final: mask prune (final_prune parity, :607-651). Codebooks were
    # k-means-seeded at rvq_start and trained through the QAT phase above;
    # seed them here only if the loop never reached the boundary (resume
    # from a checkpoint past rvq_start with no codebooks).
    trainer = trainer._replace(gstate=G.mask_prune(trainer.gstate))
    if trainer.rvq_scale is None:
        key, k1, k2 = jax.random.split(key, 3)
        active = np.asarray(trainer.gstate.active)
        scales = G.get_scaling(trainer.gstate)[active]
        rots = G.get_rotation(trainer.gstate)[active]
        trainer = trainer._replace(
            rvq_scale=rvq_mod.kmeans_init(k1, scales, cfg.rvq_num, cfg.rvq_size),
            rvq_rot=rvq_mod.kmeans_init(k2, rots, cfg.rvq_num, cfg.rvq_size),
        )
    return trainer, style_f

"""User-facing 3DGS entry points: train + render, matching the reference API.

Parity:
* ``run_3dgs_training`` — `Style_3DGS/train.py:418-500` (GUI/CLI default
  schedule: 15000 iters, 7000 photometric freeze, `run_3dgs.py:38-39`);
* ``run_3dgs_rendering`` — `Style_3DGS/render.py:78-113` + ``render_sets``
  (:51-75): load latest model, precompute hash features, pooled style
  embedding, render the train cameras, write pngs and an animated GIF whose
  path is returned (consumed by the GUI, `gui/first_page.py:118-121`).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from aip_tpu.gs.dataset import Scene
from aip_tpu.gs.train import GSTrainConfig, train, camera_to_arrays, make_settings_from_dims
from aip_tpu.gs import compress as compress_mod
from aip_tpu.gs import gaussians as G
from aip_tpu.parallel.mesh import make_dp_mesh as _dp_mesh


def run_3dgs_training(
    content_path,
    style_img_path,
    model_path="output/3dgs_model",
    iterations: int = 15_000,
    freeze_iters: int = 7_000,
    use_depth: bool = False,
    depth_offset: float = 0.5,
    depth_prominence: float = 20.0,
    white_background: bool = False,
    capacity: int = 1 << 17,
    log2_hashmap: int = 19,
    progress_every: int = 500,
    img_size: int = 512,
    seed: int = 0,
    checkpoint_iterations=(),
    test_iterations=(),
    start_checkpoint=None,
    logger=None,
    max_per_tile: int = 128,
    macro_capacity: int = 1024,
    views_per_step: int = 1,
    mesh_dp: int = 0,
    gaussian_shard: bool = False,
    fit_train_selection: bool = False,
    resolution: int = -1,
) -> str:
    """Train a stylized 3DGS scene; saves a compressed model. Returns
    model_path.

    ``mesh_dp`` > 1 builds a (dp,) device mesh over the first mesh_dp
    devices and runs the loop multi-chip (view batches dp-sharded;
    ``gaussian_shard`` also shards the colorfield over the splat set —
    see gs.train.train)."""
    import dataclasses

    cfg = GSTrainConfig(
        iterations=iterations, freeze_iters=freeze_iters,
        white_background=white_background, capacity=capacity,
        log2_hashmap=log2_hashmap,
        max_per_tile=max_per_tile, macro_capacity=macro_capacity,
    )
    # ``resolution`` follows the reference's ``-r`` camera downscale rule
    # (arguments/__init__.py resolution; camera_utils.py:19-52): -1 keeps
    # native size (with the >1.6K auto-rescale), 2/4/8 divide.
    scene = Scene(str(content_path), white_background=white_background,
                  resolution=resolution)
    if fit_train_selection:
        # Exact-training mode: fit dup_span / giant_capacity /
        # macro_capacity to the initial scene's measured demand (with
        # extra margin for densification growth) so training renders
        # never truncate giants. Slower per step on giant-heavy scenes;
        # without it the model learns to compensate for the capped
        # selection and must be rendered with the same shape (recorded
        # below either way).
        import jax.numpy as _jnp

        from aip_tpu.gs.gaussians import create_from_pcd
        from aip_tpu.gs.render import fit_selection

        pcd = scene.point_cloud
        st0, _dc = create_from_pcd(_jnp.asarray(pcd.points),
                                   _jnp.asarray(pcd.colors), capacity)
        sel0 = fit_selection(st0, scene.getTrainCameras(), margin=1.5)
        print(f"fit_train_selection: {sel0}", flush=True)
        cfg = dataclasses.replace(
            cfg, dup_span=sel0["dup_span"],
            giant_capacity=sel0["giant_capacity"],
            giant_backend=sel0.get("giant_backend", "merge"),
            giant_span=sel0.get("giant_span", cfg.giant_span),
            # Pools only ever GROW from the config defaults: the fit sees
            # the INITIAL cloud (few giants), but training grows thousands
            # of them (bed_0037: 13.8k) — a fitted-small pool would drop
            # the rearmost late in training. Pool slack is cheap (static
            # pair slots, ~1M extra sort entries at the 16384 default).
            giant_pool=max(sel0.get("giant_pool", 0), cfg.giant_pool),
            giant_pool_full=max(sel0.get("giant_pool_full", 0),
                                cfg.giant_pool_full))
        # NOTE max_per_tile and macro_capacity stay the caller's: the fit
        # measures the INITIAL cloud, whose fog-like 100k random points
        # give per-tile/per-block demand far above what the pruned scene
        # ever needs — a fog-fitted kc=4096 OOMs the 800^2 B=8 step
        # (measured: 21.9G vs 15.75G HBM). The fit's job here is GIANT
        # exactness (backend/span/pools); capacities follow the recorded
        # consistency contract like every other run.
    trainer, style_f = train(
        scene, style_img_path, cfg,
        use_depth=use_depth, depth_offset=depth_offset,
        depth_prominence=depth_prominence, img_size=img_size,
        guide_dir=str(Path(model_path) / "stylized"),
        progress_every=progress_every, seed=seed,
        checkpoint_iterations=checkpoint_iterations,
        test_iterations=test_iterations,
        start_checkpoint=start_checkpoint,
        checkpoint_dir=str(Path(model_path) / "checkpoints"),
        logger=logger,
        views_per_step=views_per_step,
        mesh=_dp_mesh(mesh_dp), gaussian_shard=gaussian_shard,
    )

    out = Path(model_path)
    out.mkdir(parents=True, exist_ok=True)
    report = compress_mod.save_npz(
        out / "model.npz", trainer.gstate, trainer.field,
        trainer.rvq_scale, trainer.rvq_rot,
    )
    (out / "storage").write_text(report)
    (out / "cfg_args.json").write_text(json.dumps({
        "source_path": str(content_path),
        "white_background": white_background,
        "resolution": resolution,
        "iterations": iterations,
        "freeze_iters": freeze_iters,
        "log2_hashmap": log2_hashmap,
        # The selection shape TRAINING rendered with. Inference must
        # reuse it: a model trained under a truncating selection learns
        # to compensate, and rendering it with a different (even exact)
        # shape changes what the loss optimized (BENCHMARKS.md
        # "Real-scene exactness": exact re-render of a truncation-trained
        # scene DROPS PSNR 16.3 -> 13.9).
        "selection": {
            "max_per_tile": cfg.max_per_tile,
            "macro_capacity": cfg.macro_capacity,
            "dup_span": cfg.dup_span,
            "giant_capacity": cfg.giant_capacity,
            "giant_backend": cfg.giant_backend,
            "giant_span": cfg.giant_span,
            "giant_pool": cfg.giant_pool,
            "giant_pool_full": cfg.giant_pool_full,
        },
    }))
    return str(model_path)


def run_3dgs_rendering(
    style_image,
    model_path="output/3dgs_model",
    output_dir=None,
    max_per_tile: int = 128,
    fps: int = 10,
    renderer: str = "auto",
    mesh_dp: int = 0,
) -> str:
    """Render the trained scene under a (possibly new) style; returns the
    GIF path (render.py:51-113 parity).

    ``mesh_dp`` > 1 renders with the Gaussian arrays SHARDED over a (dp,)
    mesh (parallel.gs.rasterize_sharded) — the model-parallel path for
    splat sets beyond one chip's HBM; exact vs the replicated renderer."""
    from PIL import Image

    from aip_tpu.gs.colorfield import precompute_features
    from aip_tpu.gs.render import (fit_selection, make_inference_frame_fn,
                                   render, render_frame,
                                   settings_from_selection)
    from aip_tpu.pipelines.adain_infer import get_style_embeddings, _to_array

    model_path = Path(model_path)
    cfg_args = json.loads((model_path / "cfg_args.json").read_text())
    state, field, rvq_scale, rvq_rot = compress_mod.load_npz(model_path / "model.npz")

    scene = Scene(cfg_args["source_path"],
                  white_background=cfg_args.get("white_background", False),
                  resolution=cfg_args.get("resolution", -1),
                  shuffle=False)
    # Size the macro candidate lists to this scene's measured per-block
    # demand — a fixed 1024 truncates dense trained scenes into
    # screen-aligned rectangles (bathtub_0121 peaks at ~2.6k). Only pay
    # the pre-pass when the macro (matmul) compositor will actually run:
    # 'auto' picks it at >= 512^2 (gs/render.py), 'xla'/'pallas' ignore it.
    cams_all = scene.getTrainCameras()
    uses_macro = renderer in ("auto", "matmul") and any(
        c.image_height * c.image_width >= 512 * 512 for c in cams_all)
    if "selection" in cfg_args:
        # Render with the EXACT selection shape training optimized under
        # (see the cfg_args comment in run_3dgs_training).
        sel = cfg_args["selection"]
    elif uses_macro:
        # Legacy model (no recorded shape): reproduce the legacy render
        # behavior — fitted capacity, default spans.
        sel = dict(fit_selection(state, cams_all), dup_span=3,
                   giant_capacity=128, giant_backend="merge")
    else:
        sel = {"macro_capacity": 1024, "dup_span": 2,
               "giant_capacity": 128}
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg_args.get("white_background") else [0.0, 0.0, 0.0])

    style_f = None
    if field.style_w is not None:
        feat = get_style_embeddings(_to_array(style_image))
        style_f = jnp.mean(feat, axis=(1, 2))

    out_dir = Path(output_dir or (model_path / "renders"))
    out_dir.mkdir(parents=True, exist_ok=True)
    mesh = _dp_mesh(mesh_dp)
    # Hash features are camera-independent (reference `gaussians.
    # precompute()`, gaussian_model.py:653) — decode them once, and on the
    # single-device matmul path compile ONE whole-frame program per
    # resolution (make_inference_frame_fn) instead of dispatching the
    # field/SH/rasterizer separately every view.
    enc = precompute_features(field, state.xyz)
    frame_fns = {}
    frames = []
    for i, cam in enumerate(cams_all):
        settings = settings_from_selection(
            sel, cam.image_height, cam.image_width,
            max_per_tile=sel.get("max_per_tile", max_per_tile))
        if (mesh is None and renderer in ("auto", "matmul")
                and cam.image_height * cam.image_width >= 512 * 512):
            key = (cam.image_height, cam.image_width)
            if key not in frame_fns:
                frame_fns[key] = make_inference_frame_fn(
                    state, field, settings, bg, style_f=style_f,
                    precomputed_enc=enc)
            rendered = render_frame(frame_fns[key], cam)
        else:
            rendered = render(cam, state, field, bg, style_f=style_f,
                              mode="inference", settings=settings,
                              renderer=renderer, mesh=mesh,
                              precomputed_enc=enc).render
        img = np.clip(np.asarray(rendered), 0, 1)
        im = Image.fromarray((img * 255).astype(np.uint8))
        im.save(out_dir / f"{i:05d}.png")
        frames.append(im)

    gif_path = out_dir / "render.gif"
    if frames:
        frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
    return str(gif_path)

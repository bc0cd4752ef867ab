"""Real-scene novel-view render FPS (the BASELINE.md north-star metric on
an actual trained model instead of the synthetic fog).

Loads a trained+compressed model dir (`run_3dgs.py` output: model.npz +
cfg_args.json), rebuilds the scene's train poses at a target resolution
(default 1080p), fits the macro candidate capacity to measured demand
(`fit_macro_capacity`), precomputes the hash features (the reference's
`gaussians.precompute()`, `gaussian_model.py:653`), and times the
inference renderer over a cycle of real poses with chained dispatches.

Usage: python scripts/bench_real_render.py --model output/bathtub_fast
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--style", default="/root/reference/input/style/brushstrokes.jpg")
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--views", type=int, default=8, help="distinct poses cycled")
    p.add_argument("--reps", type=int, default=16, help="chained dispatches per sync")
    p.add_argument("--renderer", default="matmul")
    p.add_argument("--macro", type=int, default=4,
                   help="macro block edge in tiles (A/B: 4 vs 8)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aip_tpu.gs import compress as compress_mod
    from aip_tpu.gs.cameras import Camera, focal2fov, fov2focal
    from aip_tpu.gs.colorfield import precompute_features
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.render import (fit_selection, make_inference_frame_fn,
                                   render, render_frame)
    from aip_tpu.gs.rasterizer import RasterSettings
    from aip_tpu.pipelines.adain_infer import get_style_embeddings, _to_array

    model_path = Path(args.model)
    cfg_args = json.loads((model_path / "cfg_args.json").read_text())
    state, field, _rvq_s, _rvq_r = compress_mod.load_npz(model_path / "model.npz")
    scene = Scene(cfg_args["source_path"],
                  white_background=cfg_args.get("white_background", False),
                  shuffle=False)

    # Re-pose the scene's train cameras at the bench resolution, keeping the
    # horizontal focal length (FoVx) and deriving FoVy from the new aspect.
    src = scene.getTrainCameras()
    step = max(1, len(src) // args.views)
    blank = np.zeros((args.height, args.width, 3), np.float32)
    cams = []
    for c in src[::step][: args.views]:
        fy = focal2fov(fov2focal(c.FoVx, args.width), args.height)
        cams.append(Camera(colmap_id=0, R=c.R, T=c.T, FoVx=c.FoVx, FoVy=fy,
                           image=blank, image_name=c.image_name, uid=0))

    sel = fit_selection(state, cams, hi=8192, macro=args.macro)
    kc = sel["macro_capacity"]
    live = int(np.asarray(state.active).sum())
    print(f"live gaussians {live}, fitted selection {sel}", flush=True)

    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg_args.get("white_background")
                     else [0.0, 0.0, 0.0])
    style_f = None
    if field.style_w is not None:
        feat = get_style_embeddings(_to_array(args.style))
        style_f = jnp.mean(feat, axis=(1, 2))
    enc = precompute_features(field, state.xyz)

    from aip_tpu.gs.render import settings_from_selection

    settings = settings_from_selection(
        sel, args.height, args.width, macro=args.macro,
        composite_backend="mxu")

    def sync(x):
        np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))

    if args.renderer == "matmul":
        # Serving path: one jitted camera->image program, SH hoisted.
        # Camera operands are staged on-device ONCE — per-frame host
        # jnp.asarray conversions are extra relay dispatches (~2 ms each).
        fn = make_inference_frame_fn(state, field, settings, bg,
                                     style_f=style_f, precomputed_enc=enc)
        staged = [
            (jnp.asarray(c.world_view_transform, jnp.float32),
             jnp.asarray(c.full_proj_transform, jnp.float32),
             jnp.asarray(c.camera_center, jnp.float32),
             jnp.float32(math.tan(c.FoVx * 0.5)),
             jnp.float32(math.tan(c.FoVy * 0.5)))
            for c in cams]

        # index-based: Camera dataclass __eq__ compares array fields
        # elementwise, so list.index() raises on ambiguous truth values
        def frame(ci):
            return fn(*staged[ci])
    else:
        def frame(ci):
            return render(cams[ci], state, field, bg, style_f=style_f,
                          mode="inference", settings=settings,
                          precomputed_enc=enc, renderer=args.renderer).render

    for ci in range(len(cams)):  # compile + warm every pose
        sync(frame(ci))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(args.reps):
            img = frame(i % len(cams))
        sync(img)
        best = min(best, (time.perf_counter() - t0) / args.reps)
    print(json.dumps({
        "metric": "gs_real_scene_render",
        "scene": cfg_args["source_path"],
        "resolution": [args.height, args.width],
        "live_gaussians": live,
        "macro_capacity": kc,
        "ms_per_frame": round(best * 1000, 1),
        "fps": round(1.0 / best, 2),
    }))


if __name__ == "__main__":
    main()

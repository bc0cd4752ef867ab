"""On-chip exactness check for the fitted tiered selection: render one
1080p frame of a trained model through (a) the serving path
(make_inference_frame_fn: fitted giant_tiers + direct emission) and
(b) the uncapped supertile-merge selection, and report the pixel delta.

Expected: mean ~1e-7 (fp summation order), max ~1e-3 (quantized-depth
tie reordering) — see BENCHMARKS.md "Real-scene exactness".

Usage: python scripts/verify_render_exact.py --model output/bed_0037_r4
"""

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--style", default="/root/reference/input/style/gogh.jpg")
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--merge_kg", type=int, default=16384)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aip_tpu.gs import compress as compress_mod
    from aip_tpu.gs.cameras import Camera, focal2fov, fov2focal
    from aip_tpu.gs.colorfield import precompute_features, predict_sh
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.rasterizer import rasterize_matmul
    from aip_tpu.gs.render import (_sh_colors, fit_selection,
                                   make_inference_frame_fn, render_frame,
                                   settings_from_selection)
    from aip_tpu.pipelines.adain_infer import get_style_embeddings, _to_array

    model_path = Path(args.model)
    cfg_args = json.loads((model_path / "cfg_args.json").read_text())
    state, field, _s, _r = compress_mod.load_npz(model_path / "model.npz")
    scene = Scene(cfg_args["source_path"],
                  white_background=cfg_args.get("white_background", False),
                  shuffle=False)
    c = scene.getTrainCameras()[0]
    fy = focal2fov(fov2focal(c.FoVx, args.width), args.height)
    blank = np.zeros((args.height, args.width, 3), np.float32)
    cam = Camera(colmap_id=0, R=c.R, T=c.T, FoVx=c.FoVx, FoVy=fy,
                 image=blank, image_name=c.image_name, uid=0)

    sel = fit_selection(state, [cam], hi=8192)
    print("fitted:", sel, flush=True)
    settings = settings_from_selection(sel, args.height, args.width,
                                       macro=4, composite_backend="mxu")

    style_f = None
    if field.style_w is not None:
        feat = get_style_embeddings(_to_array(args.style))
        style_f = jnp.mean(feat, axis=(1, 2))
    enc = precompute_features(field, state.xyz)
    bg = jnp.zeros((3,), jnp.float32)

    fn = make_inference_frame_fn(state, field, settings, bg,
                                 style_f=style_f, precomputed_enc=enc)
    img = np.asarray(render_frame(fn, cam))

    # Uncapped merge reference (same composite backend, merge selection).
    ref_settings = settings._replace(giant_backend="merge", giant_tiers=(),
                                     giant_capacity=args.merge_kg)
    sh = predict_sh(field, state.xyz, style_f, precomputed_enc=enc)
    colors = _sh_colors(sh, state.xyz,
                        jnp.asarray(cam.camera_center, jnp.float32))
    ref, _ = rasterize_matmul(
        state.xyz, jnp.exp(state.scaling), state.rotation,
        jnp.where(state.active, jax.nn.sigmoid(state.opacity)[:, 0], 0.0),
        colors, jnp.asarray(cam.world_view_transform, jnp.float32),
        jnp.asarray(cam.full_proj_transform, jnp.float32), bg, ref_settings,
        tanfovx=math.tan(cam.FoVx * 0.5), tanfovy=math.tan(cam.FoVy * 0.5),
        interpret=args.cpu)
    d = np.abs(img - np.asarray(ref))
    print(json.dumps({
        "metric": "render_exactness_tiers_vs_merge",
        "resolution": [args.height, args.width],
        "mean_abs": float(d.mean()), "max_abs": float(d.max()),
    }))


if __name__ == "__main__":
    main()

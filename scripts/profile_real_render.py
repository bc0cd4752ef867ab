"""Phase decomposition of the real-scene 1080p render (the 75.6 ms on
bed_0037_r4): field decode / projection / pairsort selection / packed
attribute gather / MXU composite, prefix-differenced on the trained
model with the fitted-exact selection shape (same setup as
scripts/bench_real_render.py).

Usage: python scripts/profile_real_render.py --model output/bed_0037_r4
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
    p.add_argument("--style", default="/root/reference/input/style/gogh.jpg")
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from aip_tpu.gs import compress as compress_mod
    from aip_tpu.gs import rasterizer as R
    from aip_tpu.gs.cameras import Camera, focal2fov, fov2focal
    from aip_tpu.gs.colorfield import precompute_features, predict_sh
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.render import (_sh_colors, fit_selection,
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

    vm = jnp.asarray(cam.world_view_transform, jnp.float32)
    pm = jnp.asarray(cam.full_proj_transform, jnp.float32)
    campos = jnp.asarray(cam.camera_center, jnp.float32)
    tanx = math.tan(cam.FoVx * 0.5)
    tany = math.tan(cam.FoVy * 0.5)
    bg = jnp.zeros((3,), jnp.float32)

    xyz = state.xyz
    scales = jnp.exp(state.scaling)
    rotations = state.rotation
    opacity = jnp.where(state.active,
                        jax.nn.sigmoid(state.opacity)[:, 0], 0.0)

    th, tw = R._tile_grid(settings)
    m = settings.macro
    mth, mtw = math.ceil(th / m), math.ceil(tw / m)
    n = xyz.shape[0]

    def colors_fn():
        sh = predict_sh(field, xyz, style_f, precomputed_enc=enc)
        return _sh_colors(sh, xyz, campos)

    colors_const = jax.jit(colors_fn)()

    def proj():
        return R.project_gaussians(xyz, scales, rotations, vm, pm,
                                   tanx, tany, settings)

    def select():
        mean2d, depths, conics, radii, valid = proj()
        valid = valid & (opacity > (1.0 / 255.0))
        radii_sel = R.cull_radii(radii, opacity, settings)
        macro_idx, _ = R._macro_select(mean2d, depths, radii_sel, valid,
                                       settings, mth, mtw)
        return macro_idx, mean2d, conics

    def gather():
        macro_idx, mean2d, conics = select()
        logop = jnp.log(jnp.maximum(opacity, 1e-30))
        table = jnp.concatenate([
            mean2d, conics, logop[:, None], colors_const,
            jnp.zeros((n, 7), mean2d.dtype)], axis=1)
        raw = table[jnp.maximum(macro_idx, 0)]
        counts = jnp.sum(macro_idx >= 0, axis=1).astype(jnp.int32)
        return raw, counts

    def composite():
        from aip_tpu.ops.pallas.composite import composite_macro_mxu_pallas
        raw, counts = gather()
        bs = m * R.TILE
        planes = composite_macro_mxu_pallas(raw, counts, bg, bs=bs, mtw=mtw,
                                            interpret=args.cpu)
        img = planes.reshape(mth, mtw, 3, bs, bs).transpose(0, 3, 1, 4, 2)
        return img.reshape(mth * bs, mtw * bs, 3)

    def full():
        return R.rasterize_matmul(xyz, scales, rotations, opacity,
                                  colors_fn(), vm, pm, bg, settings,
                                  tanfovx=tanx, tanfovy=tany)[0]

    def sync(x):
        np.asarray(jax.lax.slice(jnp.ravel(x), (0,), (1,)))

    def bench(fn, reps=args.reps, rounds=3):
        f = jax.jit(fn)
        out = f()
        sync(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f()
            sync(jax.tree_util.tree_leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1000

    t_col = bench(colors_fn)
    t_proj = bench(proj)
    t_sel = bench(select)
    t_gat = bench(gather)
    t_cmp = bench(composite)
    t_full = bench(full)
    print(f"colors (field decode + SH): {t_col:8.2f} ms")
    print(f"projection:                 {t_proj:8.2f} ms")
    print(f"+ pairsort selection:       {t_sel:8.2f} ms  (delta {t_sel - t_proj:.2f})")
    print(f"+ packed [M,Kc,16] gather:  {t_gat:8.2f} ms  (delta {t_gat - t_sel:.2f})")
    print(f"+ MXU composite:            {t_cmp:8.2f} ms  (delta {t_cmp - t_gat:.2f})")
    print(f"full rasterize_matmul+col:  {t_full:8.2f} ms")
    print(json.dumps({
        "metric": "real_render_phases",
        "colors_ms": round(t_col, 2), "project_ms": round(t_proj, 2),
        "select_delta_ms": round(t_sel - t_proj, 2),
        "gather_delta_ms": round(t_gat - t_sel, 2),
        "composite_delta_ms": round(t_cmp - t_gat, 2),
        "full_ms": round(t_full, 2),
    }))


if __name__ == "__main__":
    main()

"""Split the 1080p render frame time into phases (projection / macro
selection / composite) for the matmul and fused backends, on the same
synthetic worst-case scene as scripts/bench_gs.py.

Usage: python scripts/profile_gs.py [--n 100000] [--macro 4] [--kc 512]
"""

import argparse
import functools
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--height", type=int, default=1088)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--macro", type=int, default=4)
    parser.add_argument("--kc", type=int, default=512)
    parser.add_argument("--chunk", type=int, default=8192)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from aip_tpu.gs.cameras import Camera
    from aip_tpu.gs import rasterizer as R

    def sync(x):
        np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))

    def bench(fn, *a, reps=4, rounds=3):
        out = fn(*a)
        sync(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            sync(jax.tree_util.tree_leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1000, out

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray((rng.random((n, 3)) * 2 - 1).astype(np.float32))
    # Same area-constant protocol as scripts/bench_gs.py scaling rows.
    area = math.sqrt(100_000 / n)
    scales = jnp.asarray(
        ((rng.random((n, 3)) * 0.01 + 0.003) * area).astype(np.float32))
    quats = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    opac = jnp.asarray((rng.random(n) * 0.8 + 0.1).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))

    H, W = args.height, args.width
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 FoVx=1.2, FoVy=0.8, image=np.zeros((H, W, 3), np.float32),
                 image_name="b", uid=0)
    vm = jnp.asarray(cam.world_view_transform)
    pm = jnp.asarray(cam.full_proj_transform)
    tx, ty = math.tan(cam.FoVx * 0.5), math.tan(cam.FoVy * 0.5)
    bg = jnp.zeros(3)

    s = R.RasterSettings(H, W, max_per_tile=128, chunk=args.chunk,
                         macro=args.macro, macro_capacity=args.kc,
                         dup_span=2)
    th, tw = R._tile_grid(s)
    m = s.macro
    mth, mtw = math.ceil(th / m), math.ceil(tw / m)
    ms = R.RasterSettings(image_height=mth * R.TILE, image_width=mtw * R.TILE,
                          max_per_tile=s.macro_capacity, chunk=s.chunk)

    # Phase 1: projection
    proj = jax.jit(functools.partial(R.project_gaussians, settings=s))
    t_proj, (mean2d, depths, conics, radii, valid) = bench(
        proj, means, scales, quats, vm, pm, tx, ty)
    nvis = int(np.asarray(jnp.sum(valid)))
    rmean = float(np.asarray(jnp.sum(jnp.where(valid, radii, 0)) / nvis))

    # Phase 2: macro selection (same culled radii the benched path uses)
    @jax.jit
    def sel(mean2d, depths, radii, valid, opac):
        v = valid & (opac > (1.0 / 255.0))
        rs = R.cull_radii(radii, opac, s)
        return R._macro_select(mean2d, depths, rs, v, s, mth, mtw)
    t_sel, (macro_idx, _md) = bench(sel, mean2d, depths, radii, valid, opac)
    occ = np.asarray(jnp.mean(jnp.sum(macro_idx >= 0, axis=1)))
    occ_max = int(np.asarray(jnp.max(jnp.sum(macro_idx >= 0, axis=1))))

    # Phase 3a: matmul composite
    @jax.jit
    def comp_mm(macro_idx, mean2d, conics, colors, opac):
        return R._composite_macro_matmul(macro_idx, mean2d, conics, colors,
                                         opac, bg, th, tw, m, mtw)
    t_mm, _ = bench(comp_mm, macro_idx, mean2d, conics, colors, opac)

    # Phase 3b: fused pallas composite (per-16px-tile walk)
    from aip_tpu.ops.pallas.composite import composite_from_macro_pallas

    @jax.jit
    def comp_pl(macro_idx, mean2d, conics, colors, opac):
        mvalid = macro_idx >= 0
        safe = jnp.maximum(macro_idx, 0)
        return composite_from_macro_pallas(
            mean2d[safe], conics[safe], colors[safe], opac[safe], mvalid,
            bg, n_tiles=th * tw, tile_w=tw, macro=m, macro_tile_w=mtw)
    try:
        t_pl, _ = bench(comp_pl, macro_idx, mean2d, conics, colors, opac)
    except Exception as e:
        t_pl = float("nan")
        print("pallas composite failed:", type(e).__name__, str(e)[:200])

    # Phase 3c: dense-group MXU kernel path, split gather vs kernel
    @jax.jit
    def comp_mxu(macro_idx, mean2d, conics, colors, opac):
        return R._composite_macro_mxu(macro_idx, mean2d, conics, colors,
                                      opac, bg, m, mth, mtw)
    try:
        t_mxu, _ = bench(comp_mxu, macro_idx, mean2d, conics, colors, opac)
    except Exception as e:
        t_mxu = float("nan")
        print("mxu composite failed:", type(e).__name__, str(e)[:200])

    @jax.jit
    def gather_only(macro_idx, mean2d, conics, colors, opac):
        logop = jnp.log(jnp.maximum(opac, 1e-30))
        table = jnp.concatenate([
            mean2d, conics, logop[:, None], colors,
            jnp.zeros((n, 7), mean2d.dtype)], axis=1)
        raw = table[jnp.maximum(macro_idx, 0)]
        counts = jnp.sum(macro_idx >= 0, axis=1).astype(jnp.int32)
        return raw, counts
    t_gather, _ = bench(gather_only, macro_idx, mean2d, conics, colors, opac)

    # Full paths for cross-checking
    t_full_mm, _ = bench(
        functools.partial(R.rasterize_matmul, settings=s, tanfovx=tx, tanfovy=ty),
        means, scales, quats, opac, colors, vm, pm, bg)
    s_mxu = R.RasterSettings(H, W, max_per_tile=128, chunk=args.chunk,
                             macro=args.macro, macro_capacity=args.kc,
                             dup_span=2, composite_backend="mxu")
    t_full_mxu, _ = bench(
        functools.partial(R.rasterize_matmul, settings=s_mxu,
                          tanfovx=tx, tanfovy=ty),
        means, scales, quats, opac, colors, vm, pm, bg)

    print(f"scene: n={n} visible={nvis} mean_radius={rmean:.1f}px "
          f"macro_grid={mth}x{mtw} kc_occupancy={occ:.0f} max {occ_max} "
          f"/ {args.kc}")
    print(f"projection      : {t_proj:7.2f} ms")
    print(f"macro selection : {t_sel:7.2f} ms  (select={s.select_backend}, "
          f"chunk={args.chunk})")
    print(f"composite matmul: {t_mm:7.2f} ms  (macro={m}, P={(m*16)**2})")
    print(f"composite pallas: {t_pl:7.2f} ms  (per-tile walk)")
    print(f"composite mxu   : {t_mxu:7.2f} ms  (gather alone {t_gather:.2f} ms)")
    print(f"FULL matmul path: {t_full_mm:7.2f} ms = {1000/t_full_mm:.1f} FPS")
    print(f"FULL mxu path   : {t_full_mxu:7.2f} ms = {1000/t_full_mxu:.1f} FPS")


if __name__ == "__main__":
    main()

"""Experiments: macro-selection strategies at the 1080p bench config.

Candidates to replace the chunked top_k merge (78ms at 100k Gaussians,
510 macro blocks, Kc=512):
  a) chunk sweep of the existing merge
  b) single-pass top_k over the full [blocks, N] key matrix
  c) approx_max_k (TPU PartialReduce)
  d) pair-sort: duplicate each Gaussian into its hit blocks (static D),
     lexicographic sort by (block, depth), searchsorted + gather segments
"""

import argparse
import functools
import math
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
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
    scales = jnp.asarray((rng.random((n, 3)) * 0.01 + 0.003).astype(np.float32))
    quats = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))

    H, W = 1088, 1920
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 FoVx=1.2, FoVy=0.8, image=np.zeros((H, W, 3), np.float32),
                 image_name="b", uid=0)
    vm = jnp.asarray(cam.world_view_transform)
    pm = jnp.asarray(cam.full_proj_transform)
    tx, ty = math.tan(cam.FoVx * 0.5), math.tan(cam.FoVy * 0.5)

    s = R.RasterSettings(H, W, max_per_tile=128, chunk=8192, macro=4,
                         macro_capacity=512)
    th, tw = R._tile_grid(s)
    m = s.macro
    mth, mtw = math.ceil(th / m), math.ceil(tw / m)
    n_blocks = mth * mtw
    kc = s.macro_capacity

    proj = jax.jit(functools.partial(R.project_gaussians, settings=s))
    mean2d, depths, conics, radii, valid = proj(means, scales, quats, vm, pm, tx, ty)
    mean2d, depths, radii, valid = map(
        lambda x: jnp.asarray(np.asarray(x)), (mean2d, depths, radii, valid))

    # Reference result for recall checks
    ms_ = R.RasterSettings(image_height=mth * R.TILE, image_width=mtw * R.TILE,
                           max_per_tile=kc, chunk=8192)
    sel_ref = jax.jit(functools.partial(R.select_per_tile, settings=ms_))
    t, (ref_idx, ref_d) = bench(sel_ref, mean2d / m, depths, radii / m, valid)
    print(f"a) chunk-merge 8192          : {t:7.2f} ms")
    ref_sets = [set(np.asarray(ref_idx[b])[np.asarray(ref_idx[b]) >= 0].tolist())
                for b in range(n_blocks)]
    ref_count = sum(len(s_) for s_ in ref_sets)

    for chunk in (32768, 131072):
        ms2 = ms_._replace(chunk=chunk)
        sel2 = jax.jit(functools.partial(R.select_per_tile, settings=ms2))
        t, _ = bench(sel2, mean2d / m, depths, radii / m, valid)
        print(f"a) chunk-merge {chunk:6d}        : {t:7.2f} ms")

    # b/c) one-shot key matrix [blocks, N] (built once) then top_k / approx
    bs = m * R.TILE
    bx0 = (jnp.arange(n_blocks) % mtw * bs).astype(jnp.float32)
    by0 = (jnp.arange(n_blocks) // mtw * bs).astype(jnp.float32)

    def keys_fn(mean2d, depths, radii, valid):
        ox = (mean2d[None, :, 0] + radii[None] >= bx0[:, None]) & (
            mean2d[None, :, 0] - radii[None] < bx0[:, None] + bs)
        oy = (mean2d[None, :, 1] + radii[None] >= by0[:, None]) & (
            mean2d[None, :, 1] - radii[None] < by0[:, None] + bs)
        hit = ox & oy & valid[None] & (radii[None] > 0)
        return jnp.where(hit, depths[None], jnp.inf)

    def one_topk(mean2d, depths, radii, valid):
        key = keys_fn(mean2d, depths, radii, valid)
        negd, idx = jax.lax.top_k(-key, kc)
        return jnp.where(jnp.isinf(negd), -1, idx), -negd

    t, (bi, _) = bench(jax.jit(one_topk), mean2d, depths, radii, valid)
    print(f"b) single top_k [510,100k]   : {t:7.2f} ms")

    def one_approx(mean2d, depths, radii, valid):
        key = keys_fn(mean2d, depths, radii, valid)
        negd, idx = jax.lax.approx_max_k(-key, kc, recall_target=0.95,
                                         aggregate_to_topk=True)
        return jnp.where(jnp.isinf(negd), -1, idx), -negd

    try:
        t, (ci, _) = bench(jax.jit(one_approx), mean2d, depths, radii, valid)
        hits = sum(len(ref_sets[b] & set(np.asarray(ci[b])[np.asarray(ci[b]) >= 0].tolist()))
                   for b in range(n_blocks))
        print(f"c) approx_max_k              : {t:7.2f} ms  recall={hits/max(ref_count,1):.4f}")
    except Exception as e:
        print("c) approx_max_k failed:", str(e)[:160])

    # d) pair-sort with static dup factor D (DxD block rect, row-major)
    for D in (2, 3):
        def pair_sort(mean2d, depths, radii, valid, D=D):
            # hit block rect in macro coords
            x0 = jnp.floor((mean2d[:, 0] - radii) / bs).astype(jnp.int32)
            x1 = jnp.floor((mean2d[:, 0] + radii) / bs).astype(jnp.int32)
            y0 = jnp.floor((mean2d[:, 1] - radii) / bs).astype(jnp.int32)
            y1 = jnp.floor((mean2d[:, 1] + radii) / bs).astype(jnp.int32)
            dx = jnp.arange(D)[None, :]
            bxs = x0[:, None] + dx  # [N, D]
            bys = y0[:, None] + dx
            okx = (bxs >= 0) & (bxs < mtw) & (bxs <= x1[:, None])
            oky = (bys >= 0) & (bys < mth) & (bys <= y1[:, None])
            blk = bys[:, :, None] * mtw + bxs[:, None, :]  # [N, D, D]
            ok = oky[:, :, None] & okx[:, None, :] & valid[:, None, None] & (radii[:, None, None] > 0)
            blk = jnp.where(ok, blk, n_blocks).reshape(-1)
            dep = jnp.broadcast_to(depths[:, None, None], ok.shape).reshape(-1)
            gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None], ok.shape).reshape(-1)
            blk_s, dep_s, gid_s = jax.lax.sort((blk, dep, gid), num_keys=2)
            starts = jnp.searchsorted(blk_s, jnp.arange(n_blocks))
            ends = jnp.searchsorted(blk_s, jnp.arange(n_blocks) + 1)
            pos = starts[:, None] + jnp.arange(kc)[None, :]
            ok2 = pos < ends[:, None]
            idx = jnp.where(ok2, gid_s[jnp.minimum(pos, blk.shape[0] - 1)], -1)
            d = jnp.where(ok2, dep_s[jnp.minimum(pos, blk.shape[0] - 1)], jnp.inf)
            return idx, d

        t, (di, _) = bench(jax.jit(pair_sort), mean2d, depths, radii, valid)
        hits = sum(len(ref_sets[b] & set(np.asarray(di[b])[np.asarray(di[b]) >= 0].tolist()))
                   for b in range(n_blocks))
        print(f"d) pair-sort D={D}x{D}           : {t:7.2f} ms  recall={hits/max(ref_count,1):.4f}")


if __name__ == "__main__":
    main()

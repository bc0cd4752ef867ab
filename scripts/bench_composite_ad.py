"""Differentiable-composite backend shootout across resolutions: where
does the streamed Pallas custom-VJP (constant VMEM working set) beat XLA
autodiff through the dense [tiles, K, 256] pipeline (+remat above 0.5GB)?

VERDICT r2 weak #4 / next #10: find the regime, wire it into the
auto-selection, document it.

Usage: python -u scripts/bench_composite_ad.py [--res 512 1088] [--n 131072]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, nargs="+", default=[512, 800, 1088])
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backends", nargs="+", default=["xla", "pallas"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aip_tpu.gs.rasterizer import RasterSettings, rasterize

    rng = np.random.default_rng(0)
    n = args.n
    xyz = jnp.asarray((rng.random((n, 3)) * 2 - 1).astype(np.float32))
    scales = jnp.asarray((rng.random((n, 3)) * 0.02 + 0.004).astype(np.float32))
    q = rng.standard_normal((n, 4)).astype(np.float32)
    rots = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    ops = jnp.asarray((rng.random(n) * 0.9).astype(np.float32))
    cols = jnp.asarray(rng.random((n, 3)).astype(np.float32))

    from aip_tpu.gs.cameras import Camera

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    for res in args.res:
        cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 2.5]),
                     FoVx=1.1, FoVy=1.1,
                     image=np.zeros((res, res, 3), np.float32),
                     image_name="c", uid=0)
        vm = jnp.asarray(cam.world_view_transform, jnp.float32)
        pm = jnp.asarray(cam.full_proj_transform, jnp.float32)
        bg = jnp.zeros(3)
        n_tiles = ((res + 15) // 16) ** 2
        buf_mb = n_tiles * 128 * 256 * 4 / 1e6
        for backend in args.backends:
            remat = backend == "xla" and buf_mb > 512
            settings = RasterSettings(
                image_height=res, image_width=res, max_per_tile=128,
                macro=4, macro_capacity=1024, ad_backend=backend,
                remat_composite=remat)

            @jax.jit
            def loss_fn(op, settings=settings, vm=vm, pm=pm, bg=bg):
                img, _ = rasterize(xyz, scales, rots, op, cols, vm, pm,
                                   bg, settings, tanfovx=0.6131, tanfovy=0.6131)
                return jnp.mean(img)

            g = jax.jit(jax.grad(loss_fn))
            try:
                t_c0 = time.time()
                out = g(ops)
                sync(out)
                compile_s = time.time() - t_c0
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = g(ops)
                sync(out)
                dt = (time.perf_counter() - t0) / args.iters * 1000
                print(f"res {res} ({buf_mb:.0f} MB dense buffer, "
                      f"remat={remat}): {backend:6s} {dt:8.1f} ms/fwd+bwd "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                print(f"res {res}: {backend} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()

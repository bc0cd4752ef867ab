"""Experiments: macro-block matmul composite variants at the 1080p bench
config (510 blocks, Kc=512, P=4096). Baseline: 34.8 ms.

Variants: lax.map batch_size, direct cumprod vs log-space transmittance,
matmul precision HIGH vs HIGHEST, bf16 alpha math, early-exit candidate
chunking via while_loop.
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
    opac = jnp.asarray((rng.random(n) * 0.8 + 0.1).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))

    H, W = 1088, 1920
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 FoVx=1.2, FoVy=0.8, image=np.zeros((H, W, 3), np.float32),
                 image_name="b", uid=0)
    vm = jnp.asarray(cam.world_view_transform)
    pm = jnp.asarray(cam.full_proj_transform)
    tx, ty = math.tan(cam.FoVx * 0.5), math.tan(cam.FoVy * 0.5)
    bg = jnp.zeros(3)

    s = R.RasterSettings(H, W, max_per_tile=128, chunk=8192, macro=4,
                         macro_capacity=512)
    th, tw = R._tile_grid(s)
    m = s.macro
    mth, mtw = math.ceil(th / m), math.ceil(tw / m)

    proj = jax.jit(functools.partial(R.project_gaussians, settings=s))
    mean2d, depths, conics, radii, valid = proj(means, scales, quats, vm, pm, tx, ty)
    sel = jax.jit(functools.partial(R._macro_select, settings=s, mth=mth, mtw=mtw))
    macro_idx, _ = sel(mean2d, depths, radii, valid)
    macro_idx = jnp.asarray(np.asarray(macro_idx))

    n_blocks, kc = macro_idx.shape
    bs = m * R.TILE
    p = bs * bs

    def prep(macro_idx, mean2d, conics, colors, opacities):
        valid = macro_idx >= 0
        safe = jnp.maximum(macro_idx, 0)
        gm = mean2d[safe]
        gc = conics[safe]
        gcol = colors[safe]
        gop = jnp.where(valid, opacities[safe], 0.0)
        bx0 = ((jnp.arange(n_blocks) % mtw) * bs).astype(jnp.float32)
        by0 = ((jnp.arange(n_blocks) // mtw) * bs).astype(jnp.float32)
        mx = gm[..., 0] - bx0[:, None]
        my = gm[..., 1] - by0[:, None]
        ca, cb, cc = gc[..., 0], gc[..., 1], gc[..., 2]
        coeff = jnp.stack([
            -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my,
            ca * mx + cb * my,
            cc * my + cb * mx,
            -0.5 * ca,
            -0.5 * cc,
            -cb,
        ], axis=-1)
        return coeff, gcol, gop

    yy = jnp.arange(bs, dtype=jnp.float32)
    py_l, px_l = jnp.meshgrid(yy, yy, indexing="ij")
    px_l = px_l.reshape(-1)
    py_l = py_l.reshape(-1)
    basis = jnp.stack([jnp.ones_like(px_l), px_l, py_l,
                       px_l * px_l, py_l * py_l, px_l * py_l])

    def assemble(blocks):
        img = blocks.reshape(mth, mtw, bs, bs, 3).transpose(0, 2, 1, 3, 4)
        return img.reshape(mth * bs, mtw * bs, 3)[:H, :W]

    # --- variant machinery -------------------------------------------------
    def block_fn(args, prec, space, adtype):
        c, col, op = args
        power = jnp.dot(c, basis, precision=prec)
        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(0.99, op[:, None] * jnp.exp(power))
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        if adtype is not None:
            alpha = alpha.astype(adtype)
        if space == "log":
            log_t = jnp.cumsum(jnp.log1p(-alpha.astype(jnp.float32)), axis=0)
            t_exc = jnp.exp(jnp.concatenate([jnp.zeros_like(log_t[:1]), log_t[:-1]]))
            t_final = jnp.exp(log_t[-1])
        else:
            t_inc = jnp.cumprod((1.0 - alpha).astype(alpha.dtype), axis=0)
            t_exc = jnp.concatenate([jnp.ones_like(t_inc[:1]), t_inc[:-1]]).astype(jnp.float32)
            t_final = t_inc[-1].astype(jnp.float32)
        contrib = jnp.where(t_exc > 1e-4, alpha.astype(jnp.float32) * t_exc, 0.0)
        rgb = jnp.dot(contrib.T, col, precision=jax.lax.Precision.DEFAULT)
        return rgb + t_final[:, None] * bg[None, :]

    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH

    variants = {
        "baseline map log HIGHEST": (HI, "log", None, None),
        "map bs=8": (HI, "log", None, 8),
        "cumprod": (HI, "prod", None, None),
        "cumprod bs=8": (HI, "prod", None, 8),
        "cumprod HIGH bs=8": (H3, "prod", None, 8),
        "cumprod HIGH bf16 bs=8": (H3, "prod", jnp.bfloat16, 8),
        "cumprod HIGH bf16": (H3, "prod", jnp.bfloat16, None),
    }

    coeff, gcol, gop = jax.jit(prep)(macro_idx, mean2d, conics, colors, opac)
    ref_img = None
    for name, (prec, space, adtype, bsz) in variants.items():
        fn_b = functools.partial(block_fn, prec=prec, space=space, adtype=adtype)

        @jax.jit
        def run(coeff, gcol, gop, fn_b=fn_b, bsz=bsz):
            if bsz:
                blocks = jax.lax.map(fn_b, (coeff, gcol, gop), batch_size=bsz)
            else:
                blocks = jax.lax.map(fn_b, (coeff, gcol, gop))
            return assemble(blocks)

        try:
            t, img = bench(run, coeff, gcol, gop)
        except Exception as e:
            print(f"{name:28s}: FAILED {str(e)[:120]}")
            continue
        if ref_img is None:
            ref_img = np.asarray(img)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(img) - ref_img)))
        print(f"{name:28s}: {t:7.2f} ms  maxerr={err:.2e}")

    # --- early-exit while_loop over candidate chunks ------------------------
    for cchunk in (64, 128):
        def block_ee(args, cchunk=cchunk):
            c, col, op = args
            nck = kc // cchunk

            def cond(state):
                i, t_carry, _ = state
                return (i < nck) & (jnp.max(t_carry) > 1e-4)

            def body(state):
                i, t_carry, acc = state
                cs = jax.lax.dynamic_slice_in_dim(c, i * cchunk, cchunk, 0)
                cols = jax.lax.dynamic_slice_in_dim(col, i * cchunk, cchunk, 0)
                ops = jax.lax.dynamic_slice_in_dim(op, i * cchunk, cchunk, 0)
                power = jnp.minimum(jnp.dot(cs, basis, precision=H3), 0.0)
                alpha = jnp.minimum(0.99, ops[:, None] * jnp.exp(power))
                alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
                t_inc = jnp.cumprod(1.0 - alpha, axis=0)
                t_exc = jnp.concatenate([jnp.ones_like(t_inc[:1]), t_inc[:-1]])
                contrib = jnp.where(t_carry[None, :] * t_exc > 1e-4,
                                    alpha * t_exc, 0.0)
                rgb = jnp.dot(contrib.T, cols, precision=jax.lax.Precision.DEFAULT)
                return i + 1, t_carry * t_inc[-1], acc + t_carry[:, None] * rgb

            _, t_fin, acc = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.ones((p,), jnp.float32),
                 jnp.zeros((p, 3), jnp.float32)))
            return acc + t_fin[:, None] * bg[None, :]

        @jax.jit
        def run_ee(coeff, gcol, gop, block_ee=block_ee):
            blocks = jax.lax.map(block_ee, (coeff, gcol, gop))
            return assemble(blocks)

        try:
            t, img = bench(run_ee, coeff, gcol, gop)
            err = float(np.max(np.abs(np.asarray(img) - ref_img)))
            print(f"early-exit while cchunk={cchunk:3d}: {t:7.2f} ms  maxerr={err:.2e}")
        except Exception as e:
            print(f"early-exit cchunk={cchunk}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()

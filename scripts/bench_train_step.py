"""Decompose the 3DGS train-step time on the TPU: full step vs render
fwd+bwd vs colorfield fwd+bwd vs optimizers.

Usage: python scripts/bench_train_step.py [--res 512] [--n 131072]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=512)
    parser.add_argument("--n", type=int, default=131072)
    parser.add_argument("--log2", type=int, default=19)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--phase", default="photometric")
    parser.add_argument("--views_per_step", type=int, default=1)
    parser.add_argument("--opacity_cull", type=int, default=1,
                        help="A/B the opacity-aware selection tightening")
    parser.add_argument("--max_per_tile", type=int, default=128)
    parser.add_argument("--macro_capacity", type=int, default=1024)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (smoke tests; the env "
                             "var route hangs when the axon relay is down)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aip_tpu.gs import gaussians as G
    from aip_tpu.gs.train import (GSTrainConfig, init_trainer, make_train_step,
                                  CameraArrays, make_settings_from_dims,
                                  render_from_arrays)
    from aip_tpu.gs.cameras import Camera
    import math

    def sync(x):
        np.asarray(jax.lax.slice(jnp.ravel(x), (0,), (1,)))

    rng = np.random.default_rng(0)
    n, res = args.n, args.res
    cfg = GSTrainConfig(capacity=n, log2_hashmap=args.log2, style_dim=256,
                        opacity_cull=bool(args.opacity_cull),
                        max_per_tile=args.max_per_tile,
                        macro_capacity=args.macro_capacity)
    pts = (rng.random((n, 3)) * 2 - 1).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    trainer = init_trainer(cfg, jnp.asarray(pts), jnp.asarray(cols), 3.0)

    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 FoVx=1.2, FoVy=0.9,
                 image=rng.random((res, res, 3)).astype(np.float32),
                 image_name="b", uid=0)
    arrays = CameraArrays(
        world_view=jnp.asarray(cam.world_view_transform, jnp.float32),
        full_proj=jnp.asarray(cam.full_proj_transform, jnp.float32),
        campos=jnp.asarray(cam.camera_center, jnp.float32),
        image=jnp.asarray(cam.image, jnp.float32),
        height=res, width=res,
        tanfovx=math.tan(0.6), tanfovy=math.tan(0.45),
    )
    bg = jnp.zeros(3)
    style_f = jnp.asarray(rng.random((1, 512)).astype(np.float32))

    def bench(label, f, *a):
        t0 = time.time()
        out = f(*a)
        leaf = jax.tree.leaves(out)[0]
        sync(leaf)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        dt = (time.time() - t0) / args.iters * 1000
        print(f"{label:28s}: {dt:8.1f} ms   (compile {compile_s:.0f}s)")
        return out

    # 1. full train step
    B = args.views_per_step
    step = make_train_step(cfg, 3.0, args.phase, res, res, views_per_step=B)
    if B > 1:
        from aip_tpu.gs.train import stack_cameras

        step_arrays = stack_cameras([arrays] * B)
        t0 = time.time()
        trainer2, _ = step(trainer, step_arrays, style_f, bg)
        sync(jax.tree.leaves(trainer2)[0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            trainer2, _ = step(trainer, step_arrays, style_f, bg)
        sync(jax.tree.leaves(trainer2)[0])
        dt = (time.time() - t0) / args.iters * 1000
        print(f"full step B={B:<2d}              : {dt:8.1f} ms "
              f"= {dt / B:6.1f} ms / reference iteration "
              f"(compile {compile_s:.0f}s)")
        return
    trainer, _ = bench("full step", step, trainer, arrays, style_f, bg)

    # 2. render fwd+bwd only (loss grad wrt gaussian params, no optimizers)
    settings = make_settings_from_dims(res, res, cfg)

    def render_loss(gparams, field, offs):
        gstate = trainer.gstate._replace(
            xyz=gparams["xyz"], scaling=gparams["scaling"],
            rotation=gparams["rotation"], opacity=gparams["opacity"],
            mask=gparams["mask"])
        out = render_from_arrays(arrays, gstate, field, bg, style_f, "train",
                                 None, None, settings, offs)
        return jnp.mean(jnp.abs(out.render - arrays.image))

    gparams = {k: getattr(trainer.gstate, k)
               for k in ("xyz", "scaling", "rotation", "opacity", "mask")}
    offs = jnp.zeros((cfg.capacity, 2))
    gr = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)))
    bench("render+field fwd+bwd", gr, gparams, trainer.field, offs)

    # 3. colorfield fwd+bwd only
    from aip_tpu.gs import colorfield as CF
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2), (n, 32))

    def cf_loss(field):
        from aip_tpu.gs.colorfield import predict_sh
        sh = predict_sh(field, x, style_f)
        return jnp.sum(sh * g_out[:, :, None][:, :16, :])

    bench("colorfield fwd+bwd", jax.jit(jax.grad(cf_loss)), trainer.field)

    # 4. optimizer updates only
    from aip_tpu.gs.train import make_gaussian_optimizer, make_net_optimizer
    import optax
    opt_g = make_gaussian_optimizer(cfg, 3.0)
    opt_n = make_net_optimizer(cfg)
    fake_g = jax.tree.map(jnp.ones_like, gparams)
    fake_f = jax.tree.map(jnp.ones_like, trainer.field)

    @jax.jit
    def opt_step(og, on, gp, fp):
        u1, og = opt_g.update(jax.tree.map(jnp.ones_like, gp), og, gp)
        gp = optax.apply_updates(gp, u1)
        u2, on = opt_n.update(jax.tree.map(jnp.ones_like, fp), on, fp)
        fp = optax.apply_updates(fp, u2)
        return og, on, gp, fp

    bench("optimizers only", opt_step, trainer.opt_g, trainer.opt_net,
          gparams, trainer.field)


if __name__ == "__main__":
    main()

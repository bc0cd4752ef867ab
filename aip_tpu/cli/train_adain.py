"""AdaIN decoder trainer CLI (reference `AdaIN/train.py:58-136` arg parity).

Trains the decoder against the frozen normalised-VGG encoder with the
reference's loss and schedule, data-parallel over all available devices via
the aip_tpu.parallel train step.
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--content_dir", type=str, required=True,
                        help="Directory path to a batch of content images")
    parser.add_argument("--style_dir", type=str, required=True,
                        help="Directory path to a batch of style images")
    parser.add_argument("--vgg", type=str, default=None,
                        help="Optional torch vgg_normalised.pth to convert")
    parser.add_argument("--save_dir", default="./experiments")
    parser.add_argument("--log_dir", default="./logs")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_decay", type=float, default=5e-5)
    parser.add_argument("--max_iter", type=int, default=160000)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--style_weight", type=float, default=10.0)
    parser.add_argument("--content_weight", type=float, default=1.0)
    parser.add_argument("--n_threads", type=int, default=16)
    parser.add_argument("--save_model_interval", type=int, default=10000)
    parser.add_argument("--crop", type=int, default=256)
    args = parser.parse_args(argv)

    import json
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from aip_tpu.data.images import FlatFolderDataset, infinite_batches
    from aip_tpu.models import weights as weights_mod
    from aip_tpu.models.decoder import init_decoder_params
    from aip_tpu.parallel import train as ptrain
    from aip_tpu.parallel.mesh import make_mesh
    from aip_tpu.parallel.sharding import batch_sharding

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    log_path = Path(args.log_dir) / "train_log.jsonl"
    log_path.parent.mkdir(parents=True, exist_ok=True)

    vgg_params = weights_mod.get_vgg_params(args.vgg)
    dec_params = init_decoder_params(jax.random.PRNGKey(0))

    mesh = make_mesh(jax.devices(), ("dp", "tp"))
    optimizer = ptrain.make_optimizer(args.lr, args.lr_decay)
    vgg_params, state = ptrain.shard_train_setup(mesh, vgg_params, dec_params, optimizer)
    step = ptrain.compile_train_step(
        mesh, optimizer, vgg_params,
        style_weight=args.style_weight, content_weight=args.content_weight,
    )

    content_ds = FlatFolderDataset(args.content_dir)
    style_ds = FlatFolderDataset(args.style_dir)
    content_iter = infinite_batches(content_ds, args.batch_size, seed=0, crop=args.crop)
    style_iter = infinite_batches(style_ds, args.batch_size, seed=1, crop=args.crop)
    sharding = batch_sharding(mesh)

    with open(log_path, "a") as log:
        for i in range(args.max_iter):
            content = jax.device_put(jnp.asarray(next(content_iter)), sharding)
            style = jax.device_put(jnp.asarray(next(style_iter)), sharding)
            state, metrics = step(state, content, style)
            if (i + 1) % 100 == 0:
                rec = {"iter": i + 1,
                       "loss_content": float(metrics["loss_content"]) * args.content_weight,
                       "loss_style": float(metrics["loss_style"]) * args.style_weight}
                log.write(json.dumps(rec) + "\n")
                log.flush()
            if (i + 1) % args.save_model_interval == 0 or (i + 1) == args.max_iter:
                weights_mod.save_params_npz(
                    jax.device_get(state.params),
                    save_dir / f"decoder_iter_{i + 1}.npz",
                )
    return str(save_dir)


if __name__ == "__main__":
    main()

"""Fast-stylizer distillation CLI.

Trains the magenta-equivalent feed-forward stylizer (`models/magenta.py`)
by distilling the AdaIN teacher (see `models/magenta_train.py`) — the
TPU-native replacement for the reference's pretrained TF-Hub module
(`video/utils.py:14`), whose checkpoint is neither downloadable nor
loadable here. Data plumbing mirrors the AdaIN trainer
(reference `AdaIN/train.py:58-136`).
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--content_dir", type=str, required=True,
                        help="Directory path to a batch of content images")
    parser.add_argument("--style_dir", type=str, required=True,
                        help="Directory path to a batch of style images")
    parser.add_argument("--save_path", default="./experiments/magenta.npz")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lr_decay", type=float, default=5e-5)
    parser.add_argument("--max_iter", type=int, default=40000)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--lambda_feat", type=float, default=0.1)
    parser.add_argument("--predictor_trunk", default="compact",
                        choices=("compact", "mobilenet_v2"))
    parser.add_argument("--save_model_interval", type=int, default=10000)
    parser.add_argument("--mesh_dp", type=int, default=0,
                        help="Data-parallel over the first N devices.")
    args = parser.parse_args(argv)

    from pathlib import Path

    from aip_tpu.models.magenta_train import train_magenta_distill
    from aip_tpu.parallel.mesh import make_dp_mesh

    mesh = make_dp_mesh(args.mesh_dp)
    Path(args.save_path).parent.mkdir(parents=True, exist_ok=True)
    _, loss = train_magenta_distill(
        args.content_dir, args.style_dir, steps=args.max_iter,
        batch_size=args.batch_size, crop=args.crop, lr=args.lr,
        lr_decay=args.lr_decay, lambda_feat=args.lambda_feat,
        predictor_trunk=args.predictor_trunk, save_path=args.save_path,
        save_every=args.save_model_interval, mesh=mesh,
    )
    print(f"final loss {loss:.5f}; saved to {args.save_path}")
    return args.save_path


if __name__ == "__main__":
    main()

"""Stylized 3DGS train+render CLI (reference `run_3dgs.py:18-44` parity)."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train and render a stylized 3DGS scene.")
    parser.add_argument("--content", type=str, required=True,
                        help="Scene directory (COLMAP sparse/ or transforms_train.json).")
    parser.add_argument("--style", type=str, required=True, help="Path to the style image.")
    parser.add_argument("--output", type=str, default="output", help="Output directory.")
    parser.add_argument("--use_depth", action="store_true",
                        help="Enable depth-aware stylization of the guide images.")
    parser.add_argument("--iterations", type=int, default=15000)
    parser.add_argument("--freeze_iters", type=int, default=7000)
    parser.add_argument("--views_per_step", type=int, default=1,
                        help="Views per optimizer step (B reference "
                             "iterations per step; TPU-first batching).")
    parser.add_argument("--mesh_dp", type=int, default=0,
                        help="Run multi-chip over the first N devices "
                             "(view batches dp-sharded).")
    parser.add_argument("--gaussian_shard", action="store_true",
                        help="Also shard the colorfield over the Gaussian "
                             "axis (needs --mesh_dp).")
    parser.add_argument("-r", "--resolution", type=int, default=-1,
                        help="Camera downscale (reference -r rule: -1 "
                             "native with >1.6K auto-rescale; 2/4/8 "
                             "divide).")
    parser.add_argument("--fit_train_selection", action="store_true",
                        help="Fit the pair-sort selection shape (dup_span/"
                             "giant_capacity/macro_capacity) to the initial "
                             "scene so TRAINING renders never truncate "
                             "giants (exact, ~+30%%/frame on giant-heavy "
                             "scenes; see BENCHMARKS.md).")
    args = parser.parse_args(argv)

    from aip_tpu.gs.pipeline import run_3dgs_training, run_3dgs_rendering

    model_path = run_3dgs_training(
        args.content, args.style, model_path=args.output,
        iterations=args.iterations, freeze_iters=args.freeze_iters,
        use_depth=args.use_depth, depth_offset=0.5, depth_prominence=20,
        views_per_step=args.views_per_step, mesh_dp=args.mesh_dp,
        gaussian_shard=args.gaussian_shard,
        fit_train_selection=args.fit_train_selection,
        resolution=args.resolution,
    )
    gif = run_3dgs_rendering(args.style, model_path, mesh_dp=args.mesh_dp)
    print(f"Render GIF: {gif}")
    return gif


if __name__ == "__main__":
    main()

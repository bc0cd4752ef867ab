"""Batch evaluation harness over standard benchmark scene sets.

Parity with reference `Style_3DGS/full_eval.py`: drives train -> render ->
metrics over the Mip-NeRF360 / Tanks&Temples / DeepBlending scene lists —
as direct function calls rather than ``os.system`` shell-outs.
"""

from __future__ import annotations

import argparse
from pathlib import Path

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]


def run_full_eval(
    style_image,
    output_path="./eval",
    mipnerf360=None,
    tanksandtemples=None,
    deepblending=None,
    skip_training=False,
    skip_rendering=False,
    skip_metrics=False,
    iterations: int = 15_000,
    freeze_iters: int = 7_000,
    views_per_step: int = 1,
    mesh_dp: int = 0,
    gaussian_shard: bool = False,
):
    from aip_tpu.gs.pipeline import run_3dgs_training, run_3dgs_rendering
    from aip_tpu.gs.metrics_cli import evaluate

    scene_sources = []
    if mipnerf360:
        for s in MIPNERF360_OUTDOOR + MIPNERF360_INDOOR:
            scene_sources.append((s, str(Path(mipnerf360) / s)))
    if tanksandtemples:
        for s in TANKS_AND_TEMPLES:
            scene_sources.append((s, str(Path(tanksandtemples) / s)))
    if deepblending:
        for s in DEEP_BLENDING:
            scene_sources.append((s, str(Path(deepblending) / s)))

    model_paths = []
    for scene, source in scene_sources:
        model_path = str(Path(output_path) / scene)
        model_paths.append(model_path)
        if not skip_training:
            run_3dgs_training(source, style_image, model_path=model_path,
                              iterations=iterations, freeze_iters=freeze_iters,
                              views_per_step=views_per_step, mesh_dp=mesh_dp,
                              gaussian_shard=gaussian_shard)
        if not skip_rendering:
            run_3dgs_rendering(style_image, model_path, mesh_dp=mesh_dp)
    if not skip_metrics:
        return evaluate(model_paths)
    return {}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--style", required=True)
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
    parser.add_argument("--tanksandtemples", "-tat", type=str, default=None)
    parser.add_argument("--deepblending", "-db", type=str, default=None)
    parser.add_argument("--views_per_step", type=int, default=1)
    parser.add_argument("--mesh_dp", type=int, default=0)
    parser.add_argument("--gaussian_shard", action="store_true")
    args = parser.parse_args(argv)
    out = run_full_eval(
        args.style, args.output_path, args.mipnerf360, args.tanksandtemples,
        args.deepblending, args.skip_training, args.skip_rendering,
        args.skip_metrics, views_per_step=args.views_per_step,
        mesh_dp=args.mesh_dp, gaussian_shard=args.gaussian_shard,
    )
    print(out)


if __name__ == "__main__":
    main()

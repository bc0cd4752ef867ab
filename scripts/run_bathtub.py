"""End-to-end real-scene run: train bathtub_0121 with the reference's
documented command-line (README.md:144-160 —
`--content input/3dgs/bathtub_0121/images --style brushstrokes.jpg`,
15000 iters / 7000 freeze), then render every train view, evaluate
PSNR/SSIM/LPIPS (metrics_cli layout), write the GIF and the storage
report, and print per-phase wall-clock.

Usage: python -u scripts/run_bathtub.py [--iterations 15000] [--out DIR]
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="/root/reference/input/3dgs/bathtub_0121/images")
    p.add_argument("--style", default="/root/reference/input/style/brushstrokes.jpg")
    p.add_argument("--out", default="output/bathtub_main")
    p.add_argument("--iterations", type=int, default=15000)
    p.add_argument("--freeze_iters", type=int, default=7000)
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--max_per_tile", type=int, default=128)
    p.add_argument("--macro_capacity", type=int, default=1024)
    p.add_argument("--views_per_step", type=int, default=1)
    p.add_argument("--fit_train_selection", action="store_true",
                   help="train with the selection shape fitted to the "
                        "scene (no giant truncation; BENCHMARKS.md)")
    p.add_argument("-r", "--resolution", type=int, default=-1,
                   help="camera downscale (reference -r rule)")
    args = p.parse_args()

    from aip_tpu.gs.pipeline import run_3dgs_training, run_3dgs_rendering
    from aip_tpu.gs import metrics_cli

    out = Path(args.out)
    t0 = time.time()
    model = run_3dgs_training(
        args.scene, args.style, model_path=str(out),
        iterations=args.iterations, freeze_iters=args.freeze_iters,
        progress_every=250,
        checkpoint_iterations=(args.freeze_iters, args.iterations - 1000),
        test_iterations=(1000, args.freeze_iters - 1,
                         args.freeze_iters + 1000, args.iterations),
        start_checkpoint=args.start_checkpoint,
        max_per_tile=args.max_per_tile,
        macro_capacity=args.macro_capacity,
        views_per_step=args.views_per_step,
        fit_train_selection=args.fit_train_selection,
        resolution=args.resolution,
    )
    t_train = time.time() - t0
    print(f"TRAIN done in {t_train/60:.1f} min -> {model}", flush=True)

    t1 = time.time()
    it = args.iterations
    gif = run_3dgs_rendering(args.style, model,
                             output_dir=str(out / "test" / f"ours_{it}" / "renders"))
    t_render = time.time() - t1
    print(f"RENDER done in {t_render/60:.1f} min -> {gif}", flush=True)

    # gt views for the metrics layout (metrics.py:36-93 parity).
    gt_dir = out / "test" / f"ours_{it}" / "gt"
    gt_dir.mkdir(parents=True, exist_ok=True)
    from aip_tpu.gs.dataset import Scene

    scene = Scene(args.scene, shuffle=False, resolution=args.resolution)
    from PIL import Image
    import numpy as np

    for i, cam in enumerate(scene.getTrainCameras()):
        Image.fromarray((np.asarray(cam.image) * 255).astype(np.uint8)).save(
            gt_dir / f"{i:05d}.png")
    # Stylized guides as a second method dir: renders vs their actual
    # training targets (the more meaningful quality number for a
    # stylized scene).
    guide_dir = out / "stylized"
    m2 = out / "test" / f"guides_{it}"
    (m2 / "renders").mkdir(parents=True, exist_ok=True)
    (m2 / "gt").mkdir(parents=True, exist_ok=True)
    guides = sorted(guide_dir.glob("*.jpg"))
    for i, g in enumerate(guides):
        im = Image.open(g).convert("RGB").resize(
            (scene.getTrainCameras()[0].image_width,
             scene.getTrainCameras()[0].image_height))
        im.save(m2 / "gt" / f"{i:05d}.png")
        src = out / "test" / f"ours_{it}" / "renders" / f"{i:05d}.png"
        if src.exists():
            shutil.copy(src, m2 / "renders" / f"{i:05d}.png")

    t2 = time.time()
    results = metrics_cli.evaluate([str(out)])
    t_metrics = time.time() - t2
    print(f"METRICS done in {t_metrics/60:.1f} min", flush=True)
    print(json.dumps(results, indent=2), flush=True)
    print((out / "storage").read_text(), flush=True)
    print(f"TOTAL {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()

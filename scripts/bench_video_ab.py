"""A/B the video pipeline's stylizers on the reference demo video:
AdaIN teacher (`apply_style_transfer_ada`) vs the distilled magenta
student (`apply_style_transfer` with the fast-stylizer hook).

Reference surface: `video/utils.py:108-154` — magenta is the
reference's DEFAULT video stylizer; the distilled student is its
TPU-native stand-in (docs/examples/magenta/).

Reports wall-clock for each path (frame extraction excluded; flows and
temporal blending included — the pipelines share them) and the
student's SSIM/PSNR against the teacher's output frames.

Usage: python scripts/bench_video_ab.py [--video .../sample.mp4]
       [--style .../brushstrokes.jpg] [--npz docs/examples/magenta/...]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="/root/reference/input/videos/sample.mp4")
    p.add_argument("--style",
                   default="/root/reference/input/style/brushstrokes.jpg")
    p.add_argument("--npz",
                   default="docs/examples/magenta/magenta_distilled.npz")
    p.add_argument("--out", default="output/video_ab")
    p.add_argument("--flow", default="tvl1")
    args = p.parse_args()

    from aip_tpu.models.magenta import load_magenta_npz, use_magenta_stylizer
    from aip_tpu.pipelines.video import (apply_style_transfer,
                                         apply_style_transfer_ada,
                                         clear_frames, video_to_frames)

    out = Path(args.out)
    frames = out / "frames"
    t_dir = out / "teacher"
    s_dir = out / "student"
    for d in (frames, t_dir, s_dir):
        d.mkdir(parents=True, exist_ok=True)
        clear_frames(d)
    video_to_frames(args.video, frames)
    n = len(list(frames.glob("*")))
    print(f"{n} frames @256^2", flush=True)

    t0 = time.time()
    apply_style_transfer_ada(frames, args.style, t_dir,
                             target_resolution=(256, 256),
                             flow_method=args.flow)
    t_teacher = time.time() - t0
    print(f"teacher (AdaIN): {t_teacher:.1f}s", flush=True)

    use_magenta_stylizer(load_magenta_npz(args.npz))
    t0 = time.time()
    apply_style_transfer(frames, args.style, s_dir,
                         target_resolution=(256, 256),
                         flow_method=args.flow)
    t_student = time.time() - t0
    print(f"student (distilled magenta): {t_student:.1f}s", flush=True)

    # Quality vs teacher output
    import jax.numpy as jnp
    from PIL import Image

    from aip_tpu.ops.metrics import psnr, ssim

    names = sorted(f.name for f in t_dir.glob("*.jpg")) or sorted(
        f.name for f in t_dir.glob("*.png"))
    ssims, psnrs = [], []
    for name in names:
        a = jnp.asarray(np.asarray(Image.open(t_dir / name), np.float32) / 255)
        b = jnp.asarray(np.asarray(Image.open(s_dir / name), np.float32) / 255)
        ssims.append(float(ssim(a[None], b[None])))
        psnrs.append(float(jnp.mean(psnr(a[None], b[None]))))
    res = {
        "frames": n,
        "teacher_s": round(t_teacher, 1),
        "student_s": round(t_student, 1),
        "speedup": round(t_teacher / max(t_student, 1e-9), 2),
        "ssim_vs_teacher": round(float(np.mean(ssims)), 4),
        "psnr_vs_teacher": round(float(np.mean(psnrs)), 2),
    }
    (out / "ab_results.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()

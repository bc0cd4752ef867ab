"""End-to-end real-video run: the reference's demo driver
(`video/utils.py:407-425` / `test_video_st.py`) on its actual
`input/videos/sample.mp4` (243 frames, 1080p -> 256px) with the
multi-style schedule from `input/videos/styles/` — measured wall-clock
vs the reference's "up to 15 minutes" estimate (`gui/third_page.py:116`).

Usage: python -u scripts/run_sample_video.py [--out DIR] [--flow tvl1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="/root/reference/input/videos/sample.mp4")
    p.add_argument("--styles", default="/root/reference/input/videos/styles/")
    p.add_argument("--out", default="output/video_sample")
    p.add_argument("--flow", default="tvl1",
                   choices=["tvl1", "farneback", "lk"])
    args = p.parse_args()

    from aip_tpu.pipelines.video import (video_to_frames,
                                         apply_style_transfer_multi_ada,
                                         frames_to_video)

    out = Path(args.out)
    t0 = time.time()
    frames = video_to_frames(args.video, out / "content_frames")
    t_decode = time.time() - t0
    print(f"DECODE {len(frames)} frames in {t_decode:.1f}s", flush=True)

    t1 = time.time()
    styled = apply_style_transfer_multi_ada(
        out / "content_frames", args.styles, out / "styled_frames",
        target_resolution=(256, 256), flow_method=args.flow,
    )
    t_style = time.time() - t1
    print(f"STYLIZE+FLOW+BLEND {len(styled)} frames in {t_style:.1f}s "
          f"({len(styled)/t_style:.1f} frames/s)", flush=True)

    t2 = time.time()
    frames_to_video(out / "styled_frames", out / "stylized_video.mp4", fps=20)
    t_mux = time.time() - t2
    total = time.time() - t0
    print(f"MUX in {t_mux:.1f}s; TOTAL {total:.1f}s "
          f"(reference estimate: 'up to 15 minutes')", flush=True)

    # Contact-sheet artifact: 2x4 grid of evenly spaced styled frames.
    import numpy as np
    from PIL import Image

    picks = [styled[i] for i in
             np.linspace(0, len(styled) - 1, 8).astype(int)]
    tiles = [np.asarray(Image.open(p)) for p in picks]
    h, w, _ = tiles[0].shape
    sheet = np.zeros((2 * h, 4 * w, 3), np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, 4)
        sheet[r * h:(r + 1) * h, c * w:(c + 1) * w] = t
    Image.fromarray(sheet).save(out / "contact_sheet.png")
    print(f"sheet -> {out/'contact_sheet.png'}", flush=True)


if __name__ == "__main__":
    main()

"""Video style transfer CLI (reference `test_video_st.py` +
`video/utils.py:407-425` run_style_transfer parity)."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Video style transfer with temporal consistency.")
    parser.add_argument("--video", type=str, default="input/videos/sample.mp4")
    parser.add_argument("--styles", type=str, default="input/videos/styles/",
                        help="Directory of style images (switched across the video).")
    parser.add_argument("--output", type=str, default="video/outputs/stylized_video_manual.mp4")
    parser.add_argument("--frames_dir", type=str, default="input/videos/content_frames/")
    parser.add_argument("--styled_dir", type=str, default="input/videos/styled_frames/")
    parser.add_argument("--offset", type=float, default=0.30)
    parser.add_argument("--prominence", type=float, default=20.0)
    parser.add_argument("--fps", type=int, default=20)
    args = parser.parse_args(argv)

    from aip_tpu.pipelines.video import run_style_transfer

    out = run_style_transfer(
        selected_video=args.video, styles_dir=args.styles,
        content_dir=args.frames_dir, styled_dir=args.styled_dir,
        output_video=args.output, offset=args.offset,
        prominence=args.prominence, fps=args.fps,
    )
    print(f"Stylized video saved to {out}")
    return out


if __name__ == "__main__":
    main()

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
    parser.add_argument(
        "--fast_stylizer", nargs="?", const="docs/examples/magenta/"
        "magenta_distilled.npz", default=None, metavar="NPZ",
        help="Use the distilled feed-forward stylizer (the reference's "
             "magenta fast path, video/utils.py:108-154) with a single "
             "--style image instead of the AdaIN multi-style path. "
             "Optional value: path to a magenta npz checkpoint.")
    parser.add_argument("--style", type=str, default=None,
                        help="Single style image (fast-stylizer path).")
    parser.add_argument("--flow", type=str, default="tvl1",
                        choices=("tvl1", "farneback", "lk"))
    args = parser.parse_args(argv)

    if args.fast_stylizer:
        from aip_tpu.models.magenta import (load_magenta_npz,
                                            use_magenta_stylizer)
        from aip_tpu.pipelines.video import (apply_style_transfer,
                                             clear_frames, frames_to_video,
                                             video_to_frames)

        if args.style is None:
            parser.error("--fast_stylizer needs --style <image>")
        use_magenta_stylizer(load_magenta_npz(args.fast_stylizer))
        clear_frames(args.frames_dir)
        clear_frames(args.styled_dir)
        video_to_frames(args.video, args.frames_dir)
        apply_style_transfer(args.frames_dir, args.style, args.styled_dir,
                             target_resolution=(256, 256),
                             flow_method=args.flow)
        out = frames_to_video(args.styled_dir, args.output, fps=args.fps)
        print(f"Stylized video saved to {out}")
        return out

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

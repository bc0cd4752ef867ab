"""Standalone AdaIN video CLI (reference `AdaIN/test_video.py` parity):
stylize a content video with a style image, a style *video* (per-frame
style), or several styles blended with interpolation weights."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--content_video", type=str, required=True,
                        help="File path to the content video")
    parser.add_argument("--style_path", type=str, nargs="+", required=True,
                        help="Style image(s), or a style video")
    parser.add_argument("--style_interpolation_weights", type=float, nargs="*",
                        default=None)
    parser.add_argument("--content_size", type=int, default=512)
    parser.add_argument("--style_size", type=int, default=512)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--output", type=str, default="output/adain_video.mp4")
    parser.add_argument("--fps", type=int, default=20)
    args = parser.parse_args(argv)

    import tempfile
    from pathlib import Path

    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.ops.image import resize_smaller_edge
    from aip_tpu.pipelines.adain_infer import (
        _to_array, stylize_simple, stylize_interpolated,
    )
    from aip_tpu.pipelines.video import video_to_frames, frames_to_video

    vgg_params = weights_mod.get_vgg_params()
    dec_params = weights_mod.get_decoder_params()

    tmp = Path(tempfile.mkdtemp(prefix="aip_adain_video_"))
    frame_paths = video_to_frames(args.content_video, tmp / "frames")

    style_is_video = (len(args.style_path) == 1
                      and args.style_path[0].lower().endswith((".mp4", ".avi", ".mov")))
    style_frames = None
    styles = None
    if style_is_video:
        style_frame_paths = video_to_frames(args.style_path[0], tmp / "style_frames")
        style_frames = [
            resize_smaller_edge(jnp.asarray(_to_array(p)), args.style_size)[None]
            for p in style_frame_paths
        ]
    else:
        styles = jnp.stack([
            resize_smaller_edge(jnp.asarray(_to_array(p)), args.style_size)
            for p in args.style_path
        ])
        weights = jnp.asarray(
            args.style_interpolation_weights
            or [1.0] * styles.shape[0], jnp.float32)

    (tmp / "styled").mkdir(exist_ok=True)
    for i, fp in enumerate(frame_paths):
        content = resize_smaller_edge(jnp.asarray(_to_array(fp)), args.content_size)[None]
        if style_is_video:
            style = style_frames[min(i, len(style_frames) - 1)]
            out = stylize_simple(vgg_params, dec_params, content, style,
                                 alpha=args.alpha)
        elif styles.shape[0] > 1:
            out = stylize_interpolated(vgg_params, dec_params, content, styles,
                                       weights, alpha=args.alpha)
        else:
            out = stylize_simple(vgg_params, dec_params, content, styles[:1],
                                 alpha=args.alpha)
        img = (np.clip(np.asarray(out[0]), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp / "styled" / fp.name)

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    frames_to_video(tmp / "styled", args.output, fps=args.fps)
    print(f"Stylized video saved to {args.output}")
    return args.output


if __name__ == "__main__":
    main()

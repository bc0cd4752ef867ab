"""Pixel-art depixelization CLI (reference `pixel_art/utils.py:331-361`)."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Depixelize (vectorize) a pixel-art sprite.")
    parser.add_argument("--input", type=str, default="input/pixel_art/smw_dolphin_input.png")
    parser.add_argument("--output", type=str, default="pixel_art/outputs/vectorized_output")
    parser.add_argument("--scale", type=int, default=10)
    args = parser.parse_args(argv)

    from aip_tpu.pipelines.pixel_art import vectorization

    out = vectorization(args.input, args.output, args.scale)
    print(f"Vectorized output: {out}")
    return out


if __name__ == "__main__":
    main()

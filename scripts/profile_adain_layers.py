"""Per-layer roofline of the AdaIN serving graph (VERDICT r4 item #7).

Times prefix graphs of the fused encoder (and decoder) at the serving shape
(batch 32, 512px, bf16), attributing the deltas to individual conv stages,
and classifies each stage against the v5e roofs:

  * MXU roof: 197 TFLOP/s bf16 -> t_mxu = flops / 197e12
  * HBM roof: ~819 GB/s      -> t_hbm = bytes / 819e9
    (bytes = input + output activations + weights, bf16)

A stage is MXU-bound when t_mxu > t_hbm and its measured time sits near
t_mxu (and vice versa). Prints a markdown table for BENCHMARKS.md.

Usage: python scripts/profile_adain_layers.py [--batch 32] [--size 512]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_PEAK = 197e12   # v5e bf16
HBM_BW = 819e9      # v5e HBM GB/s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="profile the fused zero-pad+strip-correction op "
                        "(ops.image.reflect_conv3x3) instead of the "
                        "explicit reflection-pad + VALID conv path the "
                        "models ship (measured faster on v5e: 105 vs "
                        "115 ms at batch 32/512^2)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.models.decoder import DECODER_LAYERS
    from aip_tpu.models.vgg import VGG_LAYERS
    from aip_tpu.ops.image import (max_pool_2x2_ceil, reflect_conv3x3,
                                   reflection_pad_2d, upsample_nearest_2x)

    vggp = weights_mod.get_vgg_params()
    decp = weights_mod.get_decoder_params()
    n, s = args.batch, args.size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n, s, s, 3)).astype(np.float32))

    def sync(y):
        np.asarray(jax.lax.slice(jnp.ravel(y), (0,), (1,)))

    def conv(x, pr, dtype=jnp.bfloat16):
        w = pr["w"].astype(dtype)
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype) + pr["b"].astype(dtype)

    # Build the stage list: (label, fn, flops, bytes) where fn maps the
    # running activation to the next one. A "stage" = pad+conv+relu or pool.
    stages = []

    def add_conv(label, params_list, ci, k, shape_in):
        hh, ww, cin = shape_in
        cout = params_list[ci]["w"].shape[-1]
        flops = 2 * n * hh * ww * k * k * cin * cout
        byts = 2 * n * hh * ww * cin + 2 * n * hh * ww * cout + 2 * k * k * cin * cout

        def fn(x, ci=ci, k=k, pl=params_list):
            if k > 1:
                if args.fused:  # ops.image.reflect_conv3x3 variant
                    pr = pl[ci]
                    dt = jnp.bfloat16
                    return jax.nn.relu(reflect_conv3x3(
                        x.astype(dt), pr["w"].astype(dt),
                        pr["b"].astype(dt)))
                x = reflection_pad_2d(x, 1)  # the models' shipped path
            return jax.nn.relu(conv(x, pl[ci]))

        stages.append((label, fn, flops, byts))
        return (hh, ww, cout)

    def add_pool(label, shape_in):
        hh, ww, c = shape_in
        byts = 2 * n * hh * ww * c + 2 * n * (hh // 2) * (ww // 2) * c
        stages.append((label, max_pool_2x2_ceil, 0, byts))
        return (hh // 2, ww // 2, c)

    def add_up(label, shape_in):
        hh, ww, c = shape_in
        byts = 2 * n * hh * ww * c * 5

        def fn(x):
            return upsample_nearest_2x(x)

        stages.append((label, fn, 0, byts))
        return (hh * 2, ww * 2, c)

    shape = (s, s, 3)
    ci = 0
    names = iter(["conv0_1x1", "conv1_1", "conv1_2", "conv2_1", "conv2_2",
                  "conv3_1", "conv3_2", "conv3_3", "conv3_4", "conv4_1"])
    for layer in VGG_LAYERS:
        if layer[0] == "conv":
            k = layer[3]
            shape = add_conv(f"enc.{next(names)}", vggp, ci, k, shape)
            ci += 1
        elif layer[0] == "pool":
            shape = add_pool("enc.pool", shape)
        if layer[0] == "relu" and layer[1] == "relu4_1":
            break

    # AdaIN renorm stage (stats + scale/shift) — bandwidth only.
    hh, ww, c = shape
    byts = 2 * n * hh * ww * c * 3

    def adain_stage(x):
        m = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        v = jnp.mean((x.astype(jnp.float32) - m) ** 2, axis=(1, 2),
                     keepdims=True)
        return ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

    stages.append(("adain.renorm", adain_stage, 0, byts))

    dnames = iter(["conv4", "conv3_4", "conv3_3", "conv3_2", "conv3_1",
                   "conv2_2", "conv2_1", "conv1_2", "conv1_1"])
    ci = 0
    for layer in DECODER_LAYERS:
        if layer[0] == "conv":
            shape = add_conv(f"dec.{next(dnames)}", decp, ci, 3, shape)
            ci += 1
        elif layer[0] == "up":
            shape = add_up("dec.up2x", shape)

    # Time prefix programs; per-stage time = delta of consecutive prefixes.
    def prefix_fn(k):
        @jax.jit
        def f(x):
            for _label, fn, _fl, _by in stages[:k]:
                x = fn(x)
            return x

        return f

    times = []
    for k in range(0, len(stages) + 1):
        f = prefix_fn(k)
        y = f(x0)
        sync(y)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            y = f(x0)
        sync(y)
        times.append((time.perf_counter() - t0) / args.reps * 1000)
        print(f"prefix {k:2d}: {times[-1]:8.2f} ms", flush=True)

    print("\n| stage | ms | t_mxu (ms) | t_hbm (ms) | MFU | bound |")
    print("|---|---|---|---|---|---|")
    total = times[-1] - times[0]
    for i, (label, _fn, fl, by) in enumerate(stages):
        dt = times[i + 1] - times[i]
        t_mxu = fl / MXU_PEAK * 1000
        t_hbm = by / HBM_BW * 1000
        mfu = (fl / max(dt / 1000, 1e-9)) / MXU_PEAK
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        near = max(t_mxu, t_hbm)
        tag = bound + ("" if dt < 2.5 * max(near, 1e-6) else "?")
        print(f"| {label} | {dt:.2f} | {t_mxu:.2f} | {t_hbm:.2f} "
              f"| {mfu:.2f} | {tag} |")
    print(f"| total | {total:.2f} | | | | |")
    img_s = n / (times[-1] / 1000)
    print(f"\nfull graph: {times[-1]:.1f} ms / batch {n} = {img_s:.1f} img/s")


if __name__ == "__main__":
    main()

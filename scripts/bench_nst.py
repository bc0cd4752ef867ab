"""Optimization-NST throughput on the TPU: the three gram-based pipelines
(spatial-variation single-style, two-style mixing, multi-backbone style
mixer) each run as ONE jitted `lax.scan` over Adam steps — the whole
optimization is a single device program, vs the reference's per-step torch
loops (spatial_variation/StyleTransfer.py:86-124 800 steps,
mixing_texture_gyum/neural_style_transfer.py 2000 steps,
gui/seven_page.py:290-352 300 iters).

Prints one JSON line per regime: compile time, steady wall, steps/s.

Usage: python scripts/bench_nst.py [--size 512] [--regimes spatial mix mixer_resnet mixer_swin]
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
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--regimes", nargs="+",
                   default=["spatial", "mix", "mixer_resnet", "mixer_swin"])
    p.add_argument("--cpu", action="store_true",
                   help="force CPU with tiny step counts (smoke test)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aip_tpu.models import vgg19_std as backbone
    from aip_tpu.pipelines.nst import nst_optimize
    from aip_tpu.pipelines import style_mixer

    rng = np.random.default_rng(0)
    s = args.size
    content = jnp.asarray(rng.random((1, s, s, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, s, s, 3)).astype(np.float32))
    styles2 = jnp.asarray(rng.random((2, s, s, 3)).astype(np.float32))
    params = backbone.get_vgg19_params()

    def sync(x):
        np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))

    scale = 0.01 if args.cpu else 1.0  # smoke mode: 1% of the step counts

    # (name, steps, thunk) — steps mirror the reference regimes exactly.
    def regime(name):
        if name == "spatial":  # spatial_variation: 800 steps, sw 1e5
            n = max(1, int(800 * scale))
            return n, lambda: nst_optimize(params, content, style,
                                           jnp.ones((1,)), num_steps=n)
        if name == "mix":  # mixing_texture_gyum: 2000 steps, sw 1e6
            n = max(1, int(2000 * scale))
            return n, lambda: nst_optimize(params, content, styles2,
                                           jnp.asarray([0.5, 0.5]),
                                           num_steps=n, style_weight=1e6)
        if name == "mixer_resnet":  # seven_page: 300 iters, ResNet50
            n = max(1, int(300 * scale))
            return n, lambda: style_mixer.style_transfer(
                content, style, model="ResNet", iterations=n)
        if name == "mixer_swin":  # seven_page: 300 iters, Swin-T
            n = max(1, int(300 * scale))
            return n, lambda: style_mixer.style_transfer(
                content, style, model="Swin", iterations=n)
        raise ValueError(name)

    for name in args.regimes:
        n, thunk = regime(name)
        t0 = time.perf_counter()
        sync(thunk())
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(thunk())
        warm = time.perf_counter() - t0
        print(json.dumps({
            "metric": "nst_optimize", "regime": name, "size": s,
            "steps": n, "cold_s": round(cold, 2), "warm_s": round(warm, 2),
            "steps_per_s": round(n / warm, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

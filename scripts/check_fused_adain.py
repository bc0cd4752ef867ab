"""On-chip validation + A/B of the fused AdaIN head/tail kernels.

1. Correctness: fused vs XLA layer path on the real TPU (the interpret
   tests cover semantics; this covers the Mosaic lowering).
2. Timing: serving graph (stylize_with_stats) before/after fusion at
   batch 32 / 512^2 bf16, per-stage prefix timings for the head/tail.

Usage: python scripts/check_fused_adain.py [--th 16] [--batch 32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late; "
                        "sitecustomize imports jax under axon)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aip_tpu.models import decoder as dec_mod
    from aip_tpu.models import vgg as vgg_mod
    from aip_tpu.models.decoder import init_decoder_params
    from aip_tpu.models.vgg import init_vgg_params

    def sync(x):
        np.asarray(jax.lax.slice(jnp.ravel(x), (0,), (1,)))

    rng = np.random.default_rng(0)
    vp = init_vgg_params(jax.random.PRNGKey(0))
    dp = init_decoder_params(jax.random.PRNGKey(1))
    B, R = args.batch, args.res
    x = jnp.asarray(rng.random((B, R, R, 3)).astype(np.float32))

    # --- correctness: fused dispatch vs explicit layer walk, on-chip.
    cdt = jnp.bfloat16
    fused_enc = jax.jit(lambda x: vgg_mod.vgg_encode(vp, x, "relu4_1", cdt))
    ref_enc = jax.jit(lambda x: vgg_mod._encode_from_pool1(
        vp, vgg_mod._head_xla(cdt, x, vp[0], vp[1], vp[2]),
        ("relu4_1",), {"relu4_1"}, cdt)["relu4_1"])
    a = np.asarray(fused_enc(x[:2]), np.float32)
    b = np.asarray(ref_enc(x[:2]), np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    print(f"enc fused-vs-xla rel err: max {np.abs(a-b).max()/scale:.2e} "
          f"mean {np.abs(a-b).mean()/scale:.2e}", flush=True)

    f = jnp.asarray(rng.random((2, R // 8, R // 8, 512)).astype(np.float32))
    fused_dec = jax.jit(lambda f: dec_mod.decoder_apply(dp, f, cdt))

    def ref_dec(f):
        ci = 0
        xx = f
        from aip_tpu.ops.image import (reflection_pad_2d,
                                       upsample_nearest_2x)
        for layer in dec_mod.DECODER_LAYERS:
            if layer[0] == "conv":
                xx = dec_mod._conv3(reflection_pad_2d(
                    xx.astype(cdt), 1), dp[ci], cdt)
                ci += 1
            elif layer[0] == "up":
                xx = upsample_nearest_2x(xx)
            elif layer[0] == "relu":
                xx = jax.nn.relu(xx)
        return xx

    a = np.asarray(fused_dec(f), np.float32)
    b = np.asarray(jax.jit(ref_dec)(f), np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    print(f"dec fused-vs-xla rel err: max {np.abs(a-b).max()/scale:.2e} "
          f"mean {np.abs(a-b).mean()/scale:.2e}", flush=True)

    # --- serving-graph timing (chained dispatches per sync, bench.py
    # method) through stylize_with_stats.
    from aip_tpu.pipelines.adain_infer import (precompute_style_stats,
                                               stylize_with_stats)

    style = jnp.asarray(rng.random((1, R, R, 3)).astype(np.float32))
    sm, ss = precompute_style_stats(vp, style)

    @jax.jit
    def serve(x):
        return stylize_with_stats(vp, dp, x, sm, ss, alpha=0.5,
                                  compute_dtype=jnp.bfloat16)

    out = serve(x)
    sync(out)
    t0 = time.time()
    for _ in range(args.iters):
        for _ in range(args.chain):
            out = serve(x)
        sync(out)
    dt = (time.time() - t0) / (args.iters * args.chain)
    print(f"serve fused: {dt*1000:.1f} ms/batch{B} = "
          f"{B/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()

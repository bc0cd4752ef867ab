"""Per-stage A/B of the fused AdaIN kernels vs their XLA layer chains:
encoder head (conv0..pool1) and decoder tail (up..conv1) timed in
isolation at batch 32 / 512^2 bf16, 16 chained dispatches per sync.

Usage: python scripts/profile_fused_stages.py [--cpu]
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
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from aip_tpu.models import decoder as dec_mod
    from aip_tpu.models import vgg as vgg_mod

    def sync(x):
        np.asarray(jax.lax.slice(jnp.ravel(x), (0,), (1,)))

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn(*a)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / args.chain)
        print(f"{label:22s}: {best*1000:7.2f} ms", flush=True)
        return best

    rng = np.random.default_rng(0)
    B = args.batch
    vp = vgg_mod.init_vgg_params(jax.random.PRNGKey(0))
    dp = dec_mod.init_decoder_params(jax.random.PRNGKey(1))
    bf = jnp.bfloat16
    x = jnp.asarray(rng.random((B, 512, 512, 3)).astype(np.float32)).astype(bf)
    y = jnp.asarray(np.maximum(
        rng.standard_normal((B, 256, 256, 64)), 0).astype(np.float32)).astype(bf)

    th_e = vgg_mod._head_tile(512)
    enc_fused = jax.jit(functools.partial(
        vgg_mod._head_dispatch, bf, th_e))
    enc_xla = jax.jit(functools.partial(vgg_mod._head_xla, bf))

    bench("enc head fused", lambda: enc_fused(x, vp[0], vp[1], vp[2]))
    bench("enc head xla", lambda: enc_xla(x, vp[0], vp[1], vp[2]))

    th_d = dec_mod._tail_tile(512, 256)
    dec_fused = jax.jit(functools.partial(dec_mod._tail_dispatch, bf, th_d))
    dec_xla = jax.jit(functools.partial(dec_mod._tail_xla, bf))

    bench("dec tail fused", lambda: dec_fused(y, dp[-2], dp[-1]))
    bench("dec tail xla", lambda: dec_xla(y, dp[-2], dp[-1]))


if __name__ == "__main__":
    main()

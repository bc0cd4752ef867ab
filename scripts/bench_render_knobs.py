"""Micro-benchmarks for the two dominant 1080p render phases at 1M
Gaussians (scripts/profile_gs.py breakdown: selection 53.8 ms of which
the 4M-key pair sort is most, mxu composite 52.5 ms of which the packed
gather is 13.4): (a) the raw `lax.sort` cost and cheaper variants, (b)
the dense-group MXU kernel at different group sizes, (c) the [M,Kc,16]
attribute gather in fp32 vs bf16.

Usage: python scripts/bench_render_knobs.py [--n 1000000] [--kc 1408]
"""

import argparse
import functools
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--kc", type=int, default=1408)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    def sync(x):
        np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))

    def bench(fn, *a, reps=8, rounds=3):
        out = fn(*a)
        sync(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            sync(jax.tree_util.tree_leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1000

    rng = np.random.default_rng(0)
    n_pairs = 4 * args.n  # dup_span=2 emission at 1M

    # --- (a) sort variants over the pair keys -------------------------
    key = jnp.asarray(rng.integers(0, 2**30, n_pairs, dtype=np.int32))
    gid = jnp.asarray(rng.integers(0, args.n, n_pairs, dtype=np.int32))

    t = bench(jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), key, gid)
    print(f"sort (int32 key + int32 payload, {n_pairs/1e6:.0f}M): {t:.2f} ms")

    t = bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), key)
    print(f"sort (int32 key alone,           {n_pairs/1e6:.0f}M): {t:.2f} ms")

    key64 = (key.astype(jnp.int64) << 22) | gid.astype(jnp.int64)
    t = bench(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), key64)
    print(f"sort (packed int64 single op,    {n_pairs/1e6:.0f}M): {t:.2f} ms")

    half = n_pairs // 2
    t = bench(jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)),
              key[:half], gid[:half])
    print(f"sort (int32+payload, {half/1e6:.0f}M = compacted): {t:.2f} ms")

    # --- (b) composite kernel group sweep ------------------------------
    from aip_tpu.ops.pallas.composite import composite_macro_mxu_pallas

    M, kc = 510, args.kc
    raw = np.zeros((M, kc, 16), np.float32)
    raw[..., 0] = rng.random((M, kc)) * 64      # block-local-ish means
    raw[..., 1] = rng.random((M, kc)) * 64
    raw[..., 2] = 0.05                           # conic a
    raw[..., 4] = 0.05                           # conic c
    raw[..., 5] = np.log(rng.random((M, kc)) * 0.8 + 0.1)  # log opacity
    raw[..., 6:9] = rng.random((M, kc, 3))
    raw = jnp.asarray(raw)
    counts = jnp.asarray(
        np.clip(rng.normal(866, 120, M), 0, kc).astype(np.int32))
    bg = jnp.zeros(3)

    for group in (32, 64, 128):
        if kc % group:
            continue
        f = jax.jit(functools.partial(
            composite_macro_mxu_pallas, bs=64, mtw=30, group=group,
            interpret=args.cpu))
        t = bench(f, raw, counts, bg)
        print(f"mxu composite kernel (group={group:3d}): {t:.2f} ms")

    # --- (c) packed attribute gather: fp32 vs bf16 ---------------------
    table = jnp.asarray(rng.random((args.n, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, args.n, (M, kc), dtype=np.int32))

    t = bench(jax.jit(lambda tb, ix: tb[ix]), table, idx)
    print(f"gather [{M},{kc},16] fp32: {t:.2f} ms")
    t = bench(jax.jit(lambda tb, ix: tb[ix]), table.astype(jnp.bfloat16), idx)
    print(f"gather [{M},{kc},16] bf16: {t:.2f} ms")
    t = bench(jax.jit(lambda tb, ix: tb[ix]),
              jnp.concatenate([table, table], 1), idx)
    print(f"gather [{M},{kc},32] fp32 (128B rows): {t:.2f} ms")


if __name__ == "__main__":
    main()

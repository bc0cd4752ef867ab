"""Benchmark hash-table gradient backends on the TPU (round-2 target:
kill the 1.05s scatter-add in the colorfield backward).

Usage: python scripts/bench_hashgrad.py [--n 131072] [--log2 19]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=131072)
    parser.add_argument("--log2", type=int, default=19)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--backends", nargs="+",
                        default=["scatter", "mxu"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from aip_tpu.gs import colorfield as CF

    def sync(x):
        np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))

    key = jax.random.PRNGKey(0)
    params = CF.init_colorfield(key, style_dim=None, log2_hashmap=args.log2)
    tables = params.hash_tables
    x = jax.random.uniform(jax.random.PRNGKey(1), (args.n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2),
                              (args.n, CF.N_LEVELS * CF.N_FEATURES))

    # x and g_out are explicit jit ARGUMENTS: closing over them lets XLA
    # constant-fold the index computation (and for constant cotangents the
    # whole table gradient!), which made round-1-style measurements lie.
    fns = {
        "scatter": lambda t, x, g: jnp.sum(CF.hash_encode(t, jax.lax.stop_gradient(x)) * g),
        "sort": lambda t, x, g: jnp.sum(CF.hash_encode_sg(t, x) * g),
        "mxu": lambda t, x, g: jnp.sum(CF.hash_encode_mxu(t, x) * g),
    }

    grads = {}
    for name in args.backends:
        f = jax.jit(jax.grad(fns[name], argnums=0))
        t0 = time.time()
        g = f(tables, x, g_out); sync(g)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            g = f(tables, x, g_out)
        sync(g)
        dt = (time.time() - t0) / args.iters * 1000
        grads[name] = np.asarray(g)
        print(f"{name:8s}: {dt:8.1f} ms/fwd+bwd   (compile {compile_s:.0f}s)")

    # forward alone, runtime x
    fwd = jax.jit(lambda t, x: CF.hash_encode(t, x))
    fwd(tables, x); sync(fwd(tables, x))
    t0 = time.time()
    for _ in range(args.iters):
        out = fwd(tables, x)
    sync(out)
    print(f"fwd only: {(time.time()-t0)/args.iters*1000:8.1f} ms")

    names = list(grads)
    for a in names[1:]:
        err = np.abs(grads[a] - grads[names[0]]).max()
        rel = err / max(np.abs(grads[names[0]]).max(), 1e-12)
        print(f"{a} vs {names[0]}: max abs {err:.2e} (rel {rel:.2e})")


if __name__ == "__main__":
    main()

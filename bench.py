"""Headline benchmark: AdaIN 512px stylization throughput (images/s/chip).

Measures the steady-state throughput of the fused encode->AdaIN->decode graph
at the reference's working resolution (512px, `AdaIN/test.py:161-162`) in
bfloat16 on one chip. Baseline target: 200 images/s/chip on TPU v5e
(BASELINE.md "Rebuild targets").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def wait_for_device(max_wait_s: float = 600.0) -> None:
    """Block until the TPU claim is grantable (or give up after max_wait).

    The axon claim is granted serially and can lag minutes behind a
    previous process's exit; probing in a SUBPROCESS avoids poisoning this
    process's backend cache with a failed init. No-op once a probe lands.
    """
    import subprocess
    import sys
    import time

    probe = ("import jax, jax.numpy as jnp, numpy as np;"
             "x = jnp.ones((8, 8)); np.asarray((x @ x)[0, 0]); print('ok')")
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        # NEVER kill a probe: killing a process that is WAITING for the
        # claim queues a dead claim and extends the wedge (CLAUDE.md). A
        # probe that outlives the window is left running — it exits on its
        # own once granted (tiny matmul) and the bench queues behind it.
        p = subprocess.Popen([sys.executable, "-c", probe],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL)
        while p.poll() is None and time.time() < deadline:
            time.sleep(2.0)
        if p.poll() is None:
            return  # claim still pending; the bench inherits the queue
        if b"ok" in (p.stdout.read() if p.stdout else b""):
            return
        time.sleep(10.0)  # init-level failure (relay down); retry


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    # 16 chained dispatches per sync: the axon relay costs ~29 ms per
    # dispatch+sync round trip (BENCHMARKS.md measurement note), and the
    # GS benches chain 16 for the same reason. Per-dispatch overhead
    # (~1.9 ms) stays in the number — it is real serving cost.
    p.add_argument("--chain", type=int, default=16)
    args = p.parse_args()

    wait_for_device()

    import jax
    import jax.numpy as jnp

    from aip_tpu.models.vgg import init_vgg_params
    from aip_tpu.models.decoder import init_decoder_params
    from aip_tpu.models import weights as weights_mod
    from aip_tpu.pipelines.adain_infer import precompute_style_stats, stylize_with_stats

    # Pretrained weights if available, else deterministic random (same FLOPs).
    try:
        vgg_params = weights_mod.get_vgg_params()
        dec_params = weights_mod.get_decoder_params()
    except Exception:
        vgg_params = init_vgg_params(jax.random.PRNGKey(0))
        dec_params = init_decoder_params(jax.random.PRNGKey(1))

    # Serving shape: one fixed style (stats cached once), a stream of content
    # batches. This is the framework's steady-state stylization path.
    batch, size, chain = args.batch, 512, args.chain
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((batch, size, size, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, size, size, 3)).astype(np.float32))
    s_mean, s_std = precompute_style_stats(vgg_params, style)

    fn = lambda c: stylize_with_stats(vgg_params, dec_params, c, s_mean, s_std,
                                      alpha=0.5, compute_dtype=jnp.bfloat16)

    def sync(x):
        # block_until_ready is a no-op on some remote backends; a tiny host
        # read is the reliable completion barrier.
        np.asarray(x[0, 0, 0, 0])

    out = fn(content)  # warm-up / compile
    sync(out)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(content)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    images_per_s = batch * chain / best

    # MFU: hand-derived conv FLOPs of the stylize graph over the v5e bf16
    # peak (197 TFLOP/s). Always analytic — XLA cost analysis undercounts
    # once the head/tail convs run inside Pallas custom calls (r5 fused
    # kernels report 0 flops to it), and the analytic count is what every
    # prior round's MFU used.
    peak_flops = 197e12
    flops = None
    if not flops:
        # Conv MACs for encoder (3->relu4_1) + decoder mirror at 512px.
        enc = [(3, 3, 1), (3, 64, 1), (64, 64, 1), (64, 128, 2),
               (128, 128, 2), (128, 256, 4), (256, 256, 4), (256, 256, 4),
               (256, 256, 4), (256, 512, 8)]
        dec = [(512, 256, 8), (256, 256, 4), (256, 256, 4), (256, 256, 4),
               (256, 128, 4), (128, 128, 2), (128, 64, 2), (64, 64, 1),
               (64, 3, 1)]
        flops = 0.0
        for ci, co, stride in enc + dec:
            k = 1 if (ci, co) == (3, 3) else 3
            hw = (size // stride) ** 2
            flops += 2.0 * hw * k * k * ci * co
        flops *= batch
    mfu = (flops * chain / best) / peak_flops

    print(json.dumps({
        "metric": "adain_512px_throughput",
        "value": round(images_per_s, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_s / 200.0, 3),
        "mfu": round(mfu, 4),
        "flops_per_image": round(flops / batch / 1e9, 2),
    }))


if __name__ == "__main__":
    main()

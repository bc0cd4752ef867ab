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


def main():
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
    batch, size, chain = 32, 512, 4
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
    print(json.dumps({
        "metric": "adain_512px_throughput",
        "value": round(images_per_s, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_s / 200.0, 3),
    }))


if __name__ == "__main__":
    main()

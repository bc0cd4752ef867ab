#!/bin/bash
# Round-4 TPU measurement queue #5: tiered selection + jitted serving path.
# ONE TPU process at a time; run via run_in_background, poll the log.
set -x
cd /root/repo
echo "=== probe"
timeout 900 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256), jnp.bfloat16)
y = (x@x)
print('probe ok', np.asarray(y)[0,0], jax.devices())"
echo "=== profile_real_render (tiered)"
timeout 1800 python -u scripts/profile_real_render.py --model output/bed_0037_r4
echo "=== bench_real_render (serving path, tiered)"
timeout 1800 python -u scripts/bench_real_render.py --model output/bed_0037_r4 --style /root/reference/input/style/gogh.jpg
echo "=== verify_render_exact (tiers vs merge, 1080p on chip)"
timeout 1800 python -u scripts/verify_render_exact.py --model output/bed_0037_r4
echo "=== queue5 done"

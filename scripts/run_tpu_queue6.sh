#!/bin/bash
# Queue 6: segment-walk composite + 3-pass prefix, measured at 1080p.
set -x
cd /root/repo
timeout 900 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256), jnp.bfloat16)
print('probe ok', np.asarray(x@x)[0,0], jax.devices())"
echo "=== bench_real_render (seg path)"
timeout 1800 python -u scripts/bench_real_render.py --model output/bed_0037_r4 --style /root/reference/input/style/gogh.jpg
echo "=== verify_render_exact (seg vs merge, 1080p on chip)"
timeout 1800 python -u scripts/verify_render_exact.py --model output/bed_0037_r4
echo "=== profile phases (seg)"
timeout 1800 python -u scripts/profile_real_render.py --model output/bed_0037_r4
echo "=== queue6 done"

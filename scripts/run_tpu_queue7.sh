#!/bin/bash
# Queue 7: headline bench confirm (post explicit-pad restore), macro=8
# composite A/B at 1080p, train-step decomposition at 800^2 B=8 (phase-2
# block-gather rewrite effect).
set -x
cd /root/repo
timeout 900 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256), jnp.bfloat16)
print('probe ok', np.asarray(x@x)[0,0], jax.devices())"
echo "=== bench.py headline"
timeout 1200 python bench.py
echo "=== bench_real_render macro=8"
timeout 1800 python -u scripts/bench_real_render.py --model output/bed_0037_r4 --style /root/reference/input/style/gogh.jpg --macro 8
echo "=== train step 800^2 B=8 photometric"
timeout 2400 python -u scripts/bench_train_step.py --res 800 --views_per_step 8 --iters 6
echo "=== train step 800^2 B=8 style"
timeout 2400 python -u scripts/bench_train_step.py --res 800 --views_per_step 8 --iters 6 --phase style
echo "=== queue7 done"

#!/bin/bash
# Second on-chip measurement queue (run AFTER run_tpu_queue.sh completes
# and its bts800 log has been reviewed — the bathtub rerun depends on the
# chunked view-batch step being healthy at 800^2).
#
# 1. Large-scene 1080p render with opacity culling: the VERDICT r2 target
#    is >20 FPS at 1M Gaussians (replicated path gave 11.1 without cull).
# 2. Fast bathtub_0121 rerun with every round-3 lever on (views_per_step=4,
#    capacity-bucket recompaction, opacity cull, per-level hash tables) —
#    same reference schedule, target well under the committed 144 min.
#
# Usage:
#   mkdir -p /tmp/tpu_queue2 && \
#     nohup bash scripts/run_tpu_queue2.sh > /tmp/tpu_queue2/driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue2

probe() {
  timeout 1500 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
print('probe ok', np.asarray(x)[0, 0], jax.devices())" \
    > "/tmp/tpu_queue2/probe_$1.log" 2>&1
  grep -q "probe ok" "/tmp/tpu_queue2/probe_$1.log"
}

run() {
  local name=$1 t=$2 rc; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$t" "$@" > "/tmp/tpu_queue2/$name.log" 2>&1
  rc=$?
  echo "=== $name exit=$rc $(date -u +%H:%M:%S)"
  if [ "$rc" -eq 124 ]; then
    echo "=== $name TIMED OUT — waiting out the claim wedge with one probe"
    if ! probe "after_$name"; then
      echo "=== probe failed after $name timeout — aborting queue"
      exit 1
    fi
  fi
}

probe initial || { echo "initial probe failed — aborting queue"; exit 1; }

# 1M-Gaussian 1080p A/B (kc=1408 = the r2 exact capacity for this fog).
run gs_1m_on   2400 python scripts/bench_gs.py --n 1000000 --backends mxu \
  --macro_capacity 1408 --opacity_cull 1
run gs_1m_off  2400 python scripts/bench_gs.py --n 1000000 --backends mxu \
  --macro_capacity 1408 --opacity_cull 0
run gs_300k_on 1800 python scripts/bench_gs.py --n 300000 --backends mxu \
  --macro_capacity 1280 --opacity_cull 1

# AdaIN serving batch-size probe: does 64/chain-8 beat the default 32/4?
run bench_b64 1800 python bench.py --batch 64 --chain 8

# Streamed-vs-XLA differentiable composite: find the crossover where the
# constant-VMEM Pallas custom-VJP beats dense+remat XLA autodiff.
run composite_ad 3600 python -u scripts/bench_composite_ad.py \
  --res 1088 1536 2048 --iters 4

# Fast bathtub rerun: reference schedule, all round-3 levers on.
run bathtub_fast 10800 python -u scripts/run_bathtub.py \
  --views_per_step 4 --out output/bathtub_fast

# Real-scene 1080p novel-view FPS from the model just trained (the
# north-star metric on actual trained geometry instead of synthetic fog).
run real_render 2400 python scripts/bench_real_render.py \
  --model output/bathtub_fast

echo "=== queue2 complete $(date -u +%H:%M:%S)"

#!/bin/bash
# Pending on-chip measurement queue (relay went down mid-round-3).
# Run as ONE background chain — sequential, generous timeouts, never kill
# a TPU process mid-queue (CLAUDE.md claim-wedge discipline). Each step's
# output goes to its own log under /tmp/tpu_queue/.
#
# Usage:
#   mkdir -p /tmp/tpu_queue && \
#     nohup bash scripts/run_tpu_queue.sh > /tmp/tpu_queue/driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue

probe() { # one PATIENT probe; returns nonzero if the chip is unreachable
  timeout 1500 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
print('probe ok', np.asarray(x)[0, 0], jax.devices())" \
    > "/tmp/tpu_queue/probe_$1.log" 2>&1
  grep -q "probe ok" "/tmp/tpu_queue/probe_$1.log"
}

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2 rc; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$t" "$@" > "/tmp/tpu_queue/$name.log" 2>&1
  rc=$?
  echo "=== $name exit=$rc $(date -u +%H:%M:%S)"
  if [ "$rc" -eq 124 ]; then
    # A timed-out TPU job wedges the device claim (plus its dispatched
    # queue). Do NOT start the next TPU step blind: wait out the wedge
    # with ONE patient probe; abort the whole queue if it fails rather
    # than cascading kill-and-retry.
    echo "=== $name TIMED OUT — waiting out the claim wedge with one probe"
    if ! probe "after_$name"; then
      echo "=== probe failed after $name timeout — aborting queue"
      exit 1
    fi
  fi
}

# 1. ONE patient probe: tiny matmul, waits out any stale claim.
probe initial || { echo "initial probe failed — aborting queue"; exit 1; }

# 2. Headline bench (was 292 img/s r2).
run bench 1800 python bench.py

# 3. Chunked view-batch step at the bathtub shape (CPU-verified, not TPU-benched).
run bts800 5400 python scripts/bench_train_step.py --res 800 --views_per_step 4 --iters 3

# 4. opacity_cull A/B: train step at 512^2 (default capacity/table).
run bts_cull_on  3600 python scripts/bench_train_step.py --iters 10 --opacity_cull 1
run bts_cull_off 3600 python scripts/bench_train_step.py --iters 10 --opacity_cull 0

# 5. opacity_cull A/B: 1080p render, mixed + dim opacity distributions.
run gs_mixed_on   1800 python scripts/bench_gs.py --backends mxu --opacity_cull 1
run gs_mixed_off  1800 python scripts/bench_gs.py --backends mxu --opacity_cull 0
run gs_dim_on     1800 python scripts/bench_gs.py --backends mxu --opacity_dist dim --opacity_cull 1
run gs_dim_off    1800 python scripts/bench_gs.py --backends mxu --opacity_dist dim --opacity_cull 0

echo "=== queue complete $(date -u +%H:%M:%S)"

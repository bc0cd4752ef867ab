#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 "next round" items).
#
#  1. AdaIN per-layer roofline (item 7): batch 32 and 64 tables for
#     BENCHMARKS.md — classify each stage MXU- vs HBM-bound.
#  2. Fast-stylizer distillation (item 5): train magenta from the AdaIN
#     teacher, emit teacher-vs-student metrics + contact sheet.
#  3. bed_0037 800^2 rerun with every r4 lever (item 6): views_per_step=8,
#     packed composite gather, fit_train_selection (trains EXACTLY — no
#     giant truncation). Target <=70 min total.
#  4. Real-scene exact 1080p render on the fresh model (item 3): the
#     direct giant backend; target <=40 ms/frame.
#  5. Headline bench.py re-run.
#
# Usage:
#   mkdir -p /tmp/q4 && nohup bash scripts/run_tpu_queue4.sh \
#     > /tmp/q4/driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/q4

probe() {
  timeout 1500 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
print('probe ok', np.asarray(x)[0, 0], jax.devices())" \
    > "/tmp/q4/probe_$1.log" 2>&1
  grep -q "probe ok" "/tmp/q4/probe_$1.log"
}

run() {
  local name=$1 t=$2 rc; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$t" "$@" > "/tmp/q4/$name.log" 2>&1
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

run roofline_b32 1800 python -u scripts/profile_adain_layers.py --batch 32
run roofline_b32_padded 1800 python -u scripts/profile_adain_layers.py \
  --batch 32 --padded
run roofline_b64 1800 python -u scripts/profile_adain_layers.py --batch 64

run distill 7200 python -u scripts/distill_magenta.py --steps 8000

run bed_r4 10800 python -u scripts/run_bathtub.py \
  --scene /root/reference/input/3dgs/bed_0037/images \
  --style /root/reference/input/style/gogh.jpg \
  --views_per_step 8 --fit_train_selection --out output/bed_0037_r4

run real_render_1080p 2400 python -u scripts/bench_real_render.py \
  --model output/bed_0037_r4

run bench_final 1200 python bench.py

echo "=== queue4 complete $(date -u +%H:%M:%S)"

#!/bin/bash
# Queue 8: segment-walk composite measurements (r4 second session).
# 100k fog already measured interactively: 23.6 ms (42.4 FPS).
set -x
cd /root/repo
echo "=== giant-heavy synthetic (bed-like: 131k, 10% giants), fitted exact"
timeout 2400 python -u scripts/bench_gs.py --n 131072 --giant_frac 0.1 --backends mxu
echo "=== scaling rows (seg path)"
timeout 2400 python -u scripts/bench_gs.py --n 300000 --macro_capacity 1280 --backends mxu
timeout 2400 python -u scripts/bench_gs.py --n 1000000 --macro_capacity 1408 --backends mxu
echo "=== bench.py headline confirm"
timeout 1200 python bench.py
echo "=== train step 800^2 B=8 photometric (phase-2 block-gather effect)"
timeout 2400 python -u scripts/bench_train_step.py --res 800 --views_per_step 8 --iters 6
echo "=== queue8 done"

#!/bin/bash
# Queue 9 (r5, post-training): real-scene exact render re-measure on the
# r4/r5 kernels + fused-AdaIN on-chip validation and headline + video
# A/B. Sequential — ONE TPU process at a time (CLAUDE.md).
set -x
cd /root/repo
echo "=== real-scene fitted-exact 1080p render (r5 trained model)"
timeout 2400 python -u scripts/bench_real_render.py \
  --model output/bed_0037_r5 --style /root/reference/input/style/gogh.jpg
timeout 2400 python -u scripts/verify_render_exact.py \
  --model output/bed_0037_r5
echo "=== fused AdaIN head/tail: on-chip correctness + serving A/B"
timeout 2400 python -u scripts/check_fused_adain.py
AIP_FUSED_ADAIN=0 timeout 2400 python -u scripts/check_fused_adain.py
echo "=== bench.py headline"
timeout 1800 python bench.py
echo "=== video stylizer A/B (AdaIN teacher vs distilled magenta)"
timeout 2400 python -u scripts/bench_video_ab.py
echo "=== queue9 done"

#!/bin/bash
# Full-suite green evidence (VERDICT r4 item #6): fast tier, slow tier,
# and a REVERSED-ORDER run of the gs-training file (the r3
# order-dependence failure class) — logs land in docs/suite/ for commit.
#
# CPU-only (tests/conftest.py forces the CPU backend with 8 virtual
# devices); safe to run while the TPU is busy.
set -x
cd "$(dirname "$0")/.."
mkdir -p docs/suite
{
  echo "== fast tier: pytest -m 'not slow' -q  ($(date -u +%F\ %T)) =="
  python -m pytest tests/ -m "not slow" -q 2>&1 | tail -5
  echo "== reversed-order gs-training guard =="
  python scripts/reversed_order_guard.py 2>&1 | tail -3
  echo "== slow tier: pytest -m slow -q =="
  python -m pytest tests/ -m slow -q 2>&1 | tail -5
  echo "== done ($(date -u +%F\ %T)) =="
} | tee docs/suite/suite_r5.log

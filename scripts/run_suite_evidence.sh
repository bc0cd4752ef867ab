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
  python -m pytest tests/test_gs_training.py -q -p no:cacheprovider \
    --co -q 2>/dev/null | head -0
  python - <<'EOF' 2>&1 | tail -3
# Run test_gs_training with its tests in REVERSE definition order: the
# r3 failure (test_recompact_step_equivalence) only fired under a
# specific predecessor order, so this pins the class dead.
import subprocess, sys
out = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_gs_training.py",
     "-q", "--collect-only", "-q"], capture_output=True, text=True)
ids = [l.strip() for l in out.stdout.splitlines()
       if l.strip().startswith("tests/")]
ids.reverse()
sys.exit(subprocess.run([sys.executable, "-m", "pytest", "-q", *ids]).returncode)
EOF
  echo "== slow tier: pytest -m slow -q =="
  python -m pytest tests/ -m slow -q 2>&1 | tail -5
  echo "== done ($(date -u +%F\ %T)) =="
} | tee docs/suite/suite_r5.log

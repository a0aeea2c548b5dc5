#!/bin/bash
# Serial measurement battery for when the axon relay recovers (see
# CLAUDE.md round-3 notes: run strictly serially, never kill mid-compile —
# every stage gets a >= 3000 s budget). Logs to /tmp/runbook_*.log.
#
#   bash scripts/chip_recovery_runbook.sh
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "/tmp/runbook_${name}.log" 2>&1
  local rc=$?
  tail -5 "/tmp/runbook_${name}.log"
  echo "=== $name rc=$rc ==="
  [ $rc -ne 0 ] && echo "STOPPING: $name failed (chip may be unhealthy)" && exit $rc
  return 0
}

# 1. cheap sanity claim (fails fast-ish if still wedged, 10 min watchdog)
run sanity python -c "
import bench; bench.require_tpu()
import jax, jax.numpy as jnp
print('sanity OK:', float(jax.device_get(jnp.ones((8,8)).sum())))"

# 2. the recorded benchmark (driver metric of record)
run bench python bench.py

# 3. MAD-scale eval A/B: dual-head fusion on/off
run mad_ab_dual python scripts/mad_eval_ab.py --axis dual

# 4. MAD-scale train step: remat policy A/B (HBM/FLOP trade). The CPU cost
# model (scripts/train_cost_analysis.py) says no-remat's temp footprint is
# nearly identical to remat's -- if it fits HBM it saves the recompute.
run mad_train_nothing python scripts/mad_train_step.py --steps 3
run mad_train_dots python scripts/mad_train_step.py --steps 3 --remat-policy dots
run mad_train_noremat python scripts/mad_train_step.py --steps 3 --no-remat

# 5. delegation ratio sweep (encode+ground, 30/50/100%)
run ratio_sweep python scripts/ratio_sweep.py --iters 8

echo "ALL DONE — update PARITY.md with the numbers in /tmp/runbook_*.log"

#!/bin/bash
# Round-3 LN experiment sequence (run on the TPU host, strictly sequential):
#   1. control trace at the current tip (busy baseline, expect ~3.66 ms/batch)
#   2. dot-stats LN trace (the candidate fix for the 0.93 ms/batch of
#      strided LN-stat reductions — models/layers.ln_dot_stats)
#   3. optimized-HLO dump for chasing the 0.19 ms/batch superbatch
#      relayout copy (copy.915 in traces/r3s_hoist2)
# Each step logs to results/r3_ln_experiment.log; parse traces with
# mesm_tpu.utils.trace_report. The TPU relay has shown multi-hour outages,
# and a python run launched into one HANGS at client init — so first block
# on bench.wait_for_backend (subprocess probes, 3h cap).
set -x
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/r3_ln_experiment.log
{
  echo "=== waiting for TPU backend $(date) ==="
  python -c "import bench; bench.wait_for_backend()" || exit 1
  echo "=== control trace $(date) ==="
  timeout 1800 python scripts/profile_eval.py --dedup --bf16 --coalesce 8 \
    --iters 10 --trace-dir traces/r4_ctrl
  echo "=== dot-stats LN trace $(date) ==="
  timeout 1800 python scripts/profile_eval.py --dedup --bf16 --coalesce 8 \
    --iters 10 --dot-stats-ln --trace-dir traces/r4_lnstats
  echo "=== HLO dump $(date) ==="
  timeout 1800 python scripts/profile_eval.py --dedup --bf16 --coalesce 8 \
    --dump-hlo results/hlo_co8.txt
  echo "=== done $(date) ==="
} >"$LOG" 2>&1
tail -5 "$LOG"

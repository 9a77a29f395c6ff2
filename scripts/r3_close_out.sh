#!/bin/bash
# Round-3 close-out artifact refresh (run on the TPU host AFTER the LN
# experiment verdict is applied): regenerates every on-chip artifact the
# round ships —
#   1. TPU_PARITY.json   (kernels off vs auto over a synthetic eval epoch)
#   2. BENCH_EXTRA.json  (headline + tacos + train legs + train vs_baseline
#                         + e2e eval epoch), via bench.py --extra
#   3. FULLSCALE_CHECK.json (released-layout ckpt at real C+SF_C scale
#                         through convert -> evaluate)
# Strictly sequential (1-core host + single chip). Logs to
# results/r3_close_out.log.
set -x
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/r3_close_out.log
{
  echo "=== waiting for TPU backend $(date) ==="
  python -c "import bench; bench.wait_for_backend()" || exit 1
  echo "=== tpu_check (metric parity kernels off vs auto) $(date) ==="
  timeout 3600 python scripts/tpu_check.py
  echo "=== bench --extra $(date) ==="
  timeout 7200 python bench.py --extra
  echo "=== full-scale converter check $(date) ==="
  timeout 3600 python scripts/full_scale_check.py
  echo "=== done $(date) ==="
} >"$LOG" 2>&1
tail -8 "$LOG"

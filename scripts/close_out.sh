#!/bin/bash
# Round close-out gate: refuses the green light unless the smoke tests, the
# multichip dryrun, and the TPU bench are ALL green. Run this BEFORE
# snapshotting a round; a red stage means DO NOT SNAPSHOT until fixed.
#
# Stages (strictly sequential — 1-core host + single TPU chip, per the
# measurement discipline in .claude/skills/verify/SKILL.md):
#   1. smoke tests   (-m smoke: every eval/train dispatch arity — coalesce=1,
#                     tuple-K, superbatch incl. video_feat_g + rows staging,
#                     dedup/hoist, grad-accum — plus span/config/metric sanity)
#   2. multichip dryrun (8-device virtual CPU mesh: DP, grad-accum, data x seq,
#                     data x model FFN-TP, sharded coalesced eval)
#   3. bench.py      (real TPU; the driver-parsed JSON line)
#
# Artifacts: results/close_out.log (full output),
#            results/close_out_status.json (machine-readable verdict),
#            results/multichip_close_out.txt (dryrun tail),
#            results/bench_close_out.json (the bench line).
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/close_out.log
STATUS=results/close_out_status.json
: > "$LOG"

red() {
  printf '{"ok": false, "stage": "%s", "date": "%s"}\n' "$1" "$(date -Is)" > "$STATUS"
  echo "CLOSE-OUT RED at stage: $1 — do NOT snapshot (see $LOG)" | tee -a "$LOG"
  exit 1
}

echo "=== [1/3] smoke tests $(date) ===" | tee -a "$LOG"
timeout 1800 python -m pytest tests/ -m smoke -q >> "$LOG" 2>&1 || red smoke

echo "=== [2/3] multichip dryrun $(date) ===" | tee -a "$LOG"
timeout 1800 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
  > results/multichip_close_out.txt 2>> "$LOG" || red dryrun
cat results/multichip_close_out.txt >> "$LOG"

echo "=== [3/3] TPU bench $(date) ===" | tee -a "$LOG"
timeout 7200 python bench.py > /tmp/bench_out.$$ 2>> "$LOG" || red bench
cat /tmp/bench_out.$$ >> "$LOG"
# the bench line is the LAST line of stdout; it must parse as JSON with a value
tail -1 /tmp/bench_out.$$ > results/bench_close_out.json
python - "$STATUS" <<'EOF' || red bench-parse
import json, sys
line = json.load(open("results/bench_close_out.json"))
assert "value" in line and line["value"] > 0, line
json.dump(
    {"ok": True, "stage": "all", "bench": line,
     "date": __import__("datetime").datetime.now().isoformat()},
    open(sys.argv[1], "w"), indent=1,
)
print("bench:", line)
EOF
rm -f /tmp/bench_out.$$

echo "CLOSE-OUT GREEN $(date) — safe to snapshot" | tee -a "$LOG"

"""Per-batch device-busy from a coalesced eval trace (BASELINE.md protocol).

Fuller accounting (round-3 fourth push): per-batch busy = (scan `%while`
total + every op launched OUTSIDE the scan) / (iters * coalesce). Ops whose
launch count equals iters*coalesce fire inside the scan body and are already
contained in the `%while` total; ops with launch count == iters run once per
dispatch (outside the scan). Usage:

    python scripts/trace_batch_busy.py traces/r4_ctrl [--iters 10] [--coalesce 8]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesm_tpu.utils.trace_report import device_op_totals  # noqa: E402


def batch_busy_ms(trace_dir: str, iters: int = 10, coalesce: int = 8):
    totals, counts, _, _ = device_op_totals(trace_dir)
    per_dispatch = iters
    in_scan = iters * coalesce
    while_ms = sum(ms for op, ms in totals.items() if op.startswith("%while"))
    outside_ms = 0.0
    inside_ms = 0.0
    stragglers = []
    for op, ms in totals.items():
        if op.startswith("%while"):
            continue
        # In-scan test first: with coalesce=1, in_scan == per_dispatch and
        # body ops would otherwise be double-counted into outside_ms (they
        # are already contained in the %while total). When there is no scan
        # at all (while_ms == 0, e.g. an uncoalesced dispatch), every op is
        # outside by definition.
        if while_ms > 0 and counts[op] % in_scan == 0:
            inside_ms += ms
        elif counts[op] == per_dispatch:
            outside_ms += ms
        else:
            # warm-up / stragglers with odd counts: bucket as outside (the
            # conservative choice — inflates rather than hides busy time)
            # and flag them so the anomaly is visible.
            stragglers.append((op, counts[op], ms))
            outside_ms += ms
    for op, n, ms in stragglers:
        print(
            f"[straggler] {op}: count {n} matches neither per-dispatch "
            f"({per_dispatch}) nor in-scan (k*{in_scan}); {ms:.3f} ms "
            "bucketed as outside",
            file=sys.stderr,
        )
    n_batches = iters * coalesce
    return {
        "while_ms_per_batch": while_ms / n_batches,
        "outside_ms_per_batch": outside_ms / n_batches,
        "busy_ms_per_batch": (while_ms + outside_ms) / n_batches,
        "inscan_bodyops_ms_per_batch": inside_ms / n_batches,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--coalesce", type=int, default=8)
    args = ap.parse_args()
    r = batch_busy_ms(args.trace_dir, args.iters, args.coalesce)
    for k, v in r.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()

"""Bucket a fused-TRAIN-step trace into a semantic busy ledger.

The eval side has had three rounds of busy-bucket tables (BASELINE.md);
this gives the train step the same treatment. Buckets are shape/name
heuristics tuned to the flagship charades geometry (B=32 rows -> 64
stacked pos+neg), grouping the XLA ops of traces captured by
scripts/profile_train.py:

  attention   - (64,8,195,195) logits chain + (64,8,32,19x) AV/grads
  ffn         - 1024-wide forward/backward epilogues + dW fusions
  input2818   - the Dv=2818 input block: LN+proj fwd, dW, dropout bwd
  ln/residual - (64,19x) stat pairs + (64,19x,256) normalized outputs
  matmul      - MXU custom-calls / dots / convolutions
  optimizer   - param-shaped elementwise + scalar global-norm partials
  copy/layout - copies, bitcasts-with-cost, transposes
  other       - everything else

Usage: python scripts/train_busy_ledger.py traces/r5_train_fp32 [--steps 10]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesm_tpu.utils.trace_report import device_op_totals  # noqa: E402


def bucket_of(op: str) -> str:
    name = op.split(" = ")[0]
    if re.search(r"%(copy|transpose)", name):
        return "copy/layout"
    if re.search(r"%(dot|convolution)", name) or (
        "custom-call" in name and "fusion" not in name
    ):
        return "matmul"
    # attention: 4-D logits or per-head (B,H,hd,L) tensors anywhere in the op
    if re.search(r"\[64,8,19[45],19[45]\]|\[64,8,32,19[45]\]|\[64,8,19[45]\]|\[8,32\]", op):
        return "attention"
    if "2818" in op:
        return "input2818"
    if re.search(r"\[64,19[45],1024\]|\[1024,256|\[256,1024|f32\[1024\]", op):
        return "ffn"
    if re.search(r"^\(f32\[64,19[45]\]\{", op.split(" = ", 1)[-1]):
        return "ln/residual"
    if re.search(r"\[64,19[45]\]\{[^}]*\}, f32\[64,19[45]\]", op):
        return "ln/residual"
    if re.search(r"f32\[\]\{", op.split(" = ", 1)[-1][:12]):
        return "optimizer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top-other", type=int, default=12,
                    help="print the largest ops left in 'other'")
    args = ap.parse_args()

    totals, counts, busy, plane = device_op_totals(args.trace_dir)
    buckets = defaultdict(float)
    members = defaultdict(list)
    for op, ms in totals.items():
        b = bucket_of(op)
        buckets[b] += ms
        members[b].append((ms, op))
    print(f"plane: {plane}; busy {busy / args.steps:.3f} ms/step "
          f"({len(totals)} distinct ops)")
    for b, ms in sorted(buckets.items(), key=lambda x: -x[1]):
        print(f"  {b:12s} {ms / args.steps:7.3f} ms/step "
              f"({100 * ms / busy:5.1f}%)")
    print(f"\nlargest '{args.top_other and 'other'}' ops:")
    for ms, op in sorted(members["other"], reverse=True)[: args.top_other]:
        print(f"  {ms / args.steps:7.3f}  {op[:150]}")


if __name__ == "__main__":
    main()

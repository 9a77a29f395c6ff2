"""A/B the fused train step with kernel dispatch auto vs off.

Round-3 context: the packed short-key/short-query attention formulations
(models/attention.py) measured a 2x TRAIN regression at TACoS fp32 B=8
(35.1 vs 17.2 ms/step) and are now eval-only by default
(kernels.SHORTKEY_TRAIN / SHORTQUERY_TRAIN). This script re-measures the
train step auto-vs-off on the real chip to (a) confirm the gate restores
kernels-off throughput, and (b) isolate the custom_vjp packed-kernel tier
at B=16 TACoS where it actually engages.

Usage:  python scripts/train_ab.py [--geometry charades|tacos] [--B N]
                                   [--dropout F] [--train-packed]
--train-packed flips SHORTKEY_TRAIN/SHORTQUERY_TRAIN on for the "auto" leg
so the gated formulations can be re-measured without editing kernels.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="charades", choices=["charades", "tacos"])
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--train-packed", action="store_true")
    args = ap.parse_args()

    from bench import train_bench
    from mesm_tpu import kernels

    if args.train_packed:
        kernels.SHORTKEY_TRAIN = True
        kernels.SHORTQUERY_TRAIN = True

    label = f"{args.geometry}-B{args.B}-d{args.dropout}"
    rows_auto, ms_auto = train_bench(
        B=args.B, geometry=args.geometry, dropout=args.dropout,
        label=f"train-auto:{label}",
    )
    with kernels.pallas_scope("off"):
        rows_off, ms_off = train_bench(
            B=args.B, geometry=args.geometry, dropout=args.dropout,
            label=f"train-off:{label}",
        )
    print(json.dumps({
        "geometry": args.geometry, "B": args.B, "dropout": args.dropout,
        "train_packed": args.train_packed,
        "auto_ms_per_step": round(ms_auto, 2),
        "off_ms_per_step": round(ms_off, 2),
        "auto_rows_per_sec": round(rows_auto, 1),
        "off_rows_per_sec": round(rows_off, 1),
        "auto_over_off": round(ms_off / ms_auto, 3),
    }))


if __name__ == "__main__":
    main()

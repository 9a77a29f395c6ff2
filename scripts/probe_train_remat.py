"""On-chip A/B: does remat'ing the training attention core pay?

The round-5 train ledger (traces/r5_train_fp32, BASELINE.md) put the fp32
attention chain at 5.62 ms of the fused step's busy time, with the backward
reloading the saved (64,8,195,195) f32 probability tensors from HBM.
kernels.ATTN_REMAT wraps the quadratic self-attn sites in jax.checkpoint so
the backward recomputes logits->softmax->dropout-mask from the (B,L,E)
inputs instead (models/attention._attention_core_remat; value/grad parity
pinned by tests/test_attention.py::test_attn_remat_matches_plain).

Two variants of the SAME fused step (bench.py geometry + timing protocol:
fetch-forced warmup, blocked wall verified by a post-block fetch),
interleaved rounds; rbg dropout keys (the shipped default):

  plain  - ATTN_REMAT off (shipped default until measured)
  remat  - ATTN_REMAT on at the >= 128x128 sites

Usage (TPU host):  python scripts/probe_train_remat.py [--B 32] [--rounds 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from probe_train_rng import build  # noqa: E402  (same model/step builder)


def time_variant(name, state, step, jb, rng, iters):
    import jax

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, {}, jb, rng)
    jax.block_until_ready(metrics["loss_overall"])
    t1 = time.perf_counter()
    loss = float(metrics["loss_overall"])  # fetch-verify the block
    t2 = time.perf_counter()
    dt = (t2 - t0) if (t2 - t1) > 0.25 * (t1 - t0) else (t1 - t0)
    ms = dt / iters * 1e3
    bench.log(f"[{name}] {ms:.2f} ms/step (loss {loss:.3f})")
    return state, ms, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from mesm_tpu import kernels

    # ATTN_REMAT is read at TRACE time, so each variant gets its own step
    # function warmed (first call traces) under its own flag value.
    bench.log("building + compiling 2 variants (long remote compiles)")
    variants = {}
    for name, flag in (("plain", False), ("remat", True)):
        kernels.ATTN_REMAT = flag
        st, step, jb = build(args.B, args.dropout, args.dtype)
        rng = jax.random.key(7, impl="rbg")
        for _ in range(3):
            st, metrics = step(st, {}, jb, rng)
        loss0 = float(metrics["loss_overall"])  # forces the deferred compile
        variants[name] = (st, step, jb, rng)
        bench.log(f"[{name}] compiled + warmed (step-3 loss {loss0:.6f})")
    kernels.ATTN_REMAT = False

    warmed = {name: v[0] for name, v in variants.items()}
    best = {name: float("inf") for name in variants}
    losses = {}
    for rd in range(args.rounds):
        for name, (_, step, jb, rng) in variants.items():
            warmed[name], ms, loss = time_variant(
                f"round{rd}:{name}", warmed[name], step, jb, rng, args.iters
            )
            best[name] = min(best[name], ms)
            losses[name] = loss
    out = {
        "probe": "train_attn_remat", "B": args.B, "dtype": args.dtype,
        "dropout": args.dropout, "best_ms_per_step": best,
        "final_losses": losses,
        "remat_speedup": round(best["plain"] / best["remat"], 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

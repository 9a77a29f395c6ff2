"""On-chip A/B: how much of the fused TRAIN step is dropout RNG?

The round-5 train trace (traces/r5_train_fp32) shows the busy time
dominated by backward-epilogue fusions, many of which carry fused u32
threefry chains — XLA rematerializes the dropout masks in the backward
pass instead of storing them, so the counter-based PRNG runs twice per
mask. Threefry is VPU-expensive on TPU; JAX ships a hardware-friendly
alternative ('rbg', jax.random.key(seed, impl='rbg')) that lowers to the
native RngBitGenerator.

Three variants of the SAME fused step (bench.py geometry + timing
protocol: fetch-forced warmup, blocked wall verified by a post-block
fetch), interleaved rounds:

  threefry  - the shipped default (jax.random.PRNGKey)
  rbg       - same model/step, rbg-impl key threaded through
  nodrop    - dropout=0 everywhere: upper bound on what ANY rng/dropout
              change could save (mask gen + apply + backward recompute)

Usage (TPU host):  python scripts/probe_train_rng.py [--B 32] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def build(B, dropout, dtype):
    import jax
    import jax.numpy as jnp

    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.parallel.step import TrainState, build_optimizer, make_train_step

    Lv, Dv, Lw, Dt = 194, 2818, 16, 512
    cfg, model, jb, neg = bench.make_model_and_batch(
        B, Lv, Dv, Lw, Dt, dropout=dropout, dtype=dtype
    )
    jb["words_label"] = jb["words_label"] % cfg.num_classes
    jb["row_mask"] = jnp.ones((B,), bool)
    ccfg = CriterionConfig(
        span_coef=10.0, giou_coef=1.0, label_coef=4.0, saliency_coef=4.0,
        recfw_coef=0.1, recss_coef=0.1,
    )

    def encode_text(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    args = (jb["video_feat"], jb["video_mask"], jb["words_feat"],
            jb["words_mask"], jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    params = bench.shape_only_params(model, args, kw, is_training=True)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = make_train_step(model, ccfg, encode_text, tx)
    return state, step, jb


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
    return state, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    variants = {}
    bench.log("building + compiling 3 variants (long remote compiles)")
    sd, stepd, jbd = build(args.B, 0.1, args.dtype)
    # the fused step DONATES its state (donate_argnums): every variant
    # needs its own pristine copy taken BEFORE any step call, or the
    # second variant warms up on deleted buffers
    sd_rbg = jax.tree.map(lambda x: x.copy(), sd)
    variants["threefry"] = (sd, stepd, jbd, jax.random.PRNGKey(7))
    variants["rbg"] = (sd_rbg, stepd, jbd, jax.random.key(7, impl="rbg"))
    s0, step0, jb0 = build(args.B, 0.0, args.dtype)
    variants["nodrop"] = (s0, step0, jb0, jax.random.PRNGKey(7))

    # warm every variant with a real fetch (deferred-compile discipline,
    # BASELINE.md "lazy-dispatch measurement")
    warmed = {}
    for name, (st, step, jb, rng) in variants.items():
        for _ in range(3):
            st, metrics = step(st, {}, jb, rng)
        float(metrics["loss_overall"])
        warmed[name] = st
        bench.log(f"[{name}] compiled + warmed")

    best = {name: float("inf") for name in variants}
    for rd in range(args.rounds):
        for name, (st0, step, jb, rng) in variants.items():
            warmed[name], ms = time_variant(
                f"round{rd}:{name}", warmed[name], step, jb, rng, args.iters
            )
            best[name] = min(best[name], ms)
    out = {"probe": "train_rng", "B": args.B, "dtype": args.dtype,
           "best_ms_per_step": best}
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()

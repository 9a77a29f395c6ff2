"""Capture a jax.profiler trace of the fused TRAIN step and print the per-op
timing table — the train-side counterpart of profile_eval.py.

Run on the TPU host:
  python scripts/profile_train.py [--B 32] [--geometry charades]
                                  [--dtype float32|bfloat16] [--dropout 0.1]
                                  [--grad-accum 1] [--trace-dir traces/train]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="traces/train")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--geometry", default="charades", choices=["charades", "tacos"])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--kernels", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--rng-impl", default="rbg", choices=["rbg", "threefry"],
                    help="dropout PRNG; rbg is the shipped train default "
                         "(config --rng_impl, BASELINE.md round 5)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mesm_tpu import kernels
    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.parallel.step import TrainState, build_optimizer, make_train_step

    kernels.set_pallas_attention(args.kernels)

    if args.geometry == "charades":
        Lv, Dv, Lw, Dt = 194, 2818, 16, 512
    else:
        Lv, Dv, Lw, Dt = 600, 4098, 16, 300
    cfg, model, jb, neg = bench.make_model_and_batch(
        args.B, Lv, Dv, Lw, Dt, dropout=args.dropout, dtype=args.dtype
    )
    jb["words_label"] = jb["words_label"] % cfg.num_classes
    jb["row_mask"] = jnp.ones((args.B,), bool)
    ccfg = CriterionConfig(
        span_coef=10.0, giou_coef=1.0, label_coef=4.0, saliency_coef=4.0,
        recfw_coef=0.1, recss_coef=0.1,
    )

    def encode_text(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    fwd_args = (jb["video_feat"], jb["video_mask"], jb["words_feat"],
                jb["words_mask"], jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    params = bench.shape_only_params(model, fwd_args, kw, is_training=True)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    train_step = make_train_step(model, ccfg, encode_text, tx,
                                 grad_accum=args.grad_accum)
    rng = (jax.random.key(7, impl="rbg") if args.rng_impl == "rbg"
           else jax.random.PRNGKey(7))

    bench.log("compiling train step (long compile)")
    for _ in range(3):
        state, metrics = train_step(state, {}, jb, rng)
    float(metrics["loss_overall"])  # force the deferred compile (BASELINE.md)

    bench.log(f"tracing {args.iters} steps -> {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            state, metrics = train_step(state, {}, jb, rng)
        jax.block_until_ready(metrics["loss_overall"])
    float(metrics["loss_overall"])

    from mesm_tpu.utils.trace_report import report

    print(report(args.trace_dir, top=40))


if __name__ == "__main__":
    main()

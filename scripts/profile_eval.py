"""Capture a jax.profiler trace of the optimized eval step (bench geometry)
and print the per-op timing table (mesm_tpu.utils.trace_report).

Run on the TPU host:  python scripts/profile_eval.py [--trace-dir traces/eval]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench helpers)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="traces/eval")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--geometry", default="charades", choices=["charades", "tacos"])
    ap.add_argument("--kernels", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--coalesce", type=int, default=1,
                    help="trace the dispatch-coalesced eval step (K batches "
                         "per dispatch via make_eval_step, as shipped)")
    ap.add_argument("--no-shortkey", action="store_true",
                    help="disable the packed short-key attention formulation "
                         "(A/B control)")
    ap.add_argument("--shortkey-variant", default=None,
                    choices=["reshape", "segmm", "kernel"])
    ap.add_argument("--int8-ffn", action="store_true")
    ap.add_argument("--dot-stats-ln", action="store_true",
                    help="compute LN stats as MXU dots at the video-stream "
                         "sites (models/layers.ln_dot_stats)")
    ap.add_argument("--dump-hlo", default=None, metavar="PATH",
                    help="write the OPTIMIZED HLO of the step to PATH and "
                         "exit (no trace) — for chasing layout copies")
    args = ap.parse_args()

    import jax

    from mesm_tpu import kernels

    kernels.set_pallas_attention(args.kernels)
    if args.no_shortkey:
        kernels.SHORTKEY_MIN_B = 10**9
    if args.shortkey_variant:
        kernels.SHORTKEY_VARIANT = args.shortkey_variant
    if args.int8_ffn:
        kernels.set_int8_ffn(True)
    if args.dot_stats_ln:
        kernels.set_dot_stats_ln(True)

    if args.geometry == "charades":
        B, Lv, Dv, Lw, Dt = 128, 194, 2818, 16, 512
    else:
        B, Lv, Dv, Lw, Dt = 16, 600, 4098, 16, 300
    cfg, model, jb, neg = bench.make_model_and_batch(
        B, Lv, Dv, Lw, Dt, dtype="bfloat16" if args.bf16 else "float32"
    )
    fwd_args = (jb["video_feat"], jb["video_mask"], jb["words_feat"],
                jb["words_mask"], jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    params = bench.shape_only_params(model, fwd_args, kw)
    if args.dedup:
        kw.update(
            video_feat_g=jb["video_feat_g"], video_mask_g=jb["video_mask_g"],
            video_slot=jb["video_slot"],
        )
        fwd_args = (None, *fwd_args[1:])

    if args.coalesce > 1:
        import jax.numpy as jnp
        from mesm_tpu.parallel.step import make_eval_step

        def encode_passthrough(frozen, b):
            return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

        jb_eval = {k: v for k, v in jb.items() if k != "video_feat"}
        if args.bf16:
            jb_eval = {
                k: v.astype(jnp.bfloat16)
                if v.dtype == jnp.float32 and v.ndim >= 3 else v
                for k, v in jb_eval.items()
            }
        from mesm_tpu.data.pipeline import stage_superbatch

        step_k = make_eval_step(
            model, None, encode_passthrough, with_loss=False,
            coalesce=args.coalesce, superbatch=True,
        )
        import numpy as _np

        host_batches = [
            {k: _np.asarray(v) for k, v in jb_eval.items()}
        ] * args.coalesce
        sb = stage_superbatch(host_batches, cast_bf16=args.bf16)

        def fn(p, *a):
            return step_k(p, {}, sb, jax.random.PRNGKey(0))
    else:
        @jax.jit
        def fn(p, *a):
            out = model.apply(
                {"params": p}, *a,
                is_training=False, deterministic=True, compute_neg=False, **kw,
            )
            return out["pred_spans"], out["pred_logits"], out["saliency_scores"]

    if args.dump_hlo:
        bench.log("compiling for HLO dump")
        if args.coalesce > 1:
            # the real jitted program with the real (transferred) superbatch
            # args — jitting the wrapper would bake `sb` in as constants and
            # hide input-layout copies
            lowered = step_k._jitted.lower(params, {}, sb, jax.random.PRNGKey(0))
        else:
            lowered = fn.lower(params, *fwd_args)
        txt = lowered.compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        bench.log(f"wrote {len(txt.splitlines())} HLO lines -> {args.dump_hlo}")
        return

    bench.log("compiling")
    for _ in range(3):
        r = fn(params, *fwd_args)
    jax.block_until_ready(r)

    bench.log(f"tracing {args.iters} steps -> {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            r = fn(params, *fwd_args)
        jax.block_until_ready(r)

    from mesm_tpu.utils.trace_report import report

    print(report(args.trace_dir, top=35))


if __name__ == "__main__":
    main()

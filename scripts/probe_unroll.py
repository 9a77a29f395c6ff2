"""A/B the coalesced eval scan's unroll factor on the real chip.

kernels.EVAL_SCAN_UNROLL=N emits N consecutive scan bodies per loop
iteration (parallel/step.py _scan_batches). Hypothesis: XLA software-
pipelines the HBM-bound LN/residual fusions of iteration i against the
MXU-bound matmuls of iteration i+1, shaving the last ~2% toward the 5x
eval north star. Timing protocol follows bench.py's coalesced leg
(distinct staged superbatches per submission; laziness cleared by a real
device_get before timing; each timed round ends with block + a small fetch
whose cost is checked against the blocked wall, per BASELINE.md's
lazy-dispatch discipline).

Run on the TPU host:  python scripts/probe_unroll.py [--factors 1 2 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--Lv", type=int, default=194)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import bench  # repo-root bench machinery (backend wait, model factory)

    bench.wait_for_backend()  # ride out transient relay outages (BASELINE.md)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree

    from mesm_tpu import kernels
    from mesm_tpu.data.pipeline import stage_superbatch
    from mesm_tpu.parallel.step import make_eval_step

    B, Lv, K = args.B, args.Lv, args.K
    cfg, model, jb, neg = bench.make_model_and_batch(
        B, Lv, 2818, 32, 512, dtype="bfloat16"
    )
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    params = bench.shape_only_params(
        model,
        (jb["video_feat"], jb["video_mask"], jb["words_feat"],
         jb["words_mask"], jb["sentence_feat"], neg),
        kw,
    )
    flat_params, params_unravel = ravel_pytree(params)

    def encode_passthrough(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    jb_eval = {k: v for k, v in jb.items() if k != "video_feat"}
    jb_eval = {
        k: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 and v.ndim >= 3 else v
        for k, v in jb_eval.items()
    }
    host_b = {k: np.asarray(v) for k, v in jb_eval.items()}
    base_super = stage_superbatch([host_b] * K, cast_bf16=True)
    sf0 = base_super["sentence_feat"]
    n_variants = 2 * args.iters
    sf_variants = [
        jax.device_put(sf0 + jnp.asarray((i + 1) * 1e-4, sf0.dtype))
        for i in range(n_variants)
    ]

    def super_i(i):
        s = dict(base_super)
        s["sentence_feat"] = sf_variants[i % n_variants]
        return s

    rng0 = jax.random.PRNGKey(0)
    results = {}
    ref_scores = None
    # Factor 1 always runs first so the parity diff is genuinely vs unroll=1
    # (running e.g. --factors 2 4 would otherwise silently baseline on 2).
    factors = [1] + [f for f in dict.fromkeys(args.factors) if f != 1]
    for unroll in factors:
        kernels.EVAL_SCAN_UNROLL = unroll
        step_k = make_eval_step(
            model, None, encode_passthrough, with_loss=False, coalesce=K,
            params_unravel=params_unravel, superbatch=True,
        )
        r = step_k(flat_params, {}, base_super, rng0)
        scores = jax.device_get(r[0]["scores"])  # force compile + exec
        if ref_scores is None:
            ref_scores = scores
        else:
            diff = float(np.abs(np.asarray(scores, np.float32)
                                - np.asarray(ref_scores, np.float32)).max())
            print(f"[probe] unroll={unroll} max |score diff| vs unroll=1: {diff:g}",
                  flush=True)
            # not bitwise: unrolling moves fusion boundaries (float
            # reassociation); parity is pinned by tests/test_coalesce.py
            assert diff < 1e-2, "unroll changed values beyond fusion noise"
        best = 0.0
        for rd in range(2):
            t0 = time.perf_counter()
            for i in range(args.iters):
                r = step_k(flat_params, {}, super_i(rd * args.iters + i), rng0)
            jax.block_until_ready(r)
            wall = time.perf_counter() - t0
            # Honesty check (BASELINE.md lazy-dispatch discipline): a small
            # real fetch after block must be cheap; if it isn't, the block
            # was dishonest and the fetch-inclusive wall is the real one.
            tf = time.perf_counter()
            float(np.asarray(jax.device_get(r[0]["scores"])).ravel()[0])
            fetch = time.perf_counter() - tf
            if fetch > 0.25 * wall:
                print(f"[probe] WARNING: post-block fetch {fetch*1e3:.1f} ms "
                      f"vs wall {wall*1e3:.1f} ms — using fetch-inclusive wall",
                      flush=True)
                wall += fetch
            best = max(best, B * K * args.iters / wall)
        results[unroll] = best
        print(f"[probe] unroll={unroll}: {best:.1f} rows/s", flush=True)
    kernels.EVAL_SCAN_UNROLL = 1
    print(json.dumps({"probe": "eval_scan_unroll", "rows_per_sec": results}))


if __name__ == "__main__":
    main()

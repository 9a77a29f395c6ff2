"""A/B the coalesced-leg measurement window (submit-ahead dispatch count).

Round-4 finding: with only 4 submit-ahead dispatches per timed round, the
first-dispatch relay RTT (device idle until the first program arrives) ate
~11% of wall; 12 dispatches recovered it (34,980 -> 36,340 rows/s). This
probe measures whether the REMAINING gap to the busy-bound (3.318 ms/batch
= 38,577 rows/s = 5.08x) is still ramp — i.e. whether rows/s keeps rising
as the timed window grows — or a per-dispatch floor that longer windows
cannot amortize. ONE executable, interleaved rounds across window sizes so
relay drift cancels. Same lazy-dispatch discipline as bench.measure.

Run on the TPU host:  python scripts/probe_ramp.py [--iters 6 12 24 48]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs="+", default=[6, 12, 24, 48])
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--Lv", type=int, default=194)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import bench

    bench.wait_for_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree

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
    max_iters = max(args.iters)
    sf_variants = [
        jax.device_put(sf0 + jnp.asarray((i + 1) * 1e-4, sf0.dtype))
        for i in range(max_iters)
    ]

    def super_i(i):
        s = dict(base_super)
        s["sentence_feat"] = sf_variants[i % max_iters]
        return s

    step_k = make_eval_step(
        model, None, encode_passthrough, with_loss=False, coalesce=K,
        params_unravel=params_unravel, superbatch=True,
    )
    rng0 = jax.random.PRNGKey(0)
    r = step_k(flat_params, {}, base_super, rng0)
    jax.device_get(r[0]["scores"])  # force the deferred compile + exec
    print("[ramp] compiled; timing", flush=True)

    results = {n: 0.0 for n in args.iters}
    for rd in range(args.rounds):  # interleave window sizes across rounds
        for n in args.iters:
            t0 = time.perf_counter()
            for i in range(n):
                r = step_k(flat_params, {}, super_i((rd * 7 + i) % max_iters), rng0)
            jax.block_until_ready(r)
            wall = time.perf_counter() - t0
            tf = time.perf_counter()
            float(np.asarray(jax.device_get(r[0]["scores"])).ravel()[0])
            fetch = time.perf_counter() - tf
            if fetch > 0.25 * wall:
                print(f"[ramp] WARNING: dishonest block at iters={n} "
                      f"(fetch {fetch*1e3:.1f} ms); using fetch-inclusive wall",
                      flush=True)
                wall += fetch
            rate = B * K * n / wall
            results[n] = max(results[n], rate)
            print(f"[ramp] round {rd} iters={n}: {rate:.1f} rows/s "
                  f"({wall / n * 1e3:.2f} ms/dispatch)", flush=True)
    print(json.dumps({"probe": "coalesced_ramp",
                      "rows_per_sec": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()

"""Measure superbatch coalescing K at the flagship eval geometry.

Round-3 question: the coalesced x8 reading shows ~9.4 ms of per-dispatch
relay overhead on top of 8 x 3.7 ms of device-busy time. If that overhead
is fixed per dispatch, K=16/32 amortize it toward the busy-bound ceiling
(~34.5k rows/s at 3.708 ms/batch); if it scales with argument bytes or K,
higher K buys nothing. This prints rows/s for each K so the shipped
default (runner.eval_coalesce_from_opt) is a measured choice, not a guess.

Run on the TPU host (nothing else running):
    python scripts/sweep_coalesce.py [--ks 8,16,32] [--iters 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, make_model_and_batch, shape_only_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="8,16,32")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--B", type=int, default=128)
    args_cli = ap.parse_args()
    ks = [int(k) for k in args_cli.ks.split(",")]

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from mesm_tpu.parallel.step import make_eval_step

    B = args_cli.B
    cfg, model, jb, neg = make_model_and_batch(
        B, 194, 2818, 16, 512, dtype="bfloat16"
    )

    def encode_passthrough(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    fwd_args = (jb["video_feat"], jb["video_mask"], jb["words_feat"],
                jb["words_mask"], jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    params = shape_only_params(model, fwd_args, kw)
    flat_params, params_unravel = ravel_pytree(params)

    # mirror bench.py's shipped device feed: per-row video dropped on the
    # dedup path, float feature tensors staged as bf16
    jb_eval = {k: v for k, v in jb.items() if k != "video_feat"}
    jb_eval = {
        k: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 and v.ndim >= 3 else v
        for k, v in jb_eval.items()
    }
    jb_b = dict(jb_eval)
    jb_b["sentence_feat"] = jb_eval["sentence_feat"] + jnp.asarray(
        1e-3, jb_eval["sentence_feat"].dtype)

    out = {}
    rounds = 2
    for K in ks:
        step = make_eval_step(
            model, None, encode_passthrough, with_loss=False, coalesce=K,
            params_unravel=params_unravel, superbatch=True,
        )
        base = jax.device_put(
            jax.tree.map(lambda x: jnp.stack([x] * K), jb_eval)
        )
        # Honest protocol on this lazy dispatch path (probed, see bench.py's
        # coalesced section): plain-jit results defer compile+exec until the
        # first real device->host fetch, so the warmup MUST fetch; timed
        # submissions cycle distinct pre-staged sentence_feat leaves.
        n_sub = rounds * args_cli.iters
        sf = base["sentence_feat"]
        sf_variants = [
            jax.device_put(sf + jnp.asarray((i + 1) * 1e-4, sf.dtype))
            for i in range(n_sub + args_cli.iters)
        ]
        rng = jax.random.PRNGKey(0)

        def sub(i):
            s = dict(base)
            s["sentence_feat"] = sf_variants[i]
            return s

        log(f"[sweep] K={K}: compiling (first fetch forces it; minutes)")
        t0 = time.perf_counter()
        r = step(flat_params, {}, base, rng)
        jax.device_get(r[0]["scores"])
        log(f"[sweep] K={K}: compile+exec+fetch {time.perf_counter() - t0:.0f} s")
        best = 0.0
        for rd in range(rounds):
            t0 = time.perf_counter()
            for i in range(args_cli.iters):
                r = step(flat_params, {}, sub(rd * args_cli.iters + i), rng)
            jax.block_until_ready(r)
            best = max(best, B * K * args_cli.iters / (time.perf_counter() - t0))
        # with-fetch reading: submit all, then pull every result (the shipped
        # eval pulls preds per superbatch; submit-ahead lets fetch pipeline)
        t0 = time.perf_counter()
        rs = [step(flat_params, {}, sub(n_sub + i), rng)
              for i in range(args_cli.iters)]
        for r in rs:
            jax.device_get(r[0])
        fetched = B * K * args_cli.iters / (time.perf_counter() - t0)
        per_dispatch_ms = B * K / best * 1e3
        log(f"[sweep] K={K}: {best:.1f} rows/s ({per_dispatch_ms:.2f} ms/dispatch, "
            f"{per_dispatch_ms / K:.3f} ms/batch); with-fetch {fetched:.1f} rows/s")
        out[K] = {"block": round(best, 1), "fetch": round(fetched, 1)}
    print(json.dumps({"sweep_coalesce_rows_per_sec": out}))


if __name__ == "__main__":
    main()

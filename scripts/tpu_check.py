"""One-command TPU kernel-path regression check.

Runs the SAME full synthetic eval epoch (HDF5 -> loader -> jitted step ->
decode -> metric suite; the bench_eval_epoch dataset, real charades length
distribution) twice on the real chip — kernels OFF (pure reference-shaped
XLA chain) vs AUTO (packed Pallas attention + fused LN->Dense + shortkey
packed attention, whatever the measured policy enables) — with identical
params and rng, asserts every metric "brief" key matches, and writes
TPU_PARITY.json next to the bench artifacts.

This regenerates, as a committed artifact, the one-off round-2 check where
all 11 brief keys differed by 0.000 (BASELINE.md): a Mosaic lowering
regression or a numerics change in any custom path now fails loudly. The
reference treats its metric suite as the de facto integration test
(SURVEY.md §4); this is that discipline applied to the kernel path.

Run on the TPU host:  python scripts/tpu_check.py
Exit code 0 + TPU_PARITY.json {"ok": true} on parity; nonzero otherwise.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_eval_epoch import ROOT, build_root, log  # noqa: E402


def run_epoch(mode: str):
    """Build loaders/model/params deterministically and run one eval epoch
    under the given kernel-dispatch mode. Returns the metrics dict."""
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from mesm_tpu import kernels
    import mesm_tpu.runner as R
    from mesm_tpu.config import BaseOptions
    from mesm_tpu.evaluate import compute_mr_results, warm_eval_step
    from mesm_tpu.metrics import eval_submission
    from mesm_tpu.parallel.step import make_eval_step
    from mesm_tpu.runner import compute_dtype_from_opt

    cfg_path = build_root(ROOT)
    opt = BaseOptions().parse(["--config_file", cfg_path, "--exp_id", f"tpucheck-{mode}"])
    opt.sort_results = True
    compute_dtype = compute_dtype_from_opt(opt)
    vocab = R.get_vocab(opt)
    _, _, val_loaders, _ = R.build_loaders(opt, vocab, splits="val")
    _, loader = next(iter(val_loaders.items()))
    model = R.build_model(opt, compute_dtype)
    encode_text, frozen = R.build_text_encoder(opt, vocab, compute_dtype)

    batch0, _ = next(iter(loader))
    jb0 = {k: jnp.asarray(v) for k, v in batch0.items()}
    wf, wm, sf = encode_text(frozen, jb0)
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jrandom.PRNGKey(0), "dropout": jrandom.PRNGKey(1),
             "mask_words": jrandom.PRNGKey(2)},
            jb0.get("video_feat"), jb0["video_mask"], wf, wm, sf,
            (jnp.arange(wm.shape[0], dtype=jnp.int32) + 1) % wm.shape[0],
            is_training=False, deterministic=True,
            clip_mask=jb0["clip_mask"],
            ss_sent_idx=jb0["ss_sent_idx"], ss_sent_mask=jb0["ss_sent_mask"],
            ss_own_pos=jb0["ss_own_pos"],
            video_feat_g=jb0.get("video_feat_g"),
            video_mask_g=jb0.get("video_mask_g"),
            video_slot=jb0.get("video_slot"),
        )
    )
    rng_np = np.random.default_rng(0)  # same seed both modes -> same params
    params = jax.tree.map(
        lambda s: jnp.asarray(rng_np.normal(0, 0.02, s.shape).astype(np.float32), s.dtype),
        variables["params"],
    )
    with kernels.pallas_scope(mode):
        eval_step = make_eval_step(
            model, None, encode_text, with_loss=False,
            coalesce=R.eval_coalesce_from_opt(opt, n_batches=len(loader)),
            superbatch=True,
        )
        t0 = time.perf_counter()
        warm_eval_step(params, frozen, eval_step, loader, opt, jrandom.PRNGKey(0))
        submission = compute_mr_results(
            params, frozen, eval_step, loader, opt, jrandom.PRNGKey(0)
        )
        log(f"[{mode}] epoch (incl. compiles): {time.perf_counter() - t0:.1f}s")
    return eval_submission(
        submission, loader.dataset.data, dataset_name=opt.dataset_name,
        num_workers=opt.num_workers,
    )


def main() -> int:
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        log("WARNING: no TPU backend — this check is meaningful on the real "
            "chip only (CPU runs Pallas in interpret mode)")

    briefs = {}
    for mode in ("off", "auto"):
        briefs[mode] = run_epoch(mode)["brief"]
        log(f"[{mode}] brief: {json.dumps(briefs[mode], sort_keys=True)}")

    keys = sorted(set(briefs["off"]) | set(briefs["auto"]))

    def diff(a, b):
        # None = metric undefined for this dataset's length mix (e.g.
        # MR-superlong-mAP outside TACoS); equal-None is parity, a
        # None/number mismatch is a real divergence
        if a is None and b is None:
            return 0.0
        if a is None or b is None:
            return float("inf")
        return round(abs(a - b), 6)

    diffs = {
        k: diff(briefs["off"].get(k), briefs["auto"].get(k)) for k in keys
    }
    ok = all(d == 0.0 for d in diffs.values())
    out = {
        "ok": ok,
        "backend": backend,
        "keys_compared": len(keys),
        "max_abs_diff": max(diffs.values()) if diffs else None,
        "diffs": diffs,
        "brief_off": briefs["off"],
        "brief_auto": briefs["auto"],
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TPU_PARITY.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}: ok={ok} max_abs_diff={out['max_abs_diff']}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

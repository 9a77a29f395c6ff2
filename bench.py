"""Benchmark: MESM eval-step throughput on one TPU chip (charades C+SF geometry).

Default mode prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- metric: steady-state eval throughput in rows(=query-clips)/sec of the
  optimized path (negative pass elided at inference; XLA attention — the
  fused Pallas kernel is available but off by default, see mesm_tpu/kernels.py).
- vs_baseline: ratio against a faithful port of the reference's inference
  computation running on the SAME chip (XLA einsum attention, negative pass
  computed as the reference does at eval — eval.py:63 runs the full forward).
  The reference's own GPU numbers are not measurable in this environment
  (BASELINE.md: no published numbers); same-chip faithful-port is the honest
  baseline.

`python bench.py --extra` additionally measures (and appends JSON lines for):
  - train_throughput_rows_per_sec: the fully fused train step (forward incl.
    stacked negative pass + on-device Hungarian + all losses + AdamW) at
    batch 32, charades geometry.
  - tacos_eval_throughput_rows_per_sec: eval step at TACoS geometry
    (Lv=600, C3D features), where the Pallas kernel auto-enables.
  - qvh_train/eval_rows_per_sec: QVHighlights geometry (Lv=75, multi-clip
    LSAP matcher, saliency labels + triplet, group SS video).
Results are also written to BENCH_EXTRA.json.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_model_and_batch(B, Lv, Dv, Lw, Dt, hidden=256, heads=8, ffn=1024,
                         n_groups=None, dtype="float32", dropout=0.1,
                         T=0, num_classes=1114):
    import jax
    import jax.numpy as jnp

    from mesm_tpu.models import MESM
    from mesm_tpu.models.mesm import MESMConfig
    from mesm_tpu.parallel.step import sample_out_of_group

    cfg = MESMConfig(
        hidden_dim=hidden, v_feat_dim=Dv, t_feat_dim=Dt, nheads=heads,
        dim_feedforward=ffn, num_queries=10, max_words_l=Lw, max_video_l=Lv,
        num_classes=num_classes, rec_fw=True, rec_ss=True, aux_loss=True,
        dropout=dropout,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )
    model = MESM(cfg)

    rng = np.random.default_rng(0)
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from synth import make_batch

    # group structure mirrors real charades eval batches (~2.4 sentences per
    # video) so the deduplicated-video path is benched honestly
    if n_groups is None:
        n_groups = max(2, int(B / 2.4))
    batch = make_batch(rng, B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=3,
                       n_groups=n_groups, T=T)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    neg = sample_out_of_group(jax.random.PRNGKey(0), jb["group_id"])
    return cfg, model, jb, neg


def shape_only_params(model, args, kw, is_training=False):
    """Throughput doesn't depend on parameter values, and a full model.init
    would cost a multi-minute compile of its own."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "mask_words": jax.random.PRNGKey(2)},
            *args, is_training=is_training, deterministic=True, **kw,
        )
    )
    rng_np = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            rng_np.normal(0, 0.02, s.shape).astype(np.float32), dtype=s.dtype
        ),
        shapes["params"],
    )
    return jax.device_put(params, jax.devices()[0])


def measure(fn, arg_sets, B, iters=20, warmup=3, rounds=2):
    """Best-of-`rounds` throughput: host/relay interference only ever ADDS
    wall time on this shared single-core host, so max is the honest reading.

    arg_sets: EITHER one args tuple OR a list of >= 2 distinct pre-staged
    tuples to cycle through. Cycling distinct inputs defeats execution
    memoization in the dispatch path — round 3 observed identical repeated
    AOT submissions returning physically impossible walls (0.19 ms for a
    3.7 ms-busy step, 859% "MFU") while a jit loop with varying state
    measured an honest 5.4 ms (probe: block-last vs device_get agree).

    Lazy-dispatch discipline (round 3, probed): on this platform, plain-jit
    results defer COMPILATION AND EXECUTION until the first real
    device->host fetch in the process — block_until_ready returns
    immediately until then (observed: block 0.08 ms, then a first
    np.asarray() taking the full 220 s compile). So the warmup here ends
    with a real fetch, and each timed round ends with a fetch of one small
    leaf; if the post-block fetch costs > 25% of the blocked wall, the
    block was dishonest and the fetch-inclusive wall is used."""
    import jax

    def _first_leaf(r):
        return jax.tree_util.tree_leaves(r)[0]

    if not isinstance(arg_sets, list):
        arg_sets = [arg_sets]
    for _ in range(warmup):
        r = fn(*arg_sets[0])
    jax.device_get(_first_leaf(r))  # force deferred compile+exec now
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(iters):
            r = fn(*arg_sets[i % len(arg_sets)])
        jax.block_until_ready(r)
        t1 = time.perf_counter()
        jax.device_get(_first_leaf(r))
        t2 = time.perf_counter()
        wall = (t2 - t0) if (t2 - t1) > 0.25 * (t1 - t0) else (t1 - t0)
        best = max(best, B * iters / wall)
    return best


def eval_bench(B, Lv, Dv, Lw, Dt, label, with_baseline=False, dtype="bfloat16"):
    """Optimized path: bf16 compute (metric parity gated by
    tests/test_e2e.py::test_bf16_eval_metric_parity), deduplicated video
    projection, no negative pass. Baseline: faithful fp32 reference
    semantics (per-row video, negative pass as reference eval.py:63)."""
    import jax

    from mesm_tpu import kernels

    cfg, model, jb, neg = make_model_and_batch(B, Lv, Dv, Lw, Dt, dtype=dtype)
    if with_baseline:
        _, model_f32, _, _ = make_model_and_batch(B, Lv, Dv, Lw, Dt, dtype="float32")
    else:
        model_f32 = model
    args = (jb["video_feat"], jb["video_mask"], jb["words_feat"], jb["words_mask"],
            jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    log(f"[{label}] shape-only param init")
    params = shape_only_params(model, args, kw)

    def make_fn(compute_neg: bool, dedup: bool = False, m=None):
        m = m if m is not None else model
        extra = dict(kw)
        if dedup:  # the shipped eval path: project unique videos, gather rows
            extra.update(
                video_feat_g=jb["video_feat_g"],
                video_mask_g=jb["video_mask_g"],
                video_slot=jb["video_slot"],
            )

        @jax.jit
        def fn(p, *a):
            a = (None, *a[1:]) if dedup else a
            out = m.apply(
                {"params": p}, *a,
                is_training=False, deterministic=True, compute_neg=compute_neg, **extra,
            )
            return out["pred_spans"], out["pred_logits"], out["saliency_scores"]
        return fn

    log(f"[{label}] compiling + measuring optimized path (no neg pass, dedup video)")
    # AOT-compile so the same executable provides the timing AND the XLA FLOPs
    # estimate for MFU accounting (one compile, not two)
    compiled = make_fn(compute_neg=False, dedup=True).lower(params, *args).compile()
    # two distinct input sets (see measure): a tiny pre-staged perturbation
    import jax.numpy as _jnp

    args_b = args[:4] + (args[4] + _jnp.asarray(1e-3, args[4].dtype),) + args[5:]
    fast = measure(compiled, [(params, *args), (params, *args_b)], B)
    log(f"[{label}] optimized: {fast:.1f} rows/s")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            sec_per_step = B / fast
            achieved = flops / sec_per_step
            # v5e peak: 197 TFLOP/s bf16 (MXU); fp32 inputs are computed on
            # the same MXU path, so bf16 peak is the honest denominator
            mfu = achieved / 197e12
            log(
                f"[{label}] XLA flops/step {flops:.3e} ({flops / B:.3e}/row) -> "
                f"{achieved / 1e12:.2f} TFLOP/s achieved, MFU {mfu * 100:.2f}% of bf16 peak"
            )
            if mfu > 0.95:
                log(
                    f"[{label}] WARNING: MFU > 95% is physically implausible — "
                    "the dispatch path returned without executing (see "
                    "measure() docstring); this reading must be discarded"
                )
            eval_bench.last_mfu = {
                "flops_per_row": flops / B, "achieved_tflops": achieved / 1e12,
                "mfu_pct_bf16_peak": mfu * 100,
            }
    except Exception as e:  # cost_analysis is best-effort across backends
        log(f"[{label}] cost_analysis unavailable: {e}")

    # dispatch-coalesced path (the shipped eval pipeline: evaluate.py groups
    # K same-shape batches into one compiled dispatch via make_eval_step
    # coalesce=K). Benched through the SAME shipped step builder. Amortizes
    # this environment's ~1.4 ms per-dispatch host/relay latency across K
    # batches; work per row is identical.
    import jax.numpy as jnp
    from mesm_tpu.parallel.step import make_eval_step

    K = 32  # sweep_coalesce.py: 25.5k/29.5k/31.5k/31.8k rows/s at 8/16/32/64

    def encode_passthrough(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    # mirror the shipped device feed: per-row video dropped on the dedup
    # path, float feature tensors staged as bf16
    jb_eval = {k: v for k, v in jb.items() if k != "video_feat"}
    if dtype == "bfloat16":
        jb_eval = {
            k: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 and v.ndim >= 3 else v
            for k, v in jb_eval.items()
        }
    from jax.flatten_util import ravel_pytree

    flat_params, params_unravel = ravel_pytree(params)
    step_k = make_eval_step(
        model, None, encode_passthrough, with_loss=False, coalesce=K,
        params_unravel=params_unravel, superbatch=True,
    )
    log(f"[{label}] compiling + measuring coalesced path ({K} batches/dispatch, "
        f"superbatch-stacked, flat-packed params)")
    rng0 = jax.random.PRNGKey(0)
    # Measurement discipline on this dispatch path (round 3, probed): results
    # of a plain-`jax.jit` call are LAZY — compilation and execution are
    # deferred until the first real device->host fetch in the process, and
    # until then jax.block_until_ready returns immediately (observed: block
    # 0.08 ms, then a first np.asarray() taking the full 220 s compile).
    # AOT .lower().compile() paths (the single-dispatch reading above) are
    # not affected. So: (a) the warmup MUST fetch, not just block; (b) every
    # timed submission cycles distinct pre-staged superbatches; (c) a reading
    # implying >95% MFU is discarded as a dispatch artifact.
    # staged through the SHIPPED stage_superbatch (host stack + one transfer
    # per field, video features as row-major-pinned 2-D rows) so the bench
    # measures the production entry layouts — an on-device jnp.stack commits
    # layouts the timed pipeline never sees (and pays copy.745, BASELINE.md)
    from mesm_tpu.data.pipeline import stage_superbatch

    host_b = {k: np.asarray(v) for k, v in jb_eval.items()}
    base_super = stage_superbatch([host_b] * K, cast_bf16=(dtype == "bfloat16"))
    sf0 = base_super["sentence_feat"]
    # iters x 2 rounds of DISTINCT inputs: every timed submission must be
    # unique (memoization discipline above). iters=48, up from 12 (and from
    # 4 in round 3): with few submit-ahead dispatches per round, the pipeline
    # ramp (first-dispatch relay RTT before the device has queued work)
    # dominates the timed wall. scripts/probe_ramp.py measured the window
    # curve on-chip (one executable, interleaved rounds): 6 dispatches
    # 33,599 rows/s < 12: 34,284 < 24: 34,605 < 48: 34,768 — steady state
    # needs the window long enough that the one-time ramp is noise. 48
    # dispatches ~ 5.4 s device time per round; the 96 staged sentence_feat
    # variants cost < 1 GB HBM at the flagship geometry.
    iters = 48
    n_variants = 2 * iters
    sf_variants = [
        jax.device_put(sf0 + jnp.asarray((i + 1) * 1e-4, sf0.dtype))
        for i in range(n_variants)
    ]

    def super_i(i):
        s = dict(base_super)
        s["sentence_feat"] = sf_variants[i % n_variants]
        return s

    r = step_k(flat_params, {}, base_super, rng0)
    jax.device_get(r[0]["scores"])  # force compile + exec (see note above)
    fast_k = 0.0
    for rd in range(2):  # best-of-2, as in measure()
        t0 = time.perf_counter()
        for i in range(iters):
            r = step_k(flat_params, {}, super_i(rd * iters + i), rng0)
        jax.block_until_ready(r)
        fast_k = max(fast_k, B * K * iters / (time.perf_counter() - t0))
    mfu_info = getattr(eval_bench, "last_mfu", None)
    if mfu_info and mfu_info["flops_per_row"] * fast_k > 0.95 * 197e12:
        log(f"[{label}] WARNING: coalesced reading {fast_k:.1f} rows/s implies "
            ">95% MFU — physically implausible, discarded (lazy-dispatch "
            "artifact; see comment above)")
        fast_k = 0.0
    log(f"[{label}] coalesced x{K}: {fast_k:.1f} rows/s "
        f"(single-dispatch: {fast:.1f})")
    fast = max(fast, fast_k)

    if not with_baseline:
        return fast, None

    # faithful-port baseline: XLA attention, full reference inference forward
    # (negative pass included, as the reference computes at eval — eval.py:63).
    # Its semantics are frozen, so the measurement is cached in the repo;
    # delete BENCH_BASELINE.json to re-measure.
    import os

    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    key = f"{jax.default_backend()}-B{B}-Lv{Lv}-Dv{Dv}"
    base = None
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        if cached.get("key") == key:
            base = cached["baseline_rows_per_sec"]
            log(f"[{label}] baseline (cached {cached.get('measured')}): {base:.1f} rows/s")
    if base is None:
        kernels.set_pallas_attention(False)
        log(f"[{label}] compiling + measuring faithful-port baseline (fp32)")
        base = measure(
            make_fn(compute_neg=True, m=model_f32),
            [(params, *args), (params, *args_b)], B,
        )
        log(f"[{label}] baseline: {base:.1f} rows/s")
        import datetime

        # read-modify-write: the same cache file also holds the TRAIN
        # baseline keys — a fresh eval re-measure must not clobber them
        cached = {}
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                cached = json.load(f)
        cached.update(
            {"key": key, "baseline_rows_per_sec": base,
             "measured": datetime.date.today().isoformat()}
        )
        with open(cache_path, "w") as f:
            json.dump(cached, f)
        kernels.set_pallas_attention(None)
    return fast, base


def train_bench(B=32, geometry="charades", dropout=0.1, label="train",
                dtype="float32"):
    """Fused train step: forward (stacked neg pass) + on-device matching +
    all five losses + grad clip + AdamW.

    geometry='tacos' + dropout=0.0 is the configuration where the packed
    attention kernel's custom_vjp path ENGAGES in training (fp32 tier needs
    Lv >= 512 AND B >= 16 — kernels.AUTO_MIN_*; reference configs keep
    attention dropout 0.1, which forces the XLA core — correctly, since
    dropout must ride XLA's rng).

    dtype='bfloat16' measures the mixed-precision train mode
    (--compute_dtype bfloat16: fp32 params/optimizer, bf16 activations —
    the TPU-native option the reference has no analog of)."""
    import jax
    import jax.numpy as jnp

    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.parallel.step import TrainState, build_optimizer, make_train_step

    if geometry == "charades":
        Lv, Dv, Lw, Dt = 194, 2818, 16, 512
    else:
        Lv, Dv, Lw, Dt = 600, 4098, 16, 300
    cfg, model, jb, neg = make_model_and_batch(
        B, Lv, Dv, Lw, Dt, dropout=dropout, dtype=dtype)
    jb["words_label"] = jb["words_label"] % cfg.num_classes
    jb["row_mask"] = jnp.ones((B,), bool)
    ccfg = CriterionConfig(
        span_coef=10.0, giou_coef=1.0, label_coef=4.0, saliency_coef=4.0,
        recfw_coef=0.1, recss_coef=0.1,
    )

    def encode_text(frozen, b):  # features precomputed (GloVe-pkl style path)
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    args = (jb["video_feat"], jb["video_mask"], jb["words_feat"], jb["words_mask"],
            jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    log(f"[{label}] shape-only param init")
    params = shape_only_params(model, args, kw, is_training=True)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    train_step = make_train_step(model, ccfg, encode_text, tx)
    # rbg = the shipped train default (config --rng_impl): threefry dropout
    # mask generation + backward recompute was 46% of the fused fp32 step
    # (26.8 -> 15.4 ms/step, scripts/probe_train_rng.py, BASELINE.md r5)
    rng = jax.random.key(7, impl="rbg")

    log(f"[{label}] compiling + measuring fused train step (long compile)")
    for _ in range(3):
        state, metrics = train_step(state, {}, jb, rng)
    float(metrics["loss_overall"])  # real fetch: forces the deferred compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, {}, jb, rng)
    jax.block_until_ready(metrics["loss_overall"])
    t1 = time.perf_counter()
    float(metrics["loss_overall"])  # fetch-verify the block (see measure())
    t2 = time.perf_counter()
    dt = (t2 - t0) if (t2 - t1) > 0.25 * (t1 - t0) else (t1 - t0)
    rows = B * iters / dt
    log(f"[{label}] {dt / iters * 1e3:.1f} ms/step = {rows:.1f} rows/s")
    return rows, dt / iters * 1e3


def train_baseline_bench(B=32, host_sync=False):
    """Faithful-port TRAIN baseline: the reference's train-step semantics
    expressed in XLA on the same chip — fp32, XLA attention (kernels off),
    and the reference's PER-STEP DEVICE->HOST MATCHER SYNC reproduced
    faithfully: reference model/matcher.py:106-117 moves the cost matrix to
    CPU and solves the (degenerate single-target) LSAP with scipy inside
    every criterion call (main + each aux decoder layer, criterion.py:333,
    348-363). Here the cost matrix leaves the device through an ordered
    io_callback, the argmin runs on host numpy (the 1-column LSAP solution),
    and the result re-enters the XLA program — one genuine round-trip per
    match, inside one forward+backward like torch's retained graph. The
    loss is also pulled to host every step (reference float(loss) meters,
    train.py:75-77)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback

    from mesm_tpu import kernels
    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.losses import criterion as C
    from mesm_tpu.ops import matcher as M
    from mesm_tpu.parallel.step import TrainState, build_optimizer, make_train_step

    Lv, Dv, Lw, Dt = 194, 2818, 16, 512
    cfg, model, jb, neg = make_model_and_batch(B, Lv, Dv, Lw, Dt, dtype="float32")
    jb["words_label"] = jb["words_label"] % cfg.num_classes
    jb["row_mask"] = jnp.ones((B,), bool)
    ccfg = CriterionConfig(
        span_coef=10.0, giou_coef=1.0, label_coef=4.0, saliency_coef=4.0,
        recfw_coef=0.1, recss_coef=0.1,
    )

    def encode_text(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    def host_single_target_lsap(cost):
        # the reference's single-clip path: each sample's 1-column LSAP on CPU
        return np.argmin(np.asarray(cost), axis=1).astype(np.int32)

    # custom_vjp shields the io_callback from JVP tracing (io_callback has no
    # JVP rule even under stop_gradient); match indices carry no gradient,
    # exactly like the reference's detached scipy result
    @jax.custom_vjp
    def host_match_cb(cost):
        return io_callback(
            host_single_target_lsap,
            jax.ShapeDtypeStruct((cost.shape[0],), jnp.int32),
            cost, ordered=True,
        )

    host_match_cb.defvjp(
        lambda cost: (host_match_cb(cost), cost),
        lambda cost, g: (jnp.zeros_like(cost),),
    )

    def faithful_match(pred_logits, pred_spans, batch, mcfg):
        cost = M._pair_cost(
            pred_logits, pred_spans,
            batch["norm_span"][:, None, :], batch["norm_moment"][:, None, :],
            mcfg.cost_span, mcfg.cost_giou, mcfg.cost_class,
        )[:, :, 0]  # (B, nq)
        return host_match_cb(cost)

    args = (jb["video_feat"], jb["video_mask"], jb["words_feat"], jb["words_mask"],
            jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    log("[train-baseline] shape-only param init")
    params = shape_only_params(model, args, kw, is_training=True)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )

    orig_match = C._match
    C._match = faithful_match
    def run(tag):
        nonlocal state
        with kernels.pallas_scope("off"):
            train_step = make_train_step(model, ccfg, encode_text, tx)
            # the baseline gets the SAME rbg dropout keys as the optimized
            # step: the PRNG is our implementation choice, not reference
            # semantics, and handicapping the baseline with threefry would
            # inflate the ratio (threefry baseline measured 65.2 ms/step on
            # 2026-08-19; see BASELINE.md round-5 train ledger)
            rng = jax.random.key(7, impl="rbg")
            log(f"[train-baseline] compiling + measuring ({tag}, fp32)")
            for _ in range(3):
                state, metrics = train_step(state, {}, jb, rng)
            float(metrics["loss_overall"])  # real fetch: force deferred compile
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = train_step(state, {}, jb, rng)
                float(metrics["loss_overall"])  # reference per-step meter sync
            return time.perf_counter() - t0, iters

    # This environment's remote-compile relay cannot run programs containing
    # io_callback: the host-sync matcher program died 3x on 2026-08-19
    # (UNAVAILABLE at compile twice, ABORTED at the first fetch once) and a
    # 4th time on 2026-08-20 (ABORTED — and the abort killed the ENTIRE TPU
    # client, so even an in-process fallback could not run; host-sync
    # attempts are therefore isolated in a subprocess, see main()). Default
    # here is the reference-shaped fp32 step (on-device matcher, kernels
    # off, per-step loss fetch like the reference's float(loss) meters,
    # train.py:75-77). The omitted per-step host matcher sync makes THIS
    # BASELINE FASTER than the reference's semantics, so the published
    # train vs_baseline is an UNDERSTATEMENT. On hardware with a local
    # host, MESM_TRAIN_BASELINE_SYNC=1 measures the faithful sync.
    try:
        if host_sync:
            dt, iters = run("host-sync matcher")
        else:
            C._match = orig_match
            dt, iters = run("reference-shaped, on-device matcher")
    finally:
        C._match = orig_match
    rows = B * iters / dt
    log(f"[train-baseline] {dt / iters * 1e3:.1f} ms/step = {rows:.1f} rows/s")
    return rows, dt / iters * 1e3


def qvh_bench(B=32, Lv=75, Dv=2818, Lw=32, Dt=512, Lss=150, K=32,
              hidden=256, heads=8, ffn=1024, num_classes=5003):
    """QVHighlights geometry (reference config/QVHighlights/C+SF_C.json:
    clip_len 2, max_video_l 75, 2816+2 TEF features, 32 words, queries 10;
    num_classes = vocab 5000 + 3 CLIP specials): the criterion/matcher path
    the charades and tacos legs never touch — multi-clip LSAP matching
    (reference model/matcher.py:108-111), saliency-LABEL rank loss + triplet
    (reference model/criterion.py:139-221), multi-window targets, and the
    per-row concatenated group video for SS-MESM
    (reference model/model.py:184-219 via collate_qvh).

    Train leg: fused fp32 step at B rows. Eval leg: the shipped coalesced
    superbatch step (bf16, per-row video — multi-clip excludes the dedup
    path, runner.make_batch_spec). Returns (train_rows, train_ms, eval_rows).
    """
    import jax
    import jax.numpy as jnp

    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.parallel.step import (
        TrainState, build_optimizer, make_eval_step, make_train_step,
    )

    cfg, model, jb, neg = make_model_and_batch(
        B, Lv, Dv, Lw, Dt, hidden=hidden, heads=heads, ffn=ffn,
        dtype="float32", T=5, num_classes=num_classes)
    rngh = np.random.default_rng(1)
    lens = rngh.integers(Lv + 1, Lss + 1, B)
    jb["ss_video_feat"] = jnp.asarray(
        rngh.normal(size=(B, Lss, Dv)).astype(np.float32))
    jb["ss_video_mask"] = jnp.asarray(np.arange(Lss)[None, :] < lens[:, None])
    jb["words_label"] = jb["words_label"] % cfg.num_classes
    jb["row_mask"] = jnp.ones((B,), bool)
    ccfg = CriterionConfig(
        span_coef=10.0, giou_coef=1.0, label_coef=4.0, saliency_coef=1.0,
        recfw_coef=0.5, recss_coef=0.1, rank_coef=12.0,
        multi_clip=True, use_triplet=True, saliency_margin=0.2,
    )

    def encode_text(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

    args = (jb["video_feat"], jb["video_mask"], jb["words_feat"],
            jb["words_mask"], jb["sentence_feat"], neg)
    kw = dict(
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
        ss_video_feat=jb["ss_video_feat"], ss_video_mask=jb["ss_video_mask"],
    )
    log("[qvh] shape-only param init")
    params = shape_only_params(model, args, kw, is_training=True)
    # ravel for the eval leg BEFORE training: the fused train step DONATES
    # its state (donate_argnums), deleting the original param buffers
    from jax.flatten_util import ravel_pytree

    flat_params, params_unravel = ravel_pytree(params)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    train_step = make_train_step(model, ccfg, encode_text, tx)
    rng = jax.random.key(7, impl="rbg")  # shipped train default (rng_impl)
    log("[qvh] compiling + measuring fused multi-clip train step")
    for _ in range(3):
        state, metrics = train_step(state, {}, jb, rng)
    float(metrics["loss_overall"])  # real fetch: forces the deferred compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, {}, jb, rng)
    jax.block_until_ready(metrics["loss_overall"])
    t1 = time.perf_counter()
    float(metrics["loss_overall"])  # fetch-verify the block (see measure())
    t2 = time.perf_counter()
    dt = (t2 - t0) if (t2 - t1) > 0.25 * (t1 - t0) else (t1 - t0)
    train_rows, train_ms = B * iters / dt, dt / iters * 1e3
    log(f"[qvh] train {train_ms:.1f} ms/step = {train_rows:.1f} rows/s")

    # eval leg: shipped coalesced superbatch step, bf16, per-row video
    from mesm_tpu.data.pipeline import stage_superbatch

    step_k = make_eval_step(
        model, None, encode_text, with_loss=False, coalesce=K,
        params_unravel=params_unravel, superbatch=True,
    )
    jb_eval = {
        k: v for k, v in jb.items()
        if k not in ("video_feat_g", "video_mask_g", "video_slot")
    }
    host_b = {k: np.asarray(v) for k, v in jb_eval.items()}
    base_super = stage_superbatch([host_b] * K, cast_bf16=True)
    sf0 = base_super["sentence_feat"]
    iters = 12
    sf_variants = [
        jax.device_put(sf0 + jnp.asarray((i + 1) * 1e-4, sf0.dtype))
        for i in range(2 * iters)
    ]

    def super_i(i):
        s = dict(base_super)
        s["sentence_feat"] = sf_variants[i % (2 * iters)]
        return s

    log(f"[qvh] compiling + measuring coalesced eval x{K}")
    rng0 = jax.random.PRNGKey(0)
    r = step_k(flat_params, {}, base_super, rng0)
    jax.device_get(r[0]["scores"])  # force deferred compile+exec
    eval_rows = 0.0
    for rd in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            r = step_k(flat_params, {}, super_i(rd * iters + i), rng0)
        jax.block_until_ready(r)
        t1 = time.perf_counter()
        jax.device_get(r[0]["scores"])
        t2 = time.perf_counter()
        wall = (t2 - t0) if (t2 - t1) > 0.25 * (t1 - t0) else (t1 - t0)
        eval_rows = max(eval_rows, B * K * iters / wall)
    log(f"[qvh] coalesced eval x{K}: {eval_rows:.1f} rows/s")
    return train_rows, train_ms, eval_rows


def wait_for_backend(max_wait_s: float = 10800.0) -> None:
    """Block until the TPU backend answers a trivial op, probing in
    SUBPROCESSES so a hung/unavailable relay can't wedge this process.

    The relay's PJRT plugin ('axon') intermittently reports UNAVAILABLE (or
    hangs during client init) for minutes at a time — and outages of 3+
    hours have been observed (2026-08-18); a bench launched into such a
    window used to die before measuring anything. Probing before OUR first
    JAX use costs nothing when the chip is healthy (~4 s) and rides out
    outages. After max_wait_s we proceed anyway and let the real
    initialization fail loudly."""
    import os, subprocess

    probe = "import jax, jax.numpy as jnp; float(jnp.ones((2,)).sum())"
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=120,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                env=dict(os.environ),
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"TPU backend available again (probe {attempt})")
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            log(f"TPU backend still unavailable after {max_wait_s:.0f}s "
                f"({attempt} probes) — proceeding; expect a loud failure")
            return
        log(f"TPU backend unavailable (probe {attempt}); retrying in 30s")
        time.sleep(30)


def main():
    if "--train-baseline-sync-probe" in sys.argv:
        # subprocess mode for the faithful host-sync matcher baseline (see
        # the --extra block): io_callback programs have killed this relay's
        # TPU client outright, so the attempt must not share a process with
        # the rest of the bench
        wait_for_backend()
        rows, ms = train_baseline_bench(B=32, host_sync=True)
        print(json.dumps({
            "probe": "train_baseline_sync",
            "rows_per_sec": rows, "ms_per_step": round(ms, 2),
        }))
        return

    extra = "--extra" in sys.argv
    wait_for_backend()

    # charades C+SF geometry (config/charades/C+SF_C.json). The reference
    # evaluates at batch 30 on one GPU; on TPU the eval step is latency-bound
    # at that size, so the TPU-native eval batch is 128 rows (identical math,
    # 4x fewer dispatches per row).
    # NOTE: do not enable jax_compilation_cache_dir here — executable
    # serialization is not supported over this environment's remote-compile
    # relay and stalls the compile.
    fast, base = eval_bench(
        B=128, Lv=194, Dv=2818, Lw=16, Dt=512, label="charades", with_baseline=True
    )
    print(json.dumps({
        "metric": "eval_throughput_rows_per_sec",
        "value": round(fast, 2),
        "unit": "rows/s",
        "vs_baseline": round(fast / base, 3),
    }))

    if extra:
        results = {"charades_eval_rows_per_sec": round(fast, 2),
                   "charades_vs_baseline": round(fast / base, 3)}
        tacos, _ = eval_bench(
            B=16, Lv=600, Dv=4098, Lw=16, Dt=300, label="tacos", with_baseline=False
        )
        results["tacos_eval_rows_per_sec"] = round(tacos, 2)
        print(json.dumps({
            "metric": "tacos_eval_throughput_rows_per_sec",
            "value": round(tacos, 2), "unit": "rows/s",
        }))
        qvh_train, qvh_ms, qvh_eval = qvh_bench(B=32)
        results["qvh_train_rows_per_sec"] = round(qvh_train, 2)
        results["qvh_train_ms_per_step"] = round(qvh_ms, 2)
        results["qvh_eval_rows_per_sec"] = round(qvh_eval, 2)
        print(json.dumps({
            "metric": "qvh_eval_throughput_rows_per_sec",
            "value": round(qvh_eval, 2), "unit": "rows/s",
        }))
        train_rows, ms = train_bench(B=32)
        results["train_rows_per_sec"] = round(train_rows, 2)
        results["train_ms_per_step"] = round(ms, 2)

        # mixed-precision train mode (--compute_dtype bfloat16): fp32
        # params/optimizer, bf16 activations. Reference semantics are fp32,
        # so this is reported as a separate opt-in number, not the headline.
        bf16_rows, bf16_ms = train_bench(B=32, label="train-bf16", dtype="bfloat16")
        results["train_bf16_rows_per_sec"] = round(bf16_rows, 2)
        results["train_bf16_ms_per_step"] = round(bf16_ms, 2)

        # kernel-engaged training: TACoS fp32 geometry with attention dropout
        # 0 is where the packed kernel's custom_vjp path actually runs (see
        # train_bench docstring); measured with the kernel on vs off so the
        # backward-pass win/loss is a recorded number, not an assumption.
        # B=16, not the reference's 8: the fp32 kernel tier needs B >= 16
        # (kernels.AUTO_MIN_BATCH) — at B=8 both sides run identical XLA
        # now that the packed formulations are eval-only (SHORTKEY_TRAIN).
        from mesm_tpu import kernels as _k

        ktrain_rows, kms = train_bench(
            B=16, geometry="tacos", dropout=0.0, label="train-kernel")
        with _k.pallas_scope("off"):
            xtrain_rows, xms = train_bench(
                B=16, geometry="tacos", dropout=0.0, label="train-kernel-off")
        results["train_kernel_tacos_ms_per_step"] = round(kms, 2)
        results["train_kernel_off_tacos_ms_per_step"] = round(xms, 2)

        # faithful-port train baseline (host-sync matcher, fp32): cached —
        # its semantics are frozen; delete BENCH_BASELINE.json to re-measure
        import os

        cache_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
        )
        import jax as _jax

        # the key encodes the matcher-sync variant: a warm on-device-matcher
        # cache must not silently satisfy a MESM_TRAIN_BASELINE_SYNC=1 run
        # (and a measured host-sync number must not pose as the default)
        sync_req = os.environ.get("MESM_TRAIN_BASELINE_SYNC") == "1"
        sync_tag = "-hostsync" if sync_req else ""
        # '-rbg' invalidates the threefry-era cache entry: the baseline's
        # dropout PRNG changed to rbg (see train_baseline_bench), so the
        # cached 65.2 ms measurement no longer describes this program
        tkey = f"train-{_jax.default_backend()}-B32-Lv194-Dv2818-rbg{sync_tag}"
        tbase = None
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                cached = json.load(f)
            if cached.get("train_key") == tkey:
                tbase = cached["train_baseline_rows_per_sec"]
                log(f"[train-baseline] cached: {tbase:.1f} rows/s")
        if tbase is None and sync_req:
            # Host-sync attempts run ISOLATED in a subprocess: the 4th
            # in-process attempt (2026-08-20) ABORTED the entire TPU client,
            # killing the rest of the bench run with it. A subprocess death
            # costs only this leg; the parent's client stays healthy.
            import subprocess as _sp
            import sys as _sys

            log("[train-baseline] host-sync attempt in a subprocess "
                "(io_callback; has failed 4x over this relay)")
            try:
                r = _sp.run(
                    [_sys.executable, os.path.abspath(__file__),
                     "--train-baseline-sync-probe"],
                    capture_output=True, text=True, timeout=2700,
                )
                for line in reversed(r.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        probe = json.loads(line)
                        tbase = probe["rows_per_sec"]
                        tbase_ms = probe["ms_per_step"]
                        break
                if tbase is None:
                    raise RuntimeError(
                        f"probe rc={r.returncode}: {r.stderr[-300:]}"
                    )
            except Exception as e:  # noqa: BLE001 — refusal is a result here
                log(f"[train-baseline] host-sync subprocess refused "
                    f"({type(e).__name__}: {str(e)[:120]}) — recording the "
                    "refusal and measuring the reference-shaped baseline")
                results["train_baseline_sync_note"] = (
                    "io_callback host-sync refused by this relay "
                    "(5th attempt, 2026-08-20); baseline omits the matcher "
                    "sync and OVERSTATES the reference, so vs_baseline is "
                    "an understatement"
                )
                sync_req = False
                tkey = f"train-{_jax.default_backend()}-B32-Lv194-Dv2818-rbg"
        freshly_measured = tbase is None or sync_req
        if tbase is None:
            tbase, tbase_ms = train_baseline_bench(B=32)
        if freshly_measured:
            if os.path.exists(cache_path):
                with open(cache_path) as f:
                    cached = json.load(f)
            else:
                cached = {}
            cached.update({
                "train_key": tkey,
                "train_baseline_rows_per_sec": tbase,
                "train_baseline_ms_per_step": round(tbase_ms, 2),
            })
            with open(cache_path, "w") as f:
                json.dump(cached, f)
        results["train_baseline_rows_per_sec"] = round(tbase, 2)
        results["train_vs_baseline"] = round(train_rows / tbase, 3)
        results["train_bf16_vs_baseline"] = round(bf16_rows / tbase, 3)
        print(json.dumps({
            "metric": "train_throughput_rows_per_sec",
            "value": round(train_rows, 2), "unit": "rows/s",
            "vs_baseline": round(train_rows / tbase, 3),
        }))
        import datetime, os

        results["measured"] = datetime.date.today().isoformat()
        # read-modify-write: scripts/bench_eval_epoch.py records its
        # eval_epoch_* keys in the same file — don't clobber them
        extra_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTRA.json"
        )
        merged = {}
        if os.path.exists(extra_path):
            try:
                with open(extra_path) as f:
                    merged = json.load(f)
            except Exception:
                merged = {}
        merged.update(results)
        with open(extra_path, "w") as f:
            json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()

"""Dispatch-coalesced eval step: K same-shape batches per compiled dispatch.

Coalescing must be value-identical to the per-batch loop (same rng is passed
to every batch by compute_mr_results, so the scanned program reproduces each
per-batch call bit-for-bit). Covers:
  - make_eval_step(coalesce=K) vs K separate calls (preds and losses)
  - compute_mr_results grouping: signature changes flush, remainder groups
    pad by repeating the last batch and discard padding outputs
"""
from __future__ import annotations

import types

import pytest

pytestmark = pytest.mark.smoke  # close-out gate: every eval dispatch arity

import jax
import jax.numpy as jnp
import numpy as np

from synth import make_batch
from mesm_tpu.losses import CriterionConfig
from mesm_tpu.models import MESM
from mesm_tpu.models.mesm import MESMConfig
from mesm_tpu.parallel.step import make_eval_step

B, Lv, Dv, Lw, Dt, G = 6, 24, 32, 12, 20, 3
NUM_CLASSES = 51


def tiny_model():
    cfg = MESMConfig(
        hidden_dim=32,
        v_feat_dim=Dv,
        t_feat_dim=Dt,
        nheads=4,
        dim_feedforward=64,
        num_queries=5,
        max_words_l=Lw,
        max_video_l=Lv,
        num_classes=NUM_CLASSES,
    )
    return MESM(cfg)


def encode_text(frozen, b):
    return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]


def device_batch(seed, Lv_=Lv):
    rng = np.random.default_rng(seed)
    batch = make_batch(rng, B=B, Lv=Lv_, Dv=Dv, Lw=Lw, Dt=Dt, G=G, n_groups=3)
    batch["words_label"] = (batch["words_label"] % NUM_CLASSES).astype(np.int32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def init_params(model, jb):
    return model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "mask_words": jax.random.PRNGKey(2),
        },
        jb["video_feat"],
        jb["video_mask"],
        jb["words_feat"],
        jb["words_mask"],
        jb["sentence_feat"],
        (jnp.arange(B, dtype=jnp.int32) + 1) % B,
        is_training=False,
        deterministic=True,
        clip_mask=jb["clip_mask"],
        words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"],
        ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"],
        ss_own_pos=jb["ss_own_pos"],
    )["params"]


@pytest.mark.parametrize("with_loss", [False, True])
def test_coalesced_step_matches_per_batch(with_loss):
    model = tiny_model()
    batches = [device_batch(s) for s in (1, 2, 3)]
    params = init_params(model, batches[0])
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    rng = jax.random.PRNGKey(9)

    one = make_eval_step(model, ccfg, encode_text, with_loss=with_loss)
    assert one.coalesce == 1
    three = make_eval_step(model, ccfg, encode_text, with_loss=with_loss, coalesce=3)
    assert three.coalesce == 3

    # the scanned program and the standalone program are separate XLA
    # compilations, so fusion/reassociation order differs -> ULP-level float
    # differences are expected (value-equivalent, not bit-equivalent)
    preds_k, losses_k = three(params, {}, tuple(batches), rng)
    for j, b in enumerate(batches):
        preds_1, losses_1 = one(params, {}, b, rng)
        for key in preds_1:
            np.testing.assert_allclose(
                np.asarray(preds_k[key][j]), np.asarray(preds_1[key]),
                rtol=1e-5, atol=1e-5, err_msg=key,
            )
        if with_loss:
            assert set(losses_k) == set(losses_1)
            for key in losses_1:
                np.testing.assert_allclose(
                    np.asarray(losses_k[key][j]), np.asarray(losses_1[key]),
                    rtol=1e-4, atol=1e-5, err_msg=key,
                )


def _meta(tag, n):
    return dict(
        n_rows=n,
        duration=[10.0 + i for i in range(n)],
        qid=[f"{tag}-q{i}" for i in range(n)],
        sentence=[f"{tag}-s{i}" for i in range(n)],
        video_id=[f"{tag}-v{i}" for i in range(n)],
    )


def test_compute_mr_results_coalesced_equals_sequential():
    from mesm_tpu.evaluate import compute_mr_results

    model = tiny_model()
    # 3 batches at Lv, then 2 at Lv+8: exercises the signature-change flush
    # AND two remainder groups (3 = 2+pad, 2 = full) at coalesce=2
    host = [
        (jax.device_get(device_batch(s, lv)), _meta(f"b{s}", B))
        for s, lv in ((1, Lv), (2, Lv), (3, Lv), (4, Lv + 8), (5, Lv + 8))
    ]
    loader = list(host)
    params = init_params(model, {k: jnp.asarray(v) for k, v in host[0][0].items()})
    opt = types.SimpleNamespace(
        sort_results=True, clip_len=1, max_ts_val=100, compute_dtype="float32"
    )
    rng = jax.random.PRNGKey(4)

    seq = compute_mr_results(
        params, {}, make_eval_step(model, None, encode_text, with_loss=False),
        loader, opt, rng,
    )
    co = compute_mr_results(
        params, {},
        make_eval_step(model, None, encode_text, with_loss=False, coalesce=2),
        loader, opt, rng,
    )
    # every row present, in order, and numerically equal up to the separate-
    # compilation ULP noise (windows are rounded to 4 decimals on a ~10s
    # duration scale, so 1e-3 absolute covers a flipped rounding step)
    assert [r["qid"] for r in seq] == [r["qid"] for r in co]
    assert [r["qid"] for r in seq] == [m["qid"][i] for _, m in host for i in range(B)]
    for rs, rc in zip(seq, co):
        assert rs["vid"] == rc["vid"] and rs["query"] == rc["query"]
        np.testing.assert_allclose(
            np.asarray(rs["pred_relevant_windows"]),
            np.asarray(rc["pred_relevant_windows"]),
            atol=1.1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rs["pred_saliency_scores"]),
            np.asarray(rc["pred_saliency_scores"]),
            atol=1e-4,
        )


def test_packed_params_step_matches_pytree():
    """make_eval_step(params_unravel=...) consumes the raveled parameter
    vector and matches the pytree-parameter step (single and coalesced)."""
    from jax.flatten_util import ravel_pytree

    model = tiny_model()
    batches = [device_batch(s) for s in (4, 5)]
    params = init_params(model, batches[0])
    flat, unravel = ravel_pytree(params)
    rng = jax.random.PRNGKey(2)

    ref_step = make_eval_step(model, None, encode_text, with_loss=False)
    flat_step = make_eval_step(
        model, None, encode_text, with_loss=False, params_unravel=unravel
    )
    assert flat_step.packs_params and not ref_step.packs_params
    p1, _ = ref_step(params, {}, batches[0], rng)
    p2, _ = flat_step(flat, {}, batches[0], rng)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p2[key]), np.asarray(p1[key]), rtol=1e-5, atol=1e-5,
            err_msg=key,
        )

    flat_k = make_eval_step(
        model, None, encode_text, with_loss=False, coalesce=2,
        params_unravel=unravel,
    )
    pk, _ = flat_k(flat, {}, tuple(batches), rng)
    for j, b in enumerate(batches):
        pj, _ = ref_step(params, {}, b, rng)
        for key in pj:
            np.testing.assert_allclose(
                np.asarray(pk[key][j]), np.asarray(pj[key]),
                rtol=1e-5, atol=1e-5, err_msg=f"{key}[{j}]",
            )


def test_warm_eval_step_compiles_all_shapes():
    """warm_eval_step stages one batch per shape signature and pre-compiles
    concurrently; the subsequent real pass must produce identical results."""
    from mesm_tpu.evaluate import compute_mr_results, warm_eval_step

    model = tiny_model()
    host = [
        (jax.device_get(device_batch(s, lv)), _meta(f"w{s}", B))
        for s, lv in ((1, Lv), (2, Lv + 8), (3, Lv))
    ]
    loader = list(host)
    params = init_params(model, {k: jnp.asarray(v) for k, v in host[0][0].items()})
    opt = types.SimpleNamespace(
        sort_results=True, clip_len=1, max_ts_val=100, compute_dtype="float32"
    )
    rng = jax.random.PRNGKey(7)
    step = make_eval_step(model, None, encode_text, with_loss=False, coalesce=2)

    base = compute_mr_results(params, {}, step, loader, opt, rng)
    warm_eval_step(params, {}, step, loader, opt, rng)  # 2 distinct shapes
    warmed = compute_mr_results(params, {}, step, loader, opt, rng)
    assert [r["qid"] for r in base] == [r["qid"] for r in warmed]
    for rb, rw in zip(base, warmed):
        np.testing.assert_allclose(
            np.asarray(rb["pred_relevant_windows"]),
            np.asarray(rw["pred_relevant_windows"]), atol=1e-6,
        )


def test_superbatch_step_and_driver_match_tuple_form():
    """make_eval_step(superbatch=True) consumes ONE pre-stacked dict (leading
    K axis, built host-side by stage_superbatch) and matches the tuple-form
    coalesced step; compute_mr_results' superbatch branch (host-side grouping
    + one stacked transfer per group) matches the sequential driver."""
    from mesm_tpu.data.pipeline import stage_superbatch
    from mesm_tpu.evaluate import compute_mr_results

    model = tiny_model()
    batches = [device_batch(s) for s in (11, 12)]
    params = init_params(model, batches[0])
    rng = jax.random.PRNGKey(3)

    tup = make_eval_step(model, None, encode_text, with_loss=False, coalesce=2)
    sb = make_eval_step(
        model, None, encode_text, with_loss=False, coalesce=2, superbatch=True
    )
    assert sb.superbatch and not tup.superbatch
    host = [jax.device_get(b) for b in batches]
    stacked = stage_superbatch(host, cast_bf16=False)
    p_sb, _ = sb(params, {}, stacked, rng)
    p_tup, _ = tup(params, {}, tuple(batches), rng)
    for key in p_tup:
        np.testing.assert_allclose(
            np.asarray(p_sb[key]), np.asarray(p_tup[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )

    # driver: same 3+2 shape layout as the tuple-form driver test (signature
    # flush + padded remainder groups)
    hostb = [
        (jax.device_get(device_batch(s, lv)), _meta(f"sb{s}", B))
        for s, lv in ((1, Lv), (2, Lv), (3, Lv), (4, Lv + 8), (5, Lv + 8))
    ]
    params2 = init_params(model, {k: jnp.asarray(v) for k, v in hostb[0][0].items()})
    opt = types.SimpleNamespace(
        sort_results=True, clip_len=1, max_ts_val=100, compute_dtype="float32"
    )
    rng2 = jax.random.PRNGKey(4)
    seq = compute_mr_results(
        params2, {}, make_eval_step(model, None, encode_text, with_loss=False),
        list(hostb), opt, rng2,
    )
    sup = compute_mr_results(
        params2, {},
        make_eval_step(
            model, None, encode_text, with_loss=False, coalesce=2,
            superbatch=True,
        ),
        list(hostb), opt, rng2,
    )
    assert [r["qid"] for r in seq] == [r["qid"] for r in sup]
    for rs, rc in zip(seq, sup):
        assert rs["vid"] == rc["vid"] and rs["query"] == rc["query"]
        np.testing.assert_allclose(
            np.asarray(rs["pred_relevant_windows"]),
            np.asarray(rc["pred_relevant_windows"]), atol=1.1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rs["pred_saliency_scores"]),
            np.asarray(rc["pred_saliency_scores"]), atol=1e-4,
        )


def test_hoisted_video_projection_matches_in_body():
    """MESM.project_video_groups + the video_proj_g/vid_pos_g kwargs (the
    superbatch scan hoist, parallel/step.py _hoist_video_proj) must produce
    the same outputs as the in-body dedup path (video_feat_g)."""
    model = tiny_model()
    jb = device_batch(11)
    params = init_params(model, jb)
    common = dict(
        is_training=False, deterministic=True, compute_neg=False,
        clip_mask=jb["clip_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    args = (None, jb["video_mask"], jb["words_feat"],
            jb["words_mask"].astype(bool), jb["sentence_feat"],
            (jnp.arange(B, dtype=jnp.int32) + 1) % B)

    out_body = model.apply(
        {"params": params}, *args,
        video_feat_g=jb["video_feat_g"], video_mask_g=jb["video_mask_g"],
        video_slot=jb["video_slot"], **common,
    )
    proj, pos = model.apply(
        {"params": params}, jb["video_feat_g"], jb["video_mask_g"],
        method="project_video_groups",
    )
    out_hoist = model.apply(
        {"params": params}, *args,
        video_proj_g=proj, vid_pos_g=pos.astype(proj.dtype),
        video_slot=jb["video_slot"], **common,
    )
    for key in ("pred_spans", "pred_logits", "saliency_scores"):
        np.testing.assert_allclose(
            np.asarray(out_body[key]), np.asarray(out_hoist[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_flat_hoist_matches_group_form():
    """FLAT_HOIST (measured negative on v5e, kernels.py) must stay
    value-identical to the default group-form hoist: same stage_superbatch
    inputs through make_eval_step(superbatch=True) with the flag on/off."""
    from mesm_tpu import kernels
    from mesm_tpu.data.pipeline import stage_superbatch

    model = tiny_model()
    batches = [device_batch(s) for s in (31, 32)]
    params = init_params(model, batches[0])
    host = [jax.device_get(b) for b in batches]
    rng = jax.random.PRNGKey(5)

    sb = make_eval_step(model, None, encode_text, with_loss=False, coalesce=2,
                        superbatch=True)
    p_group, _ = sb(params, {}, stage_superbatch(host, cast_bf16=False), rng)

    kernels.FLAT_HOIST = True
    try:
        sb2 = make_eval_step(model, None, encode_text, with_loss=False,
                             coalesce=2, superbatch=True)
        p_flat, _ = sb2(params, {}, stage_superbatch(host, cast_bf16=False), rng)
    finally:
        kernels.FLAT_HOIST = False
    for key in p_group:
        np.testing.assert_allclose(
            np.asarray(p_flat[key]), np.asarray(p_group[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_video_rows_staging_matches_group_form():
    """stage_superbatch stages video_feat_g as 2-D row-major-pinned
    `video_feat_rows`; the hoist's project_video_rows path must match the
    4-D project_video_groups path exactly (the projection is position-wise,
    so the flat row view is a pure reshape)."""
    from mesm_tpu.data.pipeline import stage_superbatch

    model = tiny_model()
    batches = [device_batch(s) for s in (21, 22)]
    params = init_params(model, batches[0])
    host = [jax.device_get(b) for b in batches]
    stacked = stage_superbatch(host, cast_bf16=False)
    assert "video_feat_g" not in stacked
    vfr = stacked["video_feat_rows"]
    vm = stacked["video_mask_g"]
    K, NG, Lv_ = vm.shape
    assert vfr.shape == (K * NG * Lv_, Dv)

    proj_r, pos_r = model.apply(
        {"params": params}, vfr, jnp.reshape(vm, (K * NG, Lv_)),
        method="project_video_rows",
    )
    vf4 = jnp.stack([b["video_feat_g"] for b in batches])
    proj_g, pos_g = model.apply(
        {"params": params},
        vf4.reshape((K * NG,) + vf4.shape[2:]),
        jnp.reshape(vm, (K * NG, Lv_)),
        method="project_video_groups",
    )
    np.testing.assert_allclose(
        np.asarray(proj_r).reshape(np.asarray(proj_g).shape),
        np.asarray(proj_g), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(pos_r), np.asarray(pos_g), atol=1e-6)


@pytest.mark.parametrize("coalesce,unroll", [(4, 2), (3, 2)])
def test_scan_unroll_matches_default(coalesce, unroll):
    """kernels.EVAL_SCAN_UNROLL=N (parallel/step.py _scan_batches) must
    match the default lax.map, including when K is not a multiple of N
    (lax.scan unrolls the remainder iterations separately). Tolerance, not
    bitwise: unrolling moves XLA fusion boundaries, which reassociates a
    few float reductions (observed 3/240 elements at ~1e-7 on CPU)."""
    from mesm_tpu import kernels
    from mesm_tpu.data.pipeline import stage_superbatch

    model = tiny_model()
    batches = [device_batch(50 + i) for i in range(coalesce)]
    params = init_params(model, batches[0])
    host = [jax.device_get(b) for b in batches]
    rng = jax.random.PRNGKey(7)

    sb = make_eval_step(model, None, encode_text, with_loss=False,
                        coalesce=coalesce, superbatch=True)
    p_map, _ = sb(params, {}, stage_superbatch(host, cast_bf16=False), rng)

    assert kernels.EVAL_SCAN_UNROLL == 1  # repo default of record
    kernels.EVAL_SCAN_UNROLL = unroll
    try:
        sb2 = make_eval_step(model, None, encode_text, with_loss=False,
                             coalesce=coalesce, superbatch=True)
        p_unr, _ = sb2(params, {}, stage_superbatch(host, cast_bf16=False), rng)
    finally:
        kernels.EVAL_SCAN_UNROLL = 1
    for key in p_map:
        np.testing.assert_allclose(
            np.asarray(p_unr[key]), np.asarray(p_map[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )

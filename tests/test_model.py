"""MESM model shape/behavior tests (structural parity with reference forward,
model/model.py:154-359)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mesm_tpu.models.mesm import MESM, MESMConfig

from synth import make_batch, sample_neg_rows

B, Lv, Dv, Lw, Dt, G = 6, 24, 32, 12, 20, 3
NQ = 5


def small_cfg(**kw):
    base = dict(
        hidden_dim=32,
        v_feat_dim=Dv,
        t_feat_dim=Dt,
        nheads=4,
        dim_feedforward=64,
        num_queries=NQ,
        max_words_l=Lw,
        max_video_l=Lv,
        num_classes=50,
        rec_fw=True,
        rec_ss=True,
        aux_loss=True,
    )
    base.update(kw)
    return MESMConfig(**base)


def init_and_apply(cfg, batch, is_training=True, deterministic=True, seed=0):
    model = MESM(cfg)
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    kwargs = dict(
        is_training=is_training,
        deterministic=deterministic,
        clip_mask=jnp.asarray(batch["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    args = (
        jnp.asarray(batch["video_feat"]),
        jnp.asarray(batch["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
    )
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "dropout": jax.random.PRNGKey(seed + 1),
        "mask_words": jax.random.PRNGKey(seed + 2),
    }
    variables = model.init(rngs, *args, **kwargs)
    out = model.apply(
        variables,
        *args,
        **kwargs,
        rngs={"dropout": jax.random.PRNGKey(3), "mask_words": jax.random.PRNGKey(4)},
    )
    return model, variables, out


@pytest.fixture(scope="module")
def full_run():
    batch = make_batch(np.random.default_rng(0), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg()
    return batch, *init_and_apply(cfg, batch)


def test_dedup_video_path_matches_per_row(full_run):
    """Eval with video_feat_g + video_slot equals the per-row video path
    bit-for-bit (deterministic: the dedup is a pure re-association)."""
    batch, model, variables, _ = full_run
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    kwargs = dict(
        is_training=False,
        deterministic=True,
        clip_mask=jnp.asarray(batch["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    common = (
        jnp.asarray(batch["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
    )
    per_row = model.apply(variables, jnp.asarray(batch["video_feat"]), *common, **kwargs)
    dedup = model.apply(
        variables,
        None,
        *common,
        video_feat_g=jnp.asarray(batch["video_feat_g"]),
        video_mask_g=jnp.asarray(batch["video_mask_g"]),
        video_slot=jnp.asarray(batch["video_slot"]),
        **kwargs,
    )
    for k in per_row:
        np.testing.assert_allclose(
            np.asarray(dedup[k]), np.asarray(per_row[k]), atol=1e-6, err_msg=k
        )


def test_output_shapes(full_run):
    batch, model, variables, out = full_run
    assert out["pred_logits"].shape == (B, NQ, 2)
    assert out["pred_spans"].shape == (B, NQ, 2)
    assert out["saliency_scores"].shape == (B, Lv)
    assert out["neg_saliency_scores"].shape == (B, Lv)
    assert out["aux_pred_logits"].shape == (1, B, NQ, 2)  # dec_layers(2) - 1
    assert out["recfw_words_logit"].shape == (B, Lw, 50)
    assert out["expanded_words_feat"].shape == (B, Lw + 1, 32)
    assert out["recon_feat"].shape == (B, 32)
    assert np.all(np.isfinite(np.asarray(out["pred_spans"])))
    spans = np.asarray(out["pred_spans"])
    assert (spans >= 0).all() and (spans <= 1).all(), "sigmoid-bounded spans"


def test_mask_words_count(full_run):
    batch, model, variables, out = full_run
    chosen = np.asarray(out["masked_words_loc"])
    lengths = batch["words_mask"].sum(1)
    for i in range(B):
        expect = max(int(lengths[i]) // 3, 1) if lengths[i] > 1 else 0
        assert chosen[i].sum() == expect
        # only valid, positive-weight positions masked
        assert not np.any(chosen[i] & ~batch["words_mask"][i])


def test_padding_invariance():
    """Extending video padding must not change predictions (mask correctness)."""
    batch = make_batch(np.random.default_rng(0), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg()
    model, variables, out = init_and_apply(cfg, batch, is_training=False)

    pad = 8
    batch2 = dict(batch)
    batch2["video_feat"] = np.concatenate(
        [batch["video_feat"], np.full((B, pad, Dv), 7.7, np.float32)], axis=1
    )
    batch2["video_mask"] = np.concatenate(
        [batch["video_mask"], np.zeros((B, pad), bool)], axis=1
    )
    batch2["clip_mask"] = np.concatenate(
        [batch["clip_mask"], np.zeros((B, pad), bool)], axis=1
    )
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    out2 = model.apply(
        variables,
        jnp.asarray(batch2["video_feat"]),
        jnp.asarray(batch2["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
        is_training=False,
        deterministic=True,
        clip_mask=jnp.asarray(batch2["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_spans"]), np.asarray(out2["pred_spans"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["saliency_scores"]),
        np.asarray(out2["saliency_scores"])[:, :Lv],
        atol=2e-5,
    )


def test_eval_mode_skips_mlm(full_run):
    batch, model, variables, _ = full_run
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    out = model.apply(
        variables,
        jnp.asarray(batch["video_feat"]),
        jnp.asarray(batch["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
        is_training=False,
        deterministic=True,
        clip_mask=jnp.asarray(batch["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    assert "recfw_words_logit" not in out


def test_stacked_neg_pass_matches_single():
    """The negative pass is stacked into the batch dim; positive predictions
    must be bit-comparable to the inference path that skips negatives."""
    batch = make_batch(np.random.default_rng(5), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg()
    model, variables, out_with_neg = init_and_apply(cfg, batch, is_training=False)
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    out_no_neg = model.apply(
        variables,
        jnp.asarray(batch["video_feat"]),
        jnp.asarray(batch["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
        is_training=False,
        deterministic=True,
        compute_neg=False,
        clip_mask=jnp.asarray(batch["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    np.testing.assert_allclose(
        np.asarray(out_with_neg["pred_spans"]), np.asarray(out_no_neg["pred_spans"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_with_neg["saliency_scores"]),
        np.asarray(out_no_neg["saliency_scores"]),
        atol=1e-5,
    )
    assert "neg_saliency_scores" in out_with_neg and "neg_saliency_scores" not in out_no_neg


def test_no_rec_variants():
    batch = make_batch(np.random.default_rng(2), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg(rec_fw=False, rec_ss=False)
    _, _, out = init_and_apply(cfg, batch)
    assert "recon_feat" not in out and "recfw_words_logit" not in out
    assert out["pred_spans"].shape == (B, NQ, 2)


def test_two_mlp_variant():
    batch = make_batch(np.random.default_rng(3), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg(share_mlp=False)
    _, variables, out = init_and_apply(cfg, batch)
    # TwoMLP creates separate MLM FFN params in enhance layers
    p = variables["params"]["enhance_encoder"]["layer0"]
    assert "ffn_mlm" in p and "ffn" in p
    assert np.all(np.isfinite(np.asarray(out["recfw_words_logit"])))

"""Criterion tests: closed-form numpy oracles for each loss + end-to-end
finiteness/grad checks (reference semantics: model/criterion.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from mesm_tpu.losses import CriterionConfig, compute_losses
from mesm_tpu.ops.span import np_temporal_iou_cross

from synth import make_batch


def np_giou(a, b):
    iou, union = np_temporal_iou_cross(a, b)
    left = np.minimum(a[:, None, 0], b[None, :, 0])
    right = np.maximum(a[:, None, 1], b[None, :, 1])
    enc = np.clip(right - left, 0, None)
    return iou - (enc - union) / enc


def test_label_loss_matches_torch_semantics():
    """Weighted CE divides by element count (torch reduction='none' -> .mean())."""
    from mesm_tpu.losses.criterion import _label_loss

    B, nq = 3, 4
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, nq, 2)).astype(np.float32)
    src_idx = np.array([0, 2, 3])
    eos = 0.1
    rm = jnp.ones((B,), jnp.float32)
    loss, class_err = _label_loss(jnp.asarray(logits), jnp.asarray(src_idx), None, eos, rm)

    # numpy oracle
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    total = 0.0
    for b in range(B):
        for q in range(nq):
            tgt = 0 if q == src_idx[b] else 1
            w = 1.0 if tgt == 0 else eos
            total += -logp[b, q, tgt] * w
    np.testing.assert_allclose(float(loss), total / (B * nq), rtol=1e-5)

    matched_correct = sum(
        logits[b, src_idx[b]].argmax() == 0 for b in range(B)
    )
    np.testing.assert_allclose(
        float(class_err), 100.0 * (1 - matched_correct / B), rtol=1e-5
    )


def test_rec_fw_label_smoothing_oracle():
    from mesm_tpu.losses.criterion import _rec_fw_loss

    rng = np.random.default_rng(1)
    B, L, C = 2, 5, 7
    logit = rng.normal(size=(B, L, C)).astype(np.float32)
    label = rng.integers(0, C, (B, L)).astype(np.int32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.float32)
    outputs = {"recfw_words_logit": jnp.asarray(logit), "words_mask": jnp.asarray(mask)}
    loss, acc = _rec_fw_loss(
        outputs, {"words_label": jnp.asarray(label)}, jnp.ones((B,), jnp.float32)
    )

    logp = logit - np.log(np.exp(logit).sum(-1, keepdims=True))
    eps = 0.1
    rows = []
    for b in range(B):
        vals = []
        for l in range(L):
            nll = -logp[b, l, label[b, l]]
            smooth = -logp[b, l].sum()
            vals.append(((1 - eps) * nll + eps / C * smooth) * mask[b, l])
        rows.append(np.sum(vals) / mask[b].sum())
    np.testing.assert_allclose(float(loss), np.mean(rows), rtol=1e-5)
    expect_acc = ((logit.argmax(-1) == label) * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(acc), expect_acc, rtol=1e-5)


def test_saliency_neg_pair_is_softplus():
    """-log(1-sigmoid(x)) == softplus(x); verify the masked-sum-mean shape."""
    from mesm_tpu.losses.criterion import _saliency_loss

    B, L = 2, 4
    rng = np.random.default_rng(2)
    s = rng.normal(size=(B, L)).astype(np.float32)
    ns = rng.normal(size=(B, L)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0], [1, 1, 1, 1]], bool)
    clip = np.array([[1, 0, 0, 0], [0, 1, 1, 0]], bool)
    outputs = {"saliency_scores": jnp.asarray(s), "neg_saliency_scores": jnp.asarray(ns)}
    batch = {"video_mask": jnp.asarray(mask), "clip_mask": jnp.asarray(clip)}
    cfg = CriterionConfig(use_triplet=False, rank_coef=12.0)
    loss = float(_saliency_loss(outputs, batch, cfg, jnp.ones((B,), jnp.float32)))

    # numpy oracle
    neg_pair = (np.logaddexp(0, ns) * mask).sum(1).mean()
    s2 = np.concatenate([s, ns], 1)
    lab2 = np.concatenate([clip.astype(np.float32), np.zeros_like(clip, np.float32)], 1)
    m2 = np.concatenate([mask, mask], 1).astype(np.float32)
    s2 = m2 * s2 + (1 - m2) * -1e3
    rank_total = 0.0
    for thd in range(1, 12):
        pos = (lab2 >= thd).astype(np.float32)
        if pos.sum() == 0:
            continue
        row_has = (pos.sum(1) > 0).astype(np.float32)
        logits = s2 / 0.5
        logits = logits - logits.max(1, keepdims=True)
        log_prob = logits - np.log(np.exp(logits).sum(1, keepdims=True) + 1e-6)
        mlpp = (pos * log_prob * m2).sum(1) / (pos.sum(1) + 1e-6)
        rank_total += (-mlpp * row_has).mean()
    expect = rank_total / 12.0 + neg_pair
    np.testing.assert_allclose(loss, expect, rtol=1e-4)


def test_full_criterion_single_and_grads():
    batch = make_batch(np.random.default_rng(3), B=6, Lv=16, Dv=8, Lw=8, Dt=8, G=3)
    B, nq = 6, 5
    rng = np.random.default_rng(4)

    def fabricate_outputs(key):
        k = jax.random.split(key, 8)
        return {
            "pred_logits": jax.random.normal(k[0], (B, nq, 2)),
            "pred_spans": jax.nn.sigmoid(jax.random.normal(k[1], (B, nq, 2))),
            "saliency_scores": jax.random.normal(k[2], (B, 16)),
            "neg_saliency_scores": jax.random.normal(k[3], (B, 16)),
            "aux_pred_logits": jax.random.normal(k[4], (1, B, nq, 2)),
            "aux_pred_spans": jax.nn.sigmoid(jax.random.normal(k[5], (1, B, nq, 2))),
            "projed_video_feat": jax.random.normal(k[6], (B, 16, 12)),
            "expanded_words_feat": jax.random.normal(k[7], (B, 9, 12)),
            "expanded_words_mask": jnp.ones((B, 9), bool),
            "recfw_words_logit": jax.random.normal(k[0], (B, 8, 50)),
            "words_mask": jnp.asarray(batch["words_mask"]),
        }

    cfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1, use_triplet=True)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    outputs = fabricate_outputs(jax.random.PRNGKey(0))
    losses, total = jax.jit(
        lambda o, b: compute_losses(o, b, cfg, is_training=True)
    )(outputs, jb)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert np.isfinite(float(total))
    expected = {
        "loss_span", "loss_giou", "loss_label", "class_error", "loss_saliency",
        "loss_rec_ss", "loss_rec_fw", "rec_fw_acc",
        "loss_span_0", "loss_giou_0", "loss_label_0", "class_error_0",
    }
    assert expected <= set(losses.keys())

    # gradients flow and are finite
    def loss_fn(p):
        o = fabricate_outputs(jax.random.PRNGKey(0))
        o = {k: (v + p if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v) for k, v in o.items()}
        return compute_losses(o, jb, cfg, is_training=True)[1]

    g = jax.grad(loss_fn)(jnp.float32(0.0))
    assert np.isfinite(float(g))


def test_full_criterion_multi_clip():
    batch = make_batch(np.random.default_rng(5), B=6, Lv=16, Dv=8, Lw=8, Dt=8, G=3, T=4)
    B, nq = 6, 5
    k = jax.random.split(jax.random.PRNGKey(7), 6)
    outputs = {
        "pred_logits": jax.random.normal(k[0], (B, nq, 2)),
        "pred_spans": jax.nn.sigmoid(jax.random.normal(k[1], (B, nq, 2))),
        "saliency_scores": jax.random.normal(k[2], (B, 16)),
        "neg_saliency_scores": jax.random.normal(k[3], (B, 16)),
        "projed_video_feat": jax.random.normal(k[4], (B, 16, 12)),
        "expanded_words_feat": jax.random.normal(k[5], (B, 9, 12)),
        "expanded_words_mask": jnp.ones((B, 9), bool),
    }
    cfg = CriterionConfig(
        multi_clip=True, use_triplet=True, recss_coef=0.1, rec_fw=False, aux_loss=False
    )
    jb = {k2: jnp.asarray(v) for k2, v in batch.items()}
    losses, total = jax.jit(
        lambda o, b: compute_losses(o, b, cfg, is_training=True)
    )(outputs, jb)
    for k2, v in losses.items():
        assert np.isfinite(float(v)), f"{k2} not finite"
    assert np.isfinite(float(total))

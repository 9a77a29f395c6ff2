"""Full-model parity against the ACTUAL reference implementation.

These tests sys.path-import the reference PyTorch code from /root/reference
(model/{model,transformer,matcher,criterion}.py), build the reference MESM at
a small config, convert its weights with mesm_tpu.convert, run both models on
the same synthetic batch, and assert:

  * forward outputs (pred_spans / pred_logits / saliency / neg saliency /
    aux layers / rec_ss tensors / recfw MLM logits) match <= 1e-4
  * EVERY criterion term (span/giou/label/class_error, saliency, rec_ss,
    rec_fw + acc, aux _i terms, weighted total) matches <= 1e-4

across three config families:
  1. charades C+SF-like: rec_fw + rec_ss, shared-MLP enhance, single-clip
  2. TACoS-like:         TwoMLP enhance (share_MLP=False), triplet saliency
  3. QVHighlights-like:  multi-clip matcher, saliency labels, triplet

Randomness inside the reference forward is pinned by monkeypatching:
  - model.model.sample_outclass_neg  -> fixed out-of-group permutation
    (ours takes the same permutation as the explicit `neg_idx_rows` input)
  - MESM._mask_words on BOTH sides   -> mask the first max(l//3,1) valid
    positions (same positions, so MLM logits must agree)

Reference anchor points: model/model.py:154-359 (forward),
model/criterion.py:319-367 (loss forward), model/matcher.py:39-117.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# reference import + construction
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import model.model as ref_model  # noqa: F401  (package 'model' from /root/reference)
    import model.matcher as ref_matcher
    import model.criterion as ref_criterion
    import model.transformer as ref_transformer
    import model.position_encoding as ref_position

    return types.SimpleNamespace(
        model=ref_model,
        matcher=ref_matcher,
        criterion=ref_criterion,
        transformer=ref_transformer,
        position=ref_position,
    )


def build_ref_model(ref, a):
    """Mirror of reference runner.build_model (runner.py:255-298) minus the
    dataset-package import chain (ftfy/nltk not installed here); text encoder
    is None (GloVeNLTK + load_vocab_pkl -> precomputed features path)."""
    mk_t2v = lambda n_layers, cls: cls(
        d_model=a.hidden_dim, dropout=a.dropout, nhead=a.nheads,
        dim_feedforward=a.dim_feedforward, num_encoder_layers=n_layers,
        normalize_before=a.pre_norm, activation="prelu",
    )
    enhance_cls = (
        ref.transformer.T2VEncoder if a.share_MLP else ref.transformer.T2VEncoder_TwoMLP
    )
    transformer = ref.transformer.Transformer(
        d_model=a.hidden_dim, dropout=a.dropout, nhead=a.nheads,
        dim_feedforward=a.dim_feedforward, num_encoder_layers=a.enc_layers,
        num_decoder_layers=a.dec_layers, normalize_before=a.pre_norm,
        return_intermediate_dec=True, activation="prelu",
    )
    vid_pos = ref.position.PositionEmbeddingSine(a.hidden_dim, normalize=True)
    txt_pos = ref.position.TrainablePositionalEncoding(
        max_position_embeddings=a.max_words_l + 1 if a.rec_ss else a.max_words_l,
        hidden_size=a.hidden_dim, dropout=a.input_dropout,
    )
    return ref.model.MESM(
        text_encoder=None,
        t2v_encoder=mk_t2v(a.t2v_layers, ref.transformer.T2VEncoder),
        enhance_encoder=mk_t2v(a.num_recfw_layers, enhance_cls),
        transformer=transformer,
        vid_position_embed=vid_pos,
        txt_position_embed=txt_pos,
        txt_dim=a.t_feat_dim,
        vid_dim=a.v_feat_dim,
        num_queries=a.num_queries,
        input_dropout=a.input_dropout,
        aux_loss=a.aux_loss,
        max_video_l=a.max_video_l,
        max_words_l=a.max_words_l,
        normalize_txt=a.normalize_txt,
        use_txt_pos=a.use_txt_pos,
        span_loss_type=a.span_loss_type,
        n_input_proj=a.n_input_proj,
        rec_fw=a.rec_fw,
        vocab_size=a.vocab_size,
        rec_ss=a.rec_ss,
        num_recss_layers=a.num_recss_layers,
    )


def build_ref_criterion(ref, a):
    """Mirror of reference runner.build_criterion (runner.py:309-345)."""
    matcher = ref.matcher.HungarianMatcher(
        cost_span=a.set_cost_span, cost_giou=a.set_cost_giou,
        cost_class=a.set_cost_class, span_loss_type=a.span_loss_type,
        max_v_l=a.max_video_l, multi_clip=a.dataset_name in ["qvhighlights"],
    )
    losses = ["span", "label", "saliency"]
    weight_dict = {
        "loss_span": a.loss_span_coef,
        "loss_giou": a.loss_giou_coef,
        "loss_label": a.loss_label_coef,
        "loss_saliency": a.loss_saliency_coef,
    }
    if a.aux_loss:
        aux = {}
        for i in range(a.dec_layers - 1):
            aux.update({k + f"_{i}": v for k, v in weight_dict.items() if k != "loss_saliency"})
        weight_dict.update(aux)
    if a.rec_fw:
        losses.append("rec_fw")
        weight_dict["loss_rec_fw"] = a.loss_recfw_coef
    if a.rec_ss:
        losses.append("rec_ss")
        weight_dict["loss_rec_ss"] = a.loss_recss_coef
    return ref.criterion.Criterion(
        matcher=matcher, weight_dict=weight_dict, losses=losses,
        eos_coef=a.eos_coef, span_loss_type=a.span_loss_type,
        max_video_l=a.max_video_l, rank_coef=a.rank_coef,
        use_triplet=a.use_triplet, saliency_margin=a.saliency_margin,
        multi_clip=a.dataset_name in ["qvhighlights"],
        gamma=a.iou_gamma, recss_tau=a.recss_tau,
    )


def make_opt(**over):
    """One opt namespace driving BOTH the reference builders and ours."""
    base = dict(
        # dims (small; structure identical to the real configs)
        hidden_dim=32,
        v_feat_dim=16,
        t_feat_dim=20,
        nheads=4,
        dim_feedforward=48,
        num_recfw_layers=2,
        t2v_layers=2,
        enc_layers=2,
        dec_layers=2,
        num_recss_layers=2,
        num_queries=5,
        dropout=0.1,
        input_dropout=0.5,
        n_input_proj=2,
        use_txt_pos=False,
        max_words_l=12,
        max_video_l=24,
        rec_fw=True,
        rec_ss=True,
        share_MLP=True,
        aux_loss=True,
        vocab_size=50,
        tokenizer_type="GloVeNLTK",
        load_vocab_pkl=True,  # -> reference text_encoder=None (precomputed feats)
        normalize_txt=True,
        span_loss_type="l1",
        pre_norm=False,
        position_embedding="sine",
        device="cpu",
        dataset_name="charades",
        # criterion
        set_cost_span=10.0,
        set_cost_giou=1.0,
        set_cost_class=4.0,
        loss_span_coef=10.0,
        loss_giou_coef=1.0,
        loss_label_coef=4.0,
        loss_saliency_coef=4.0,
        loss_recfw_coef=0.1,
        loss_recss_coef=0.1,
        eos_coef=0.1,
        rank_coef=12.0,
        use_triplet=False,
        saliency_margin=0.2,
        iou_gamma=0.9,
        recss_tau=0.5,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def det_mask_words_torch(self, src_txt, src_txt_mask, masked_token, proj=True, weight=None):
    """Reference MESM._mask_words with np.random.choice pinned to the first
    max(l//3, 1) valid positions (model/model.py:361-384 minus the RNG)."""
    masked_token = masked_token.unsqueeze(0).unsqueeze(0)
    if proj:
        masked_token = self.input_txt_proj(masked_token)
    words_length = src_txt_mask.count_nonzero(dim=1)
    masked_words = torch.zeros_like(src_txt_mask)
    for i, l in enumerate(words_length):
        l = int(l)
        if l <= 1:
            continue
        masked_words[i, : max(l // 3, 1)] = 1
    masked_words_vec = src_txt.new_zeros(*src_txt.size()) + masked_token
    masked_words_vec.masked_fill_(masked_words.unsqueeze(-1) == 0, 0)
    masked_src_txt = src_txt.masked_fill(masked_words.unsqueeze(-1) == 1, 0) + masked_words_vec
    return masked_src_txt, masked_words


def det_mask_words_jax(self, projed_words, words_mask, words_weight, deterministic):
    """Our MESM._mask_words pinned to the same first-k positions."""
    import jax.numpy as jnp

    masked_token = self.input_txt_proj(
        self.masked_token[None, None, :].astype(projed_words.dtype),
        deterministic=deterministic,
    )
    lengths = words_mask.sum(axis=1)
    num_masked = jnp.maximum(lengths // 3, 1)
    idx = jnp.arange(words_mask.shape[1])[None]
    chosen = (idx < num_masked[:, None]) & (lengths[:, None] > 1) & words_mask.astype(bool)
    out = jnp.where(chosen[..., None], masked_token, projed_words)
    return out, chosen


# ---------------------------------------------------------------------------
# batch fabrication (numpy ground truth shared by both sides)
# ---------------------------------------------------------------------------


def fabricate(rng, opt, B=6, n_groups=3, T=0):
    Lv, Dv, Lw, Dt = opt.max_video_l, opt.v_feat_dim, opt.max_words_l, opt.t_feat_dim
    group_sizes = rng.multinomial(B - n_groups, [1 / n_groups] * n_groups) + 1
    group_id = np.repeat(np.arange(n_groups), group_sizes).astype(np.int32)

    vid_len = rng.integers(Lv // 2, Lv + 1, B)
    video_mask = np.arange(Lv)[None] < vid_len[:, None]
    video_feat = rng.normal(size=(B, Lv, Dv)).astype(np.float32) * video_mask[..., None]
    # rows of the same group share one video (reference collate replicates it)
    for g in range(n_groups):
        rows = np.where(group_id == g)[0]
        video_feat[rows] = video_feat[rows[0]]
        video_mask[rows] = video_mask[rows[0]]
        vid_len[rows] = vid_len[rows[0]]

    w_len = rng.integers(3, Lw + 1, B)
    words_mask = np.arange(Lw)[None] < w_len[:, None]
    raw_words = rng.normal(size=(B, Lw, Dt)).astype(np.float32) * words_mask[..., None]
    words_weight = (rng.integers(1, 3, (B, Lw)) * words_mask).astype(np.float32)
    unknown_mask = (rng.random((B, Lw)) < 0.15) & words_mask
    words_label = (rng.integers(0, opt.vocab_size + 1, (B, Lw)) * words_mask).astype(np.int64)

    st = rng.integers(0, np.maximum(vid_len // 2, 1))
    ed = np.minimum(st + rng.integers(1, np.maximum(vid_len // 2, 2)), vid_len - 1)
    clip_mask = (np.arange(Lv)[None] >= st[:, None]) & (np.arange(Lv)[None] <= ed[:, None])
    clip_mask &= video_mask
    norm_moment = np.stack([st / vid_len, (ed + 1) / vid_len], -1).astype(np.float32)
    norm_span = np.stack(
        [norm_moment.mean(-1), norm_moment[:, 1] - norm_moment[:, 0]], -1
    ).astype(np.float32)

    pos_idx = np.stack([st, ed], -1).astype(np.int64)
    neg_idx = np.stack([np.maximum(st - 1, 0), np.zeros_like(st)], -1).astype(np.int64)

    num_clips = group_sizes.astype(np.int64)

    # ss gather structures (ours): all rows of my group, padded with self
    G = int(group_sizes.max())
    ss_sent_idx = np.zeros((B, G), np.int32)
    ss_sent_mask = np.zeros((B, G), bool)
    ss_own_pos = np.zeros((B,), np.int32)
    for i in range(B):
        rows = np.where(group_id == group_id[i])[0]
        ss_sent_idx[i, : len(rows)] = rows
        ss_sent_idx[i, len(rows):] = i
        ss_sent_mask[i, : len(rows)] = True
        ss_own_pos[i] = int(np.where(rows == i)[0][0])

    # fixed out-of-group negative permutation
    neg_rows = np.zeros(B, np.int32)
    for i in range(B):
        cand = np.where(group_id != group_id[i])[0]
        neg_rows[i] = cand[i % len(cand)]

    out = dict(
        video_feat=video_feat, video_mask=video_mask, raw_words=raw_words,
        words_mask=words_mask, words_weight=words_weight, unknown_mask=unknown_mask,
        words_label=words_label, clip_mask=clip_mask, group_id=group_id,
        norm_moment=norm_moment, norm_span=norm_span, pos_idx=pos_idx,
        neg_idx=neg_idx, num_clips=num_clips, ss_sent_idx=ss_sent_idx,
        ss_sent_mask=ss_sent_mask, ss_own_pos=ss_own_pos, neg_rows=neg_rows,
        vid_len=vid_len,
    )

    if T > 0:  # qvh-style multi-window targets + per-clip saliency labels
        n_tgt = rng.integers(1, T + 1, B)
        tgt_mask = np.arange(T)[None] < n_tgt[:, None]
        ctr = rng.uniform(0.2, 0.8, (B, T)).astype(np.float32)
        wid = rng.uniform(0.05, 0.3, (B, T)).astype(np.float32)
        out["m_span"] = np.stack([ctr, wid], -1).astype(np.float32)
        out["m_moment"] = np.stack([ctr - wid / 2, ctr + wid / 2], -1).astype(np.float32)
        out["tgt_mask"] = tgt_mask
        out["saliency_label"] = (
            clip_mask * rng.integers(0, 13, (B, Lv))
        ).astype(np.float32)
        # qvh group video: concat valid frames of every row in the group
        flat = [video_feat[r][video_mask[r]] for r in range(B)]
        group_video = {}
        for g in np.unique(group_id):
            rows = np.where(group_id == g)[0]
            group_video[g] = np.concatenate([flat[r] for r in rows], axis=0)
        Lss = max(v.shape[0] for v in group_video.values())
        ss_video_feat = np.zeros((B, Lss, video_feat.shape[-1]), np.float32)
        ss_video_mask = np.zeros((B, Lss), bool)
        for i in range(B):
            v = group_video[group_id[i]]
            ss_video_feat[i, : v.shape[0]] = v
            ss_video_mask[i, : v.shape[0]] = True
        out["ss_video_feat"] = ss_video_feat
        out["ss_video_mask"] = ss_video_mask
    return out


# ---------------------------------------------------------------------------
# both-sides runners
# ---------------------------------------------------------------------------


def run_reference(ref, opt, data, monkeypatch, multi_clip=False):
    torch.manual_seed(3)
    model = build_ref_model(ref, opt)
    model.eval()
    criterion = build_ref_criterion(ref, opt)
    criterion.eval()

    t = lambda x: torch.from_numpy(np.asarray(x))
    monkeypatch.setattr(
        ref.model, "sample_outclass_neg", lambda num_clips: t(data["neg_rows"]).long()
    )
    monkeypatch.setattr(type(model), "_mask_words", det_mask_words_torch)

    kwargs = dict(
        dataset_name=opt.dataset_name,
        is_training=True,
        unknown_mask=t(data["unknown_mask"]),
        clip_mask=t(data["clip_mask"]),
    )
    with torch.no_grad():
        outputs = model(
            t(data["raw_words"]) if False else t(data["video_feat"]),
            t(data["video_mask"]),
            t(data["raw_words"]),  # words_id IS the precomputed features (None path)
            t(data["words_mask"]),
            t(data["words_weight"]),
            t(data["num_clips"]),
            **kwargs,
        )
        targets = {
            "video_mask": t(data["video_mask"]),
            "clip_mask": t(data["clip_mask"]).float(),
            "num_clips": t(data["num_clips"]),
            "words_label": t(data["words_label"]),
            "pos_idx": t(data["pos_idx"]),
            "neg_idx": t(data["neg_idx"]),
        }
        if multi_clip:
            targets["norm_span"] = [
                {"spans": t(data["m_span"][i][data["tgt_mask"][i]])} for i in range(len(data["m_span"]))
            ]
            targets["norm_moment"] = [
                {"moments": t(data["m_moment"][i][data["tgt_mask"][i]])}
                for i in range(len(data["m_moment"]))
            ]
            targets["saliency_label"] = t(data["saliency_label"])
        else:
            targets["norm_span"] = t(data["norm_span"])
            targets["norm_moment"] = t(data["norm_moment"])
        losses, total = criterion(outputs, targets, is_training=True)
    return model, outputs, {k: float(v) for k, v in losses.items()}, float(total)


def run_ours(opt, torch_model, data, monkeypatch, multi_clip=False):
    import jax.numpy as jnp

    from mesm_tpu import convert
    from mesm_tpu.losses import compute_losses
    from mesm_tpu.models import MESM
    from mesm_tpu.models.mesm import MESM as OurMESM
    from mesm_tpu.models.text_encoder import post_process_precomputed_text
    from mesm_tpu.runner import build_criterion_config, build_model_config

    cfg = build_model_config(opt)
    state_dict = {k: v for k, v in torch_model.state_dict().items()}
    params = convert.torch_state_dict_to_params(state_dict, cfg)

    monkeypatch.setattr(OurMESM, "_mask_words", det_mask_words_jax)

    wf, wm, sf = post_process_precomputed_text(jnp.asarray(data["raw_words"]))
    model = MESM(cfg)
    kwargs = dict(
        is_training=True,
        deterministic=True,
        clip_mask=jnp.asarray(data["clip_mask"]),
        words_weight=jnp.asarray(data["words_weight"]),
        unknown_mask=jnp.asarray(data["unknown_mask"]),
        ss_sent_idx=jnp.asarray(data["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(data["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(data["ss_own_pos"]),
    )
    if "ss_video_feat" in data:
        kwargs["ss_video_feat"] = jnp.asarray(data["ss_video_feat"])
        kwargs["ss_video_mask"] = jnp.asarray(data["ss_video_mask"])
    outputs = model.apply(
        {"params": params},
        jnp.asarray(data["video_feat"]),
        jnp.asarray(data["video_mask"]),
        wf,
        wm,
        sf,
        jnp.asarray(data["neg_rows"]),
        **kwargs,
    )

    batch = dict(
        video_mask=jnp.asarray(data["video_mask"]),
        clip_mask=jnp.asarray(data["clip_mask"]),
        group_id=jnp.asarray(data["group_id"]),
        words_label=jnp.asarray(data["words_label"].astype(np.int32)),
        pos_idx=jnp.asarray(data["pos_idx"].astype(np.int32)),
        neg_idx=jnp.asarray(data["neg_idx"].astype(np.int32)),
    )
    if multi_clip:
        batch["norm_span"] = jnp.asarray(data["m_span"])
        batch["norm_moment"] = jnp.asarray(data["m_moment"])
        batch["tgt_mask"] = jnp.asarray(data["tgt_mask"])
        batch["saliency_label"] = jnp.asarray(data["saliency_label"])
    else:
        batch["norm_span"] = jnp.asarray(data["norm_span"])
        batch["norm_moment"] = jnp.asarray(data["norm_moment"])

    losses, total = compute_losses(outputs, batch, build_criterion_config(opt), is_training=True)
    return outputs, {k: float(v) for k, v in losses.items()}, float(total)


def assert_forward_match(ref_out, our_out, atol=1e-4):
    pairs = [
        ("pred_logits", np.asarray(our_out["pred_logits"])),
        ("pred_spans", np.asarray(our_out["pred_spans"])),
        ("saliency_scores", np.asarray(our_out["saliency_scores"])),
        ("neg_saliency_scores", np.asarray(our_out["neg_saliency_scores"])),
    ]
    for key, ours in pairs:
        refv = ref_out[key].numpy()
        np.testing.assert_allclose(ours, refv, atol=atol, rtol=0, err_msg=key)
    # aux layers
    for i, aux in enumerate(ref_out.get("aux_outputs", [])):
        np.testing.assert_allclose(
            np.asarray(our_out["aux_pred_logits"][i]), aux["pred_logits"].numpy(),
            atol=atol, rtol=0, err_msg=f"aux_pred_logits[{i}]",
        )
        np.testing.assert_allclose(
            np.asarray(our_out["aux_pred_spans"][i]), aux["pred_spans"].numpy(),
            atol=atol, rtol=0, err_msg=f"aux_pred_spans[{i}]",
        )
    # rec_ss tensors
    for key in ("projed_video_feat", "recon_feat", "projed_recon_feat",
                "expanded_words_feat", "enhanced_video_feat", "projed_words_feat"):
        if key in ref_out:
            np.testing.assert_allclose(
                np.asarray(our_out[key]), ref_out[key].numpy(), atol=atol, rtol=0,
                err_msg=key,
            )
    if "recfw_words_logit" in ref_out:
        np.testing.assert_allclose(
            np.asarray(our_out["recfw_words_logit"]),
            ref_out["recfw_words_logit"].numpy(), atol=atol, rtol=0,
            err_msg="recfw_words_logit",
        )


def assert_losses_match(ref_losses, ref_total, our_losses, our_total, atol=1e-4):
    for k, v in ref_losses.items():
        assert k in our_losses, f"missing loss term {k} (ours has {sorted(our_losses)})"
        assert abs(our_losses[k] - v) <= atol * max(1.0, abs(v)), (
            f"{k}: ref {v} vs ours {our_losses[k]}"
        )
    assert abs(our_total - ref_total) <= atol * max(1.0, abs(ref_total)), (
        f"total: ref {ref_total} vs ours {our_total}"
    )


# ---------------------------------------------------------------------------
# the three config families
# ---------------------------------------------------------------------------


def _run_family(ref, opt, monkeypatch, seed, multi_clip=False, T=0, n_groups=3):
    rng = np.random.default_rng(seed)
    data = fabricate(rng, opt, B=6, n_groups=n_groups, T=T)
    t_model, ref_out, ref_losses, ref_total = run_reference(
        ref, opt, data, monkeypatch, multi_clip=multi_clip
    )
    our_out, our_losses, our_total = run_ours(
        opt, t_model, data, monkeypatch, multi_clip=multi_clip
    )
    assert_forward_match(ref_out, our_out)
    assert_losses_match(ref_losses, ref_total, our_losses, our_total)


def test_charades_family(ref, monkeypatch):
    """charades C+SF structure: rec_fw + rec_ss, shared MLP, single-clip."""
    opt = make_opt()
    _run_family(ref, opt, monkeypatch, seed=11)


def test_tacos_family(ref, monkeypatch):
    """TACoS structure: TwoMLP enhance (share_MLP=False) + triplet saliency."""
    opt = make_opt(share_MLP=False, use_triplet=True, dataset_name="tacos")
    _run_family(ref, opt, monkeypatch, seed=22)


def test_qvhighlights_family(ref, monkeypatch):
    """QVHighlights structure: multi-clip matcher, saliency labels, triplet."""
    opt = make_opt(use_triplet=True, dataset_name="qvhighlights")
    _run_family(ref, opt, monkeypatch, seed=33, multi_clip=True, T=3)

"""MESM top-level model: modal-enhanced moment retrieval, TPU-native.

Parity target: reference model/model.py (MESM :16-394, SegSenRecon :437-503).
Major behavioral pieces and where their reference lives:
  - input projections / heads / saliency scoring: model.py:46-70,246-252,301-302
  - FW-MESM enhance pass (text -> video cross attention): model.py:175-182
  - SS-MESM sentence reconstruction + recon-token prepend: model.py:184-219
  - aligner (t2v) + DETR transformer with global token: model.py:230-244
  - negative pass with out-of-group text: model.py:260-299
  - MLM path (_replace_unknown / _mask_words / reversed enhance): model.py:307-332,361-394

TPU-first redesign decisions (vs the reference's ragged host-side ops):
  - All shapes static. Ragged "gather my group's sentences" becomes
    host-precomputed index/mask arrays (`ss_sent_idx`, `ss_sent_mask`,
    `ss_own_pos`) consumed by plain gathers.
  - `split_and_pad(clip_mask...)` (reference model.py:310-325) becomes a
    stable argsort that compacts each row's GT-clip frames to the front at
    fixed capacity Lv.
  - Host numpy RNG inside forward (word masking, model.py:375-377) becomes a
    weighted Gumbel top-k draw from an explicit `mask_words` RNG stream —
    statistically identical to numpy's weighted sampling w/o replacement.
  - The negative permutation (sample_outclass_neg) is computed in the train
    step from group ids and passed in as `neg_idx_rows`.
  - Text encoders are frozen and live OUTSIDE this module (see
    models/text_encoder.py); the module consumes encoded text features.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import l2_normalize, lengths_to_mask
from .detr import Transformer, inverse_sigmoid
from .layers import MLP, Dense, InputProj, LinearBlock
from .position import SinePositionEmbedding, TrainablePositionEmbedding
from .t2v import T2VEncoder, scrambled_pair_factors


@dataclass(frozen=True)
class MESMConfig:
    # dims
    hidden_dim: int = 256
    v_feat_dim: int = 2818  # includes +2 TEF when use_tef
    t_feat_dim: int = 512
    nheads: int = 8
    dim_feedforward: int = 1024
    # depths
    num_recfw_layers: int = 2
    t2v_layers: int = 2
    enc_layers: int = 2
    dec_layers: int = 2
    num_recss_layers: int = 4
    # behavior
    num_queries: int = 10
    dropout: float = 0.1
    input_dropout: float = 0.5
    n_input_proj: int = 2
    use_txt_pos: bool = False
    max_words_l: int = 32
    max_video_l: int = 75
    rec_fw: bool = True
    rec_ss: bool = True
    share_mlp: bool = True  # False -> TwoMLP enhance encoder (is_MLM routing)
    aux_loss: bool = True
    num_classes: int = 1114  # MLM head classes (vocab_size + 3 for CLIP, +1 GloVe)
    activation: str = "prelu"
    # fold homogeneous layer stacks (t2v/enhance/recss/encoder) into nn.scan
    # bodies with stacked params — same math, smaller traced graph (compile
    # time); convert.py stacks/unstacks checkpoints between the layouts
    scan_layers: bool = False
    dtype: Any = jnp.float32


class SegSenRecon(nn.Module):
    """SS-MESM: mask each sample's own sentence within its video group and
    reconstruct it from the group's video via a T2V stack (video as k/v).

    Parity: reference model/model.py:437-503. The inner stack keeps torch
    Linear default init (the reference never xavier-resets it)."""

    cfg: MESMConfig

    def setup(self):
        c = self.cfg
        self.masked_sent_token = self.param(
            "masked_sent_token", nn.initializers.zeros, (c.hidden_dim,), jnp.float32
        )
        self.recon_trans = T2VEncoder(
            c.hidden_dim,
            c.nheads,
            c.num_recss_layers,
            c.dim_feedforward,
            c.dropout,
            c.activation,
            two_mlp=False,
            xavier_init=False,
            scan=c.scan_layers,
            dtype=c.dtype,
            name="recon_trans",
        )
        self.output_sent_proj = [
            LinearBlock(c.hidden_dim, dropout=c.input_dropout, relu=True, dtype=c.dtype, name="out_proj0"),
            LinearBlock(c.hidden_dim, dropout=c.input_dropout, relu=False, dtype=c.dtype, name="out_proj1"),
        ]

    def __call__(
        self,
        batched_vid: jnp.ndarray,  # (B, Lss, d) projected group video
        batched_vid_mask: jnp.ndarray,  # (B, Lss)
        batched_sent: jnp.ndarray,  # (B, G, d) projected group sentences
        batched_sent_mask: jnp.ndarray,  # (B, G)
        own_pos: jnp.ndarray,  # (B,) index of own sentence within the group
        vid_position: Optional[jnp.ndarray],
        *,
        deterministic: bool,
    ):
        B, G, d = batched_sent.shape
        own_onehot = jax.nn.one_hot(own_pos, G, dtype=batched_sent.dtype)[..., None]
        masked_sent = (
            batched_sent * (1.0 - own_onehot)
            + self.masked_sent_token.astype(batched_sent.dtype)[None, None] * own_onehot
        )
        # video is keys/values, masked sentence set is the query stream;
        # positions intentionally unused (reference model.py:478-482).
        recon = self.recon_trans(
            batched_vid,
            masked_sent,
            batched_vid_mask,
            None,
            None,
            batched_sent_mask,
            deterministic=deterministic,
        )  # (B, G, d)
        recon_own = jnp.take_along_axis(recon, own_pos[:, None, None], axis=1)[:, 0]
        recon_feat = l2_normalize(recon_own)  # (B, d)
        x = recon_feat
        for blk in self.output_sent_proj:
            x = blk(x, deterministic=deterministic)
        return recon_feat, x


def gumbel_mask_words_choice(
    rng: jax.Array, words_mask: jnp.ndarray, words_weight: jnp.ndarray
) -> jnp.ndarray:
    """Choose max(l//3, 1) word positions per row, weighted WITHOUT
    replacement, as a (B, L) bool mask.

    Reference model/model.py:361-384 loops rows on host calling
    np.random.choice(l, m, replace=False, p=w/sum(w)) — sequential weighted
    sampling without replacement. The weighted Gumbel top-k below draws from
    the IDENTICAL distribution: taking the top-m of log(w_i) + Gumbel_i is
    the Plackett-Luce / exponential-race equivalence for successive weighted
    draws without replacement, so the chosen SET has the same law.
    tests/test_mask_words_distribution.py pins this with a chi-square test
    against both np.random.choice and the exact enumeration, including the
    words_weight=2 POS bias. Rows with l <= 1 are left unchosen
    (reference :372-373)."""
    lengths = words_mask.sum(axis=1)  # (B,)
    num_masked = jnp.maximum(lengths // 3, 1)
    w = words_weight.astype(jnp.float32) * words_mask
    eligible = w > 0
    g = jax.random.gumbel(rng, w.shape)
    scores = jnp.where(eligible, jnp.log(jnp.maximum(w, 1e-30)) + g, -jnp.inf)
    order = jnp.argsort(-scores, axis=1)
    ranks = jnp.argsort(order, axis=1)  # rank of each position by score
    return (ranks < num_masked[:, None]) & eligible & (lengths[:, None] > 1)


class MESM(nn.Module):
    cfg: MESMConfig

    def setup(self):
        c = self.cfg
        d = c.hidden_dim
        self.input_vid_proj = InputProj(
            d, c.n_input_proj, c.input_dropout, dtype=c.dtype, name="input_vid_proj"
        )
        self.input_txt_proj = InputProj(
            d, c.n_input_proj, c.input_dropout, dtype=c.dtype, name="input_txt_proj"
        )
        # pos dtype = compute dtype: every consumer adds pos to compute-dtype
        # activations, so emitting bf16 directly (under bf16 compute) saves
        # the full-tensor f32 materialization + late cast; values are
        # identical (sin/cos run in f32 inside, the cast lands on the same
        # numbers). Under f32 compute this is exactly the old behavior.
        self.vid_position_embed = SinePositionEmbedding(
            d, dtype=c.dtype if c.dtype is not None else jnp.float32
        )
        if c.use_txt_pos:
            self.txt_position_embed = TrainablePositionEmbedding(
                c.max_words_l + 1 if c.rec_ss else c.max_words_l,
                d,
                c.input_dropout,
                dtype=c.dtype,
                name="txt_position_embed",
            )
        self.enhance_encoder = T2VEncoder(
            d,
            c.nheads,
            c.num_recfw_layers,
            c.dim_feedforward,
            c.dropout,
            c.activation,
            two_mlp=not c.share_mlp,
            scan=c.scan_layers,
            dtype=c.dtype,
            name="enhance_encoder",
        )
        self.t2v_encoder = T2VEncoder(
            d,
            c.nheads,
            c.t2v_layers,
            c.dim_feedforward,
            c.dropout,
            c.activation,
            scan=c.scan_layers,
            dtype=c.dtype,
            name="t2v_encoder",
        )
        self.transformer = Transformer(
            d,
            c.nheads,
            c.enc_layers,
            c.dec_layers,
            c.dim_feedforward,
            c.dropout,
            c.activation,
            scan=c.scan_layers,
            dtype=c.dtype,
            name="transformer",
        )
        self.span_embed = MLP(d, 2, 3, dtype=c.dtype, name="span_embed")
        self.class_embed = Dense(2, dtype=c.dtype, name="class_embed")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (c.num_queries, 2), jnp.float32
        )
        self.saliency_proj1 = Dense(d, dtype=c.dtype, name="saliency_proj1")
        self.saliency_proj2 = Dense(d, dtype=c.dtype, name="saliency_proj2")
        self.global_rep_token = self.param(
            "global_rep_token", nn.initializers.normal(1.0), (d,), jnp.float32
        )
        self.global_rep_pos = self.param(
            "global_rep_pos", nn.initializers.normal(1.0), (d,), jnp.float32
        )
        if c.rec_fw:
            self.masked_token = self.param(
                "masked_token", nn.initializers.zeros, (c.t_feat_dim,), jnp.float32
            )
            self.unknown_token = self.param(
                "unknown_token", nn.initializers.zeros, (c.t_feat_dim,), jnp.float32
            )
            self.output_txt_proj = [
                LinearBlock(d, dropout=c.input_dropout, relu=True, dtype=c.dtype, name="output_txt_proj0"),
                Dense(c.num_classes, dtype=c.dtype, name="output_txt_proj1"),
            ]
        if c.rec_ss:
            self.ss_reconstructor = SegSenRecon(c, name="ss_reconstructor")

    # -- helpers ------------------------------------------------------------

    def project_video_groups(self, video_feat_g, video_mask_g, deterministic=True):
        """Eval-only hoist: project the unique-video features (the
        v_feat_dim-wide LN->Dense input projection) and compute their sine
        positions OUTSIDE the dispatch-coalesced K-scan.

        make_eval_step(superbatch=True) calls this once on the (K*NG, Lv, Dv)
        stack so the wide tensor is consumed by one large batched kernel
        instead of being dynamic-sliced per scanned batch (trace r3s_ctrl:
        the per-k slice + relayout copy of the bf16 (8,53,194,2818) stack
        cost ~0.27 ms/batch). Values are identical to projecting inside
        __call__ (deterministic, same params). Returns (projed_g, pos_g)."""
        projed_g = self.input_vid_proj(video_feat_g, deterministic=deterministic)
        pos_g = self.vid_position_embed(video_mask_g)
        return projed_g, pos_g

    def project_video_rows(self, video_rows, video_mask_g, deterministic=True):
        """2-D variant of project_video_groups for the superbatch hoist.

        The unique-video features arrive as a row-major-pinned (K*NG*Lv, Dv)
        array (data/pipeline.stage_superbatch): the H2D transfer then commits
        exactly the layout the fused LN->Dense consumes, where the transfer
        path's preferred >=3-D layout forced a full relayout copy of the wide
        stack on the compute stream (1.49 ms/dispatch at the charades
        flagship geometry — HLO copy.745, traces/r4_ctrl). The projection is
        position-wise over the last axis, so the flat row view is exact;
        `video_mask_g` is (G, Lv). Returns (proj_rows (G*Lv, d), pos_g)."""
        projed = self.input_vid_proj(video_rows, deterministic=deterministic)
        pos_g = self.vid_position_embed(video_mask_g)
        return projed, pos_g

    def project_video_rows_flat(self, video_rows, video_mask_g, deterministic=True):
        """Fully-flat variant of project_video_rows: both outputs stay 2-D
        (R = G*Lv rows, d) — projection (position-wise, so the flat view is
        exact) AND sine positions (sine_position_embedding_rows, bit-equal
        to the 3-D form flattened). Consumed via the `video_proj_rows` /
        `vid_pos_rows` kwargs with GLOBAL `video_slot`, avoiding every >=3-D
        retiling copy on the hoisted hand-off. Returns (proj (R, d),
        pos (R, d))."""
        projed = self.input_vid_proj(video_rows, deterministic=deterministic)
        pos = self.vid_position_embed.rows(video_mask_g)
        return projed, pos

    def _txt_pos(self, feat, deterministic):
        if self.cfg.use_txt_pos:
            return self.txt_position_embed(feat, deterministic=deterministic)
        return jnp.zeros_like(feat)

    def _mask_words(self, projed_words, words_mask, words_weight, deterministic):
        """Weighted sampling w/o replacement of ceil-ish (l//3, min 1) word
        positions per row, replaced by the projected mask token.

        Reference model/model.py:361-384 does this with np.random.choice on
        host; the Gumbel top-k below draws from the identical distribution
        (exponential race <=> sequential weighted sampling w/o replacement).
        Rows with <=1 valid words are left unmasked (reference :372-373)."""
        c = self.cfg
        masked_token = self.input_txt_proj(
            self.masked_token[None, None, :].astype(projed_words.dtype),
            deterministic=deterministic,
        )  # (1, 1, d)
        chosen = gumbel_mask_words_choice(
            self.make_rng("mask_words"), words_mask, words_weight
        )
        out = jnp.where(chosen[..., None], masked_token, projed_words)
        return out, chosen

    def _replace_unknown(self, projed_words, unknown_mask, deterministic):
        unk = self.input_txt_proj(
            self.unknown_token[None, None, :].astype(projed_words.dtype),
            deterministic=deterministic,
        )
        return jnp.where(unknown_mask[..., None], unk, projed_words)

    # -- forward ------------------------------------------------------------

    def __call__(
        self,
        video_feat: Optional[jnp.ndarray],  # (B, Lv, Dv); None with video_feat_g
        video_mask: jnp.ndarray,  # (B, Lv) bool
        words_feat: jnp.ndarray,  # (B, Lw, Dt) encoded text (frozen encoder output)
        words_mask: jnp.ndarray,  # (B, Lw) bool
        sentence_feat: jnp.ndarray,  # (B, Dt)
        neg_idx_rows: jnp.ndarray,  # (B,) out-of-group row permutation
        *,
        is_training: bool,
        deterministic: bool,
        compute_neg: bool = True,
        clip_mask: Optional[jnp.ndarray] = None,  # (B, Lv) GT-span frames
        words_weight: Optional[jnp.ndarray] = None,  # (B, Lw)
        unknown_mask: Optional[jnp.ndarray] = None,  # (B, Lw)
        ss_sent_idx: Optional[jnp.ndarray] = None,  # (B, G) row indices of group
        ss_sent_mask: Optional[jnp.ndarray] = None,  # (B, G)
        ss_own_pos: Optional[jnp.ndarray] = None,  # (B,)
        ss_video_feat: Optional[jnp.ndarray] = None,  # (B, Lss, Dv) qvh group video
        ss_video_mask: Optional[jnp.ndarray] = None,  # (B, Lss)
        video_feat_g: Optional[jnp.ndarray] = None,  # (NG, Lv, Dv) unique videos
        video_mask_g: Optional[jnp.ndarray] = None,  # (NG, Lv)
        video_slot: Optional[jnp.ndarray] = None,  # (B,) row -> unique video
        video_proj_g: Optional[jnp.ndarray] = None,  # (NG, Lv, d) pre-projected
        vid_pos_g: Optional[jnp.ndarray] = None,  # (NG, Lv, d) pre-computed pos
        video_proj_rows: Optional[jnp.ndarray] = None,  # (R, d) flat pre-proj
        vid_pos_rows: Optional[jnp.ndarray] = None,  # (R, d) flat pre-pos
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B = video_mask.shape[0]
        det = deterministic

        if video_proj_rows is not None:
            # FLAT projection hoist (make_eval_step._hoist_video_proj, rows
            # form): the hoisted projection and sine positions stay 2-D
            # (R = K*NG*Lv rows) end-to-end — the 4-D (K, NG, Lv, d) view a
            # group-shaped hand-off needs forces sublane-retiling copies
            # (traces/r4_k32_pos: reshape.418/419 + copy.737 = 0.06
            # ms/batch). `video_slot` is GLOBAL here (k*NG + slot, staged by
            # data/pipeline.stage_superbatch), so one row gather per batch
            # reconstructs (B, Lv, d) exactly as the group form would.
            Lv = video_mask.shape[1]
            row_idx = video_slot[:, None] * Lv + jnp.arange(Lv)[None, :]
            projed_video_feat = video_proj_rows[row_idx]
            vid_position = vid_pos_rows[row_idx].astype(projed_video_feat.dtype)
        elif video_proj_g is not None:
            # projection hoisted out of the coalesced eval scan by the step
            # builder (make_eval_step._hoist_video_proj via
            # project_video_groups); gather rows from the narrow output.
            # Measured A/B at the flagship geometry (traces r3s_*): this
            # group-hoist is the best of three variants — hoisting the
            # row-gather too loses 0.11 ms/batch to bigger outside writes,
            # and pinning the body stream row-major with a Pallas identity
            # anchor loses 0.21 (see ops/anchor.py for the numbers).
            projed_video_feat = video_proj_g[video_slot]
            vid_position = vid_pos_g.astype(projed_video_feat.dtype)[video_slot]
        elif video_feat_g is not None:
            # deduplicated eval path: project each unique video once, gather
            # rows after the (v_feat_dim-wide) projection — identical values
            # to the per-row path (dropout is inactive at eval)
            projed_g = self.input_vid_proj(video_feat_g, deterministic=det)
            projed_video_feat = projed_g[video_slot]
            vid_position = self.vid_position_embed(video_mask_g).astype(
                projed_video_feat.dtype
            )[video_slot]
        else:
            projed_video_feat = self.input_vid_proj(video_feat, deterministic=det)
            vid_position = self.vid_position_embed(video_mask).astype(
                projed_video_feat.dtype
            )
        projed_words_feat = self.input_txt_proj(words_feat, deterministic=det)
        txt_position = self._txt_pos(projed_words_feat, det)

        # (FW-MESM enhance happens below, stacked with the negative pass.)

        # --- SS-MESM: reconstruct own sentence from group video ------------
        if c.rec_ss:
            if ss_video_feat is None:  # single-video groups (charades family)
                # (a second, independent projection draw of the same video —
                # reference model.py:200; identical to the main projection
                # when deterministic, so the dedup gather applies here too)
                if video_proj_g is not None or video_proj_rows is not None:
                    batched_vid = projed_video_feat  # hoisted dedup projection
                elif video_feat_g is not None:
                    batched_vid = self.input_vid_proj(video_feat_g, deterministic=det)[
                        video_slot
                    ]
                else:
                    batched_vid = self.input_vid_proj(video_feat, deterministic=det)
                batched_vid_mask = video_mask
                batched_vid_position = vid_position
            else:  # qvhighlights: concatenated group clips
                batched_vid_mask = ss_video_mask
                batched_vid_position = self.vid_position_embed(ss_video_mask).astype(
                    projed_video_feat.dtype
                )
                batched_vid = self.input_vid_proj(ss_video_feat, deterministic=det)
            group_sent = sentence_feat[ss_sent_idx]  # (B, G, Dt)
            batched_sent = self.input_txt_proj(group_sent, deterministic=det)
            recon_feat, projed_recon_feat = self.ss_reconstructor(
                batched_vid,
                batched_vid_mask,
                batched_sent,
                ss_sent_mask,
                ss_own_pos,
                batched_vid_position,
                deterministic=det,
            )
            expanded_words_feat = jnp.concatenate(
                [recon_feat[:, None, :].astype(projed_words_feat.dtype), projed_words_feat],
                axis=1,
            )
            expanded_words_mask = jnp.concatenate(
                [jnp.ones((B, 1), bool), words_mask.astype(bool)], axis=1
            )
        else:
            expanded_words_feat = projed_words_feat
            expanded_words_mask = words_mask.astype(bool)

        expanded_txt_position = self._txt_pos(expanded_words_feat, det)

        # --- aligner + DETR (positive, and negative when requested) ---------
        # The negative pass (mismatched text from other groups,
        # reference model.py:260-299) feeds only the saliency loss
        # (criterion.py:147-162). It shares every module with the positive
        # pass, so when computed it is STACKED into the batch dim (2B rows:
        # [positive | negative]) — one traversal of enhance/t2v/transformer
        # instead of two, which halves the compiled graph. Row-wise math is
        # identical to two separate calls. Pure inference skips it entirely.
        if compute_neg:
            neg_expanded_words_feat = expanded_words_feat[neg_idx_rows]
            neg_expanded_words_mask = expanded_words_mask[neg_idx_rows]
            neg_expanded_txt_position = expanded_txt_position[neg_idx_rows]
            if c.rec_ss:  # the recon token is dropped for the enhance input
                neg_words_feat = neg_expanded_words_feat[:, 1:, :]
                neg_words_mask = neg_expanded_words_mask[:, 1:]
                neg_txt_position = neg_expanded_txt_position[:, 1:, :]
            else:
                neg_words_feat = neg_expanded_words_feat
                neg_words_mask = neg_expanded_words_mask
                neg_txt_position = neg_expanded_txt_position

            def stack(a, b):
                return jnp.concatenate([a, b], axis=0)

            video2 = stack(projed_video_feat, projed_video_feat)
            vid_position2 = stack(vid_position, vid_position)
            video_mask2 = stack(video_mask, video_mask)
            # the reference's scrambled pair-mask quirk (see t2v.py) depends on
            # the row count of each separate call (B, not 2B) — precompute the
            # factors per half so the stacked traversal stays bit-identical
            H = c.nheads

            def stack_factors(fa, fb):
                return (stack(fa[0], fb[0]), stack(fa[1], fb[1]))

            if c.rec_fw:
                enhance_pf2 = stack_factors(
                    scrambled_pair_factors(video_mask, words_mask, H),
                    scrambled_pair_factors(video_mask, neg_words_mask, H),
                )
                enhanced2 = self.enhance_encoder(
                    stack(projed_words_feat, neg_words_feat),
                    video2,
                    stack(words_mask, neg_words_mask),
                    stack(txt_position, neg_txt_position),
                    vid_position2,
                    pair_factors=enhance_pf2,
                    deterministic=det,
                )
            else:
                enhanced2 = video2
            enhanced_video_feat = enhanced2[:B]

            t2v_pf2 = stack_factors(
                scrambled_pair_factors(video_mask, expanded_words_mask, H),
                scrambled_pair_factors(video_mask, neg_expanded_words_mask, H),
            )
            encoded2 = self.t2v_encoder(
                stack(expanded_words_feat, neg_expanded_words_feat),
                enhanced2,
                stack(expanded_words_mask, neg_expanded_words_mask),
                stack(expanded_txt_position, neg_expanded_txt_position),
                vid_position2,
                pair_factors=t2v_pf2,
                deterministic=det,
            )
            n_rows, t_mask, t_pos = 2 * B, video_mask2, vid_position2
            encoded_video_feat = encoded2
        else:
            if c.rec_fw:
                enhanced_video_feat = self.enhance_encoder(
                    projed_words_feat,
                    projed_video_feat,
                    words_mask,
                    txt_position,
                    vid_position,
                    video_mask,
                    deterministic=det,
                )
            else:
                enhanced_video_feat = projed_video_feat
            encoded_video_feat = self.t2v_encoder(
                expanded_words_feat,
                enhanced_video_feat,
                expanded_words_mask,
                expanded_txt_position,
                vid_position,
                video_mask,
                deterministic=det,
            )
            n_rows, t_mask, t_pos = B, video_mask, vid_position

        global_token = jnp.broadcast_to(
            self.global_rep_token[None, None, :], (n_rows, 1, c.hidden_dim)
        ).astype(encoded_video_feat.dtype)
        global_token_pos = jnp.broadcast_to(
            self.global_rep_pos[None, None, :], (n_rows, 1, c.hidden_dim)
        ).astype(encoded_video_feat.dtype)

        hs_all, reference_all, memory_all, memory_global_all = self.transformer(
            encoded_video_feat,
            t_mask,
            self.query_embed,
            t_pos,
            global_token,
            global_token_pos,
            deterministic=det,
        )
        hs, reference = hs_all[:, :B], reference_all[:, :B]
        memory, memory_global = memory_all[:B], memory_global_all[:B]

        outputs_class = self.class_embed(hs)  # (#layers, B, nq, 2)
        outputs_coord = jax.nn.sigmoid(self.span_embed(hs) + inverse_sigmoid(reference))

        scale = 1.0 / jnp.sqrt(jnp.asarray(c.hidden_dim, jnp.float32))
        saliency_scores = (
            self.saliency_proj1(memory) * self.saliency_proj2(memory_global)[:, None]
        ).sum(-1) * scale

        if not compute_neg:
            out: Dict[str, jnp.ndarray] = {
                "pred_logits": outputs_class[-1],
                "pred_spans": outputs_coord[-1],
                "saliency_scores": saliency_scores,
            }
            if c.aux_loss:
                out["aux_pred_logits"] = outputs_class[:-1]
                out["aux_pred_spans"] = outputs_coord[:-1]
            return out

        neg_memory, neg_memory_global = memory_all[B:], memory_global_all[B:]
        neg_saliency_scores = (
            self.saliency_proj1(neg_memory) * self.saliency_proj2(neg_memory_global)[:, None]
        ).sum(-1) * scale

        out: Dict[str, jnp.ndarray] = {
            "pred_logits": outputs_class[-1],
            "pred_spans": outputs_coord[-1],
            "saliency_scores": saliency_scores,
            "neg_saliency_scores": neg_saliency_scores,
        }
        if c.aux_loss:
            out["aux_pred_logits"] = outputs_class[:-1]  # (#layers-1, B, nq, 2)
            out["aux_pred_spans"] = outputs_coord[:-1]

        if c.rec_ss:
            out.update(
                projed_video_feat=projed_video_feat,
                recon_feat=recon_feat,
                projed_recon_feat=projed_recon_feat,
                expanded_words_feat=expanded_words_feat,
                expanded_words_mask=expanded_words_mask,
                enhanced_video_feat=enhanced_video_feat,
                projed_words_feat=projed_words_feat,
            )

        # --- MLM path (train only) ------------------------------------------
        if c.rec_fw and is_training:
            unknowned_words_feat = self._replace_unknown(
                projed_words_feat, unknown_mask, det
            )
            # compact each row's GT-clip frames to the front (stable order)
            Lv = video_mask.shape[1]
            order = jnp.argsort(~clip_mask.astype(bool), axis=1, stable=True)
            merged_clip_feat = jnp.take_along_axis(
                projed_video_feat, order[..., None], axis=1
            )
            merged_clip_position = jnp.take_along_axis(
                vid_position, order[..., None], axis=1
            )
            merged_clip_mask = lengths_to_mask(clip_mask.sum(axis=1), Lv)

            masked_words_feat, masked_words_loc = self._mask_words(
                unknowned_words_feat, words_mask, words_weight, det
            )
            recfw_out = self.enhance_encoder(
                merged_clip_feat,
                masked_words_feat,
                merged_clip_mask,
                merged_clip_position,
                txt_position,
                words_mask,
                is_mlm=True,
                deterministic=det,
            )
            x = recfw_out
            x = self.output_txt_proj[0](x, deterministic=det)
            x = self.output_txt_proj[1](x)
            out["recfw_words_logit"] = x
            out["words_mask"] = words_mask
            out["masked_words_loc"] = masked_words_loc

        return out

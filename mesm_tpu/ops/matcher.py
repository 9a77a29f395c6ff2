"""On-device DETR-style set matching for moment retrieval.

Behavioral parity target: reference model/matcher.py (HungarianMatcher).
Cost = cost_span * L1(cxw) + cost_giou * (-gIoU(xx)) + cost_class * (-P(fg))
(reference model/matcher.py:77-105; foreground label is class 0, :35).

Two regimes, matching the reference exactly:
  - single-target (charades / tacos / charades-cg/cd): every sample has exactly
    one target, so the per-sample LSAP degenerates to an argmin over queries
    (reference model/matcher.py:112-117 solves an (nq, 1) LSAP per sample).
  - multi-target (qvhighlights): per-sample LSAP over (nq, <=max_windows)
    targets (reference model/matcher.py:108-111), solved on device via
    ops/lsap.py instead of a .cpu() round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lsap import solve_lsap_batch
from .span import generalized_temporal_iou, span_cxw_to_xx


def _pair_cost(
    pred_logits: jnp.ndarray,  # (B, nq, 2)
    pred_spans: jnp.ndarray,  # (B, nq, 2) cxw in [0,1]
    tgt_spans: jnp.ndarray,  # (B, T, 2) cxw
    tgt_moments: jnp.ndarray,  # (B, T, 2) xx
    cost_span: float,
    cost_giou: float,
    cost_class: float,
) -> jnp.ndarray:
    """Per-sample (nq, T) matching cost."""
    prob_fg = jax.nn.softmax(pred_logits, axis=-1)[..., 0]  # (B, nq)
    c_class = -prob_fg[:, :, None]  # (B, nq, T) broadcast
    c_span = jnp.abs(pred_spans[:, :, None, :] - tgt_spans[:, None, :, :]).sum(-1)
    c_giou = -generalized_temporal_iou(span_cxw_to_xx(pred_spans), tgt_moments)
    return cost_span * c_span + cost_giou * c_giou + cost_class * c_class


def single_target_match(
    pred_logits: jnp.ndarray,
    pred_spans: jnp.ndarray,
    tgt_span: jnp.ndarray,  # (B, 2) cxw
    tgt_moment: jnp.ndarray,  # (B, 2) xx
    cost_span: float = 10.0,
    cost_giou: float = 1.0,
    cost_class: float = 4.0,
) -> jnp.ndarray:
    """Each sample has one target: the matched query is the cost argmin.

    Returns src_idx: (B,) int32 query index.
    """
    cost = _pair_cost(
        pred_logits,
        pred_spans,
        tgt_span[:, None, :],
        tgt_moment[:, None, :],
        cost_span,
        cost_giou,
        cost_class,
    )[..., 0]  # (B, nq)
    return jnp.argmin(cost, axis=-1).astype(jnp.int32)


def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_spans: jnp.ndarray,
    tgt_spans: jnp.ndarray,  # (B, T, 2) cxw, padded
    tgt_moments: jnp.ndarray,  # (B, T, 2) xx, padded
    tgt_mask: jnp.ndarray,  # (B, T) bool
    cost_span: float = 10.0,
    cost_giou: float = 1.0,
    cost_class: float = 4.0,
) -> jnp.ndarray:
    """Multi-target optimal assignment.

    Returns src_idx: (B, T) int32, the query matched to each target
    (meaningful only where tgt_mask). Matches scipy's LSAP on the unpadded
    per-sample cost matrices.
    """
    cost = _pair_cost(
        pred_logits, pred_spans, tgt_spans, tgt_moments, cost_span, cost_giou, cost_class
    )  # (B, nq, T)
    # Padded targets can carry degenerate spans; keep cost finite before
    # handing to the solver (the solver overwrites invalid rows anyway).
    cost = jnp.where(tgt_mask[:, None, :], cost, 0.0)
    cost_t = jnp.swapaxes(cost, 1, 2)  # (B, T, nq): rows = targets
    return solve_lsap_batch(cost_t, tgt_mask)

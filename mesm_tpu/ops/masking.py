"""Mask algebra helpers shared across the model / loss stack.

The TPU build replaces every ragged op in the reference (pad_sequences_1d,
split_and_pad, split_expand_and_pad — reference utils/data_utils.py:34-110)
with fixed shapes + boolean masks. These helpers centralise the recurring
patterns so the mask conventions stay consistent: masks are boolean, True =
valid (the reference mixes "valid" masks and torch-style "padding" masks; we
only ever use valid-masks and flip at the attention boundary).
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool valid-mask."""
    pos = jnp.arange(max_len)
    return pos[None, :] < lengths[:, None]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Mean of x over `axis`, counting only mask==True positions.

    Matches the reference's `sum / mask.sum()` pattern (e.g. CLIP sentence
    pooling, model/model.py:123) including its behavior of producing inf/nan
    for fully-masked rows — callers guarantee at least one valid element.
    """
    mask = mask.astype(x.dtype)
    if mask.ndim < x.ndim:
        mask = jnp.expand_dims(mask, -1)
    total = (x * mask).sum(axis=axis)
    count = mask.sum(axis=axis)
    return total / count


def masked_softmax_logits(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace invalid logits with a large negative constant (not -inf, to keep
    gradients finite for fully-masked rows)."""
    return jnp.where(mask, logits, NEG_INF)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize along axis.

    `eps` semantics follow torch.nn.functional.normalize: denominator is
    max(||x||, eps) (reference uses eps=1e-5 in model/model.py:131-132 and the
    default 1e-12 in criterion.py:258-259).
    """
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)

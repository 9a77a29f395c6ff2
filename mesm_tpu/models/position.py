"""Positional encodings.

Parity targets: reference model/position_encoding.py
(PositionEmbeddingSine :35-72 with normalize=True/scale=2pi from
runner.py:243, TrainablePositionalEncoding :10-32).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def sine_position_embedding(
    mask: jnp.ndarray,  # (B, L) valid-mask (True = valid)
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, L) valid-mask -> (B, L, num_pos_feats) sinusoidal embedding.

    Positions are the cumulative count of valid elements (so padding does not
    shift real positions), normalized to [0, scale] by the last cumsum value.
    """
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    return _interleave_half_freq(x_embed, num_pos_feats, temperature, dtype)


def _interleave_half_freq(x_embed, num_pos_feats, temperature, dtype):
    """(...,) f32 positions -> (..., F) interleaved sin/cos embedding.

    Half-frequency formulation: the reference's dim_t (position_encoding.py
    :35-72) satisfies dim_t[2k] == dim_t[2k+1] == temperature^(2k/F), so
    channel 2k = sin(x/dim_t[2k]) and channel 2k+1 = cos(x/dim_t[2k]) need
    only F/2 distinct angles — BIT-IDENTICAL values to the even/odd-strided
    original, but with no strided slices: the strided
    stack([sin(pos[...,0::2]), cos(pos[...,1::2])]) form materialized a
    full-F f32 quotient and lowered to a pad+concat+relayout chain costing
    ~0.22 ms/batch OUTSIDE the eval scan at the flagship geometry
    (traces/r4_k32: fusion.985/986 + pad_maximum + copy.733/751 +
    mini-gather slices are all this op). sin/cos are computed on the
    contiguous (..., F/2) angle tensor, cast to the TARGET dtype first (the
    f32->bf16 cast is values-equal wherever it lands), and interleaved by
    one minor-axis stack+reshape. ONE copy of this math — both the (B, L)
    and the flat rows entry points feed it."""
    half = num_pos_feats // 2
    i = jnp.arange(half, dtype=jnp.float32)
    inv_freq = temperature ** (2.0 * i / num_pos_feats)
    angle = x_embed[..., None] / inv_freq  # (..., F/2) f32
    pos = jnp.stack(
        [jnp.sin(angle).astype(dtype), jnp.cos(angle).astype(dtype)], axis=-1
    )
    return pos.reshape(pos.shape[:-2] + (num_pos_feats,))


def sine_position_embedding_rows(
    mask: jnp.ndarray,  # (G, L) valid-mask
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(G, L) valid-mask -> (G*L, F) FLAT sine embedding, bit-identical to
    `sine_position_embedding(mask).reshape(G*L, F)`.

    2-D variant for the superbatch projection hoist: only the tiny (G, L)
    cumsum sees the 2-D group view; the wide F-axis expansion happens
    directly on (G*L, F/2) rows, so no >=3-D tensor (and none of the
    sublane-retiling copies a (G, L, F) tiled layout forces when reshaped
    flat — traces/r4_k32_pos: reshape.419 + copy.737 = 0.04 ms/batch)."""
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    return _interleave_half_freq(
        x_embed.reshape(-1), num_pos_feats, temperature, dtype
    )


class SinePositionEmbedding(nn.Module):
    num_pos_feats: int
    temperature: float = 10000.0
    normalize: bool = True
    dtype: jnp.dtype = jnp.float32

    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        return sine_position_embedding(
            mask,
            self.num_pos_feats,
            self.temperature,
            self.normalize,
            dtype=self.dtype,
        )

    def rows(self, mask: jnp.ndarray) -> jnp.ndarray:
        """Flat (G*L, F) form — see sine_position_embedding_rows."""
        return sine_position_embedding_rows(
            mask,
            self.num_pos_feats,
            self.temperature,
            self.normalize,
            dtype=self.dtype,
        )


class TrainablePositionEmbedding(nn.Module):
    """input + learned positional embedding -> LayerNorm -> Dropout."""

    max_positions: int
    hidden_size: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        L = x.shape[1]
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.max_positions, self.hidden_size),
            jnp.float32,
        )
        emb = table[:L][None, :, :].astype(x.dtype)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x + emb)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)

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

    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(i / 2) / num_pos_feats)
    pos = x_embed[:, :, None] / dim_t  # (B, L, F)
    # interleave sin on even channels, cos on odd channels
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    pos = pos.reshape(pos.shape[0], pos.shape[1], -1)
    return pos.astype(dtype)


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

"""Frozen text encoders: CLIP text tower and GloVe lookup.

Parity targets: reference model/text_encoder.py (CLIPTextEncoder :240-354 —
token embedding, 77-position embedding, causal ResidualAttentionBlock stack
with QuickGELU, ln_final, eot-argmax pooled text_projection; GloVe loader
:397-429; GloveTextEncoder :432-454) and the three encode paths in
model/model.py:103-152.

TPU notes:
  - The reference runs CLIP in fp16 (text_encoder.py:333-335,373-394); here
    the compute dtype is bf16 on TPU (fp32 on CPU tests), with fp32 outputs.
  - The encoders are FROZEN: their params live in a separate pytree outside
    the trainable MESM params, mirroring the reference's requires_grad_(False)
    + exclusion from checkpoints (utils/model_utils.py:20-27).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masking import l2_normalize
from .attention import attention_core

NEG_INF = -1e9


class QuickGELU(nn.Module):
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        E = self.width
        in_kernel = self.param(
            "attn_in_proj_kernel", nn.initializers.xavier_uniform(), (E, 3 * E), jnp.float32
        )
        in_bias = self.param("attn_in_proj_bias", nn.initializers.zeros, (3 * E,), jnp.float32)
        wq, wk, wv = jnp.split(in_kernel.astype(self.dtype), 3, axis=1)
        bq, bk, bv = jnp.split(in_bias.astype(self.dtype), 3)
        attn = attention_core(
            y @ wq + bq,
            y @ wk + bk,
            y @ wv + bv,
            num_heads=self.heads,
            logit_bias=causal_bias,
        )
        attn = nn.Dense(E, dtype=self.dtype, name="attn_out_proj")(attn)
        x = x + attn
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * E, dtype=self.dtype, name="mlp_c_fc")(y)
        y = QuickGELU()(y)
        y = nn.Dense(E, dtype=self.dtype, name="mlp_c_proj")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    """CLIP text tower. Returns per-token states (pre-projection width) and the
    eot-pooled projected sentence embedding."""

    embed_dim: int
    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray):  # (B, context_length) int
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        x = tok.astype(self.dtype)[text] + pos.astype(self.dtype)[None]
        L = self.context_length
        causal = jnp.triu(jnp.full((L, L), NEG_INF, self.dtype), k=1)[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblock{i}"
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(text, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot] @ proj.astype(self.dtype)
        return {"last_hidden_state": x, "pooler_output": pooled}


def clip_encode_text(
    clip_model: CLIPTextEncoder,
    clip_params,
    words_id: jnp.ndarray,  # (B, 77)
    words_mask: jnp.ndarray,  # (B, 77) bool
    max_words_l: int,
    normalize_txt: bool = True,
):
    """Reference MESM.CLIP_encode_text (model/model.py:103-134): frozen tower,
    fp32 word states truncated to max_words_l, zeroed at padding, sentence =
    masked mean, both L2-normalized (eps=1e-5)."""
    out = clip_model.apply({"params": clip_params}, words_id)
    words_feat = out["last_hidden_state"].astype(jnp.float32)
    words_feat = words_feat[:, :max_words_l, :]
    words_id = words_id[:, :max_words_l]
    words_mask = words_mask[:, :max_words_l]
    words_feat = jnp.where(words_mask[..., None], words_feat, 0.0)
    sentence_feat = words_feat.sum(axis=1) / words_mask.sum(axis=1, keepdims=True)
    if normalize_txt:
        words_feat = l2_normalize(words_feat, eps=1e-5)
        sentence_feat = l2_normalize(sentence_feat, eps=1e-5)
    return words_feat, sentence_feat, words_id, words_mask


class GloVeTextEncoder(nn.Module):
    """Frozen embedding lookup; the table is filled from GloVe vectors at
    build time (reference model/text_encoder.py:432-454)."""

    num_embeddings: int
    features: int = 300

    @nn.compact
    def __call__(self, word_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        return table[word_ids]


def glove_encode_text(
    glove_model: GloVeTextEncoder,
    glove_params,
    words_id: jnp.ndarray,
    words_mask: jnp.ndarray,
    normalize_txt: bool = True,
):
    """Reference MESM.GloVe_encode_text (model/model.py:136-143)."""
    words_feat = glove_model.apply({"params": glove_params}, words_id)
    words_feat = jnp.where(words_mask[..., None], words_feat, 0.0)
    sentence_feat = words_feat.sum(axis=1) / words_mask.sum(axis=1, keepdims=True)
    if normalize_txt:
        words_feat = l2_normalize(words_feat, eps=1e-5)
        sentence_feat = l2_normalize(sentence_feat, eps=1e-5)
    return words_feat, sentence_feat


def post_process_precomputed_text(words_feat: jnp.ndarray, normalize_txt: bool = True):
    """Precomputed 300-d word features as input (GloVeNLTK + load_vocab_pkl):
    reference MESM.post_process_text (model/model.py:145-152). The word mask
    is derived from nonzero feature sums."""
    if normalize_txt:
        words_feat = l2_normalize(words_feat)  # default eps (1e-12), per reference
    words_mask = words_feat.sum(axis=-1) != 0
    sentence_feat = words_feat.sum(axis=1) / words_mask.sum(axis=1, keepdims=True)
    if normalize_txt:
        sentence_feat = l2_normalize(sentence_feat)
    return words_feat, words_mask, sentence_feat


def build_glove_embedding_matrix(vocab_itow: dict, glove_vectors: dict, dim: int = 300, seed: int = 0) -> np.ndarray:
    """Fill an embedding table from a word->vector dict; unknown words get the
    shared <UNK> random vector, <PAD> is zeros (reference text_encoder.py:402-413)."""
    rng = np.random.default_rng(seed)
    unk = rng.standard_normal(dim).astype(np.float32)
    table = np.zeros((len(vocab_itow), dim), np.float32)
    for idx, word in vocab_itow.items():
        if word == "<PAD>":
            continue
        if word == "<UNK>" or word not in glove_vectors:
            table[idx] = unk
        else:
            table[idx] = glove_vectors[word]
    return table

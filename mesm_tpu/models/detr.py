"""DETR transformer: global-token encoder + DAB-style anchor decoder.

Parity targets (reference model/transformer.py):
  - gen_sineembed_for_position (:43-59)
  - TransformerEncoderLayer (:615-673, post-norm path)
  - TransformerDecoderLayer (:676-797): content/pos projections for self-attn,
    per-head concatenated (content | positional) queries/keys for cross-attn
    through the projection-free attention core.
  - TransformerDecoder (:280-420): 2-D (center, width) reference anchors
    through sigmoid, per-layer sine embedding, cond_elewise query scaling,
    width-modulated attention, iterative anchor refinement with detached
    updates, per-layer normalized hidden states.
  - Transformer (:119-205): prepend global token, encode, split global/local
    memory, decode.

Init parity: the reference xavier-uniforms every >1-dim parameter after
construction (:168-171) — including the decoder bbox head's zero-filled last
kernel, which is therefore xavier in practice (the zero *bias* survives).

All batch-first. Masks are valid-masks (True = attendable).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import CoreAttention, ProjAttention
from .layers import FFN, MLP, apply_ln, torch_linear_bias_init

_xavier = nn.initializers.xavier_uniform


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1 / x2)


def gen_sine_embed(pos: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sine embedding of (center, width) anchors: (B, nq, 2) -> (B, nq, dim)."""
    scale = 2 * math.pi
    each_dim = dim // 2
    i = jnp.arange(each_dim, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(i / 2) / each_dim)

    def embed(component):  # (B, nq)
        x = component[..., None] * scale / dim_t  # (B, nq, each_dim)
        out = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1)
        return out.reshape(*x.shape[:-1], -1)

    return jnp.concatenate([embed(pos[..., 0]), embed(pos[..., 1])], axis=-1)


def _dense(features: int, fan_in: int, name: str, dtype=None):
    return nn.Dense(
        features,
        kernel_init=_xavier(),
        bias_init=torch_linear_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, src, valid_mask, pos, *, deterministic: bool = True):
        q = k = src + pos
        attn = ProjAttention(
            self.num_heads,
            dropout=self.dropout,
            out_kernel_init=_xavier(),
            dtype=self.dtype,
            name="self_attn",
        )(q, k, src, key_valid_mask=valid_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = apply_ln(
            self,
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1"),
            src,
            deterministic=deterministic,
        )
        y = FFN(
            self.dim_feedforward,
            self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            kernel_init=_xavier(),
            dtype=self.dtype,
            name="ffn",
        )(src, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return apply_ln(
            self,
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2"),
            src,
            deterministic=deterministic,
        )


class _EncoderScanBody(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    activation: str
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, carry, valid_mask, pos, deterministic):
        x = TransformerEncoderLayer(
            self.d_model, self.num_heads, self.dim_feedforward, self.dropout,
            self.activation, dtype=self.dtype, name="layer",
        )(carry, valid_mask, pos, deterministic=deterministic)
        return x, None


class TransformerEncoder(nn.Module):
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    scan: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, src, valid_mask, pos, *, deterministic: bool = True):
        if self.scan and self.num_layers > 1:
            body = nn.scan(
                _EncoderScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
            )(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, self.activation, self.dtype, name="layers",
            )
            x, _ = body(src, valid_mask, pos, deterministic)
            return x
        x = src
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, valid_mask, pos, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """One DAB decoder layer.

    Self-attention: queries/keys are separate content+pos projections of the
    decoder stream / query_pos. Cross-attention: per-head concat of content
    and positional halves into 2*d_model-wide q/k, projection-free attention
    onto d_model-wide values.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    use_qpos_in_cross: bool = False  # True only for the first layer (keep_query_pos=False)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, nq, d)
        memory: jnp.ndarray,  # (B, L, d)
        memory_valid_mask: Optional[jnp.ndarray],  # (B, L)
        pos: jnp.ndarray,  # (B, L, d) memory positions
        query_pos: jnp.ndarray,  # (B, nq, d)
        query_sine_embed: jnp.ndarray,  # (B, nq, d)
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d, h = self.d_model, self.num_heads
        B, nq, _ = tgt.shape
        L = memory.shape[1]

        # ---- self-attention over queries -------------------------------
        q = _dense(d, d, "sa_qcontent_proj", self.dtype)(tgt) + _dense(
            d, d, "sa_qpos_proj", self.dtype
        )(query_pos)
        k = _dense(d, d, "sa_kcontent_proj", self.dtype)(tgt) + _dense(
            d, d, "sa_kpos_proj", self.dtype
        )(query_pos)
        v = _dense(d, d, "sa_v_proj", self.dtype)(tgt)
        sa_out = CoreAttention(
            h, dropout=self.dropout, out_kernel_init=_xavier(), dtype=self.dtype,
            name="self_attn",
        )(q, k, v, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa_out, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        # ---- cross-attention onto memory --------------------------------
        q_content = _dense(d, d, "ca_qcontent_proj", self.dtype)(tgt)
        k_content = _dense(d, d, "ca_kcontent_proj", self.dtype)(memory)
        v = _dense(d, d, "ca_v_proj", self.dtype)(memory)
        k_pos = _dense(d, d, "ca_kpos_proj", self.dtype)(pos)

        if self.use_qpos_in_cross:
            q_content = q_content + _dense(d, d, "ca_qpos_proj", self.dtype)(query_pos)
            k_content = k_content + k_pos

        qse = _dense(d, d, "ca_qpos_sine_proj", self.dtype)(query_sine_embed)
        # The reference concatenates content and positional halves PER HEAD
        # into 2d-wide queries/keys (transformer.py:778-789). Identical
        # logits come from the split form <qc_h, kc_h> + <qse_h, kpos_h>
        # (attention_core split_qk), which never materializes the
        # interleaved (B, L, 2d) concat — measured 0.084 ms/batch of copies
        # at the flagship geometry (trace r3_sq). Scale keeps the concat
        # convention (head_dim 2d/h).
        ca_out = CoreAttention(
            h, dropout=self.dropout, out_kernel_init=_xavier(), dtype=self.dtype,
            name="cross_attn",
        )(
            q_content, k_content, v, key_valid_mask=memory_valid_mask,
            split_qk=(qse, k_pos), deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout)(ca_out, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        y = FFN(
            self.dim_feedforward,
            d,
            dropout=self.dropout,
            activation=self.activation,
            kernel_init=_xavier(),
            dtype=self.dtype,
            name="ffn",
        )(tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


class TransformerDecoder(nn.Module):
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    modulate_t_attn: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, nq, d) initial decoder stream (zeros)
        memory: jnp.ndarray,  # (B, L, d)
        memory_valid_mask: Optional[jnp.ndarray],
        pos: jnp.ndarray,
        refpoints_unsigmoid: jnp.ndarray,  # (B, nq, 2)
        *,
        deterministic: bool = True,
    ):
        d = self.d_model
        ref_point_head = MLP(d, d, 2, kernel_init=_xavier(), dtype=self.dtype, name="ref_point_head")
        query_scale = MLP(d, d, 2, kernel_init=_xavier(), dtype=self.dtype, name="query_scale")
        bbox_embed = MLP(
            d, 2, 3, kernel_init=_xavier(), zero_last_bias=True, dtype=self.dtype,
            name="bbox_embed",
        )
        if self.modulate_t_attn:
            ref_anchor_head = MLP(d, 1, 2, kernel_init=_xavier(), dtype=self.dtype, name="ref_anchor_head")
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

        output = tgt
        reference_points = jax.nn.sigmoid(refpoints_unsigmoid)
        refs = [reference_points]
        hidden = []
        for layer_id in range(self.num_layers):
            obj_center = reference_points  # (B, nq, 2)
            query_sine_embed = gen_sine_embed(obj_center, d).astype(tgt.dtype)
            query_pos = ref_point_head(query_sine_embed)
            if layer_id != 0:
                query_sine_embed = query_sine_embed * query_scale(output)
            if self.modulate_t_attn:
                reft_cond = jax.nn.sigmoid(ref_anchor_head(output))  # (B, nq, 1)
                query_sine_embed = query_sine_embed * (
                    reft_cond[..., 0] / obj_center[..., 1]
                )[..., None]

            output = TransformerDecoderLayer(
                d,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                use_qpos_in_cross=(layer_id == 0),
                dtype=self.dtype,
                name=f"layer{layer_id}",
            )(
                output,
                memory,
                memory_valid_mask,
                pos,
                query_pos,
                query_sine_embed,
                deterministic=deterministic,
            )

            # iterative anchor refinement, detached for the next layer
            delta = bbox_embed(output)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            if layer_id != self.num_layers - 1:
                refs.append(new_ref)
            reference_points = jax.lax.stop_gradient(new_ref)
            hidden.append(norm(output))

        hs = jnp.stack(hidden)  # (#layers, B, nq, d)
        references = jnp.stack(refs)  # (#layers, B, nq, 2)
        return hs, references


class Transformer(nn.Module):
    """Encoder-decoder with a prepended per-sample global token whose encoder
    output becomes the video-level representation for saliency scoring."""

    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    scan: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, L, d) encoded video
        valid_mask: jnp.ndarray,  # (B, L)
        refpoint_embed: jnp.ndarray,  # (nq, 2) anchor table
        pos_embed: jnp.ndarray,  # (B, L, d)
        global_token: jnp.ndarray,  # (B, 1, d)
        global_token_pos: jnp.ndarray,  # (B, 1, d)
        *,
        deterministic: bool = True,
    ):
        B, L, d = src.shape
        src = jnp.concatenate([global_token, src], axis=1)
        pos_embed = jnp.concatenate([global_token_pos, pos_embed], axis=1)
        # Reference quirk reproduced: the global token's key-padding entry is
        # set True=PAD (transformer.py:185-186), so it acts as a query (its
        # output becomes memory_global) but is NEVER attendable as a key —
        # neither by video positions nor by itself.
        full_mask = jnp.concatenate(
            [jnp.zeros((B, 1), bool), valid_mask.astype(bool)], axis=1
        )

        memory = TransformerEncoder(
            self.d_model,
            self.num_heads,
            self.num_encoder_layers,
            self.dim_feedforward,
            self.dropout,
            self.activation,
            scan=self.scan,
            dtype=self.dtype,
            name="encoder",
        )(src, full_mask, pos_embed, deterministic=deterministic)

        memory_global = memory[:, 0]  # (B, d)
        memory_local = memory[:, 1:]  # (B, L, d)

        nq = refpoint_embed.shape[0]
        tgt = jnp.zeros((B, nq, d), src.dtype)
        refpoints = jnp.broadcast_to(refpoint_embed[None], (B, nq, 2)).astype(src.dtype)
        hs, references = TransformerDecoder(
            self.d_model,
            self.num_heads,
            self.num_decoder_layers,
            self.dim_feedforward,
            self.dropout,
            self.activation,
            dtype=self.dtype,
            name="decoder",
        )(
            tgt,
            memory_local,
            valid_mask.astype(bool),
            pos_embed[:, 1:],
            refpoints,
            deterministic=deterministic,
        )
        return hs, references, memory_local, memory_global

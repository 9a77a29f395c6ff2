"""Text<->video cross-modal encoder (the reference's "T2V" stack).

Parity targets: reference model/transformer.py — T2V_TransformerEncoderLayer
(:485-559), T2V_TransformerEncoderLayer_TwoMLP (:562-612), T2V encoder
wrappers (:62-116, :208-242). Batch-first throughout (the reference permutes
to (L, B, D) purely as a torch idiom).

Layer dataflow (post-norm):
  q = video + pos_vid ; k = text + pos_txt ; v = text
  x = video + dropout(attn(q, k, v))        # cross-attn, text keys masked
  y = norm1(x); y = ffn(y)
  out = norm2(x + dropout(y))

Masking quirk reproduced exactly (it changes real outputs): the reference
builds an outer-product pair mask qpad*kpad^T and tiles it with
`.repeat(self.nhead, 1, 1)` (transformer.py:528-533) — i.e. HEAD-major order
[b0..bB-1, b0..bB-1, ...] — but torch's multi_head_attention_forward consumes
a 3-D attn_mask in BATCH-major order (row i = batch i//nhead, head i%nhead).
The net effect: head h of sample b applies the pair mask of sample
(b*nhead + h) % B, so one sample's padding pattern masks (q, k) pairs that
are perfectly valid in another sample. Were the tiling correct the pair mask
would be subsumed by key padding ((qpad & kpad) | kpad == kpad) — because of
the scrambling it is not, and bit-parity with released checkpoints requires
reproducing it (see `_scrambled_pair_bias`).

The TwoMLP variant duplicates the FFN+norm pair and routes by the static
`is_mlm` flag so the reversed (MLM) direction trains its own FFN
(reference :562-612, selected by share_MLP=False in runner.py:190-210).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import ProjAttention
from .layers import FFN, apply_ln, torch_linear_kernel_init


def scrambled_pair_factors(
    vid_valid_mask: jnp.ndarray,  # (B, Lq) True = real query position
    txt_valid_mask: jnp.ndarray,  # (B, Lk) True = real key position
    num_heads: int,
) -> tuple:
    """Factored form of the reference's mis-tiled pair mask
    (transformer.py:530 + torch batch-major attn_mask consumption): head h of
    sample b is masked by the pair mask of sample s = (b*num_heads + h) % B,
    i.e. pair (q, k) is disallowed iff qpad[s, q] & kpad[s, k]. Returns the
    two (B, H, L) factors; attention_core combines them as an outer product
    fused into the logits, so the (B, H, Lq, Lk) mask is never materialized."""
    qpad = ~vid_valid_mask.astype(bool)
    kpad = ~txt_valid_mask.astype(bool)
    B = qpad.shape[0]
    src = (jnp.arange(B)[:, None] * num_heads + jnp.arange(num_heads)[None, :]) % B
    return qpad[src], kpad[src]  # (B, H, Lq), (B, H, Lk)


class T2VLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    two_mlp: bool = False
    # True for stacks the reference re-initializes with a global xavier pass
    # (T2VEncoder wrappers, transformer.py:78-81); False for SegSenRecon's
    # inner stack which keeps torch Linear defaults (model/model.py:445-452).
    xavier_init: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        src_txt: jnp.ndarray,  # (B, Lt, D) keys/values
        src_vid: jnp.ndarray,  # (B, Lv, D) queries (running stream)
        txt_valid_mask: Optional[jnp.ndarray],  # (B, Lt)
        pos_txt: Optional[jnp.ndarray],
        pos_vid: Optional[jnp.ndarray],
        vid_valid_mask: Optional[jnp.ndarray] = None,  # (B, Lv) query-side mask
        pair_factors: Optional[tuple] = None,  # precomputed override
        *,
        is_mlm: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        kinit = (
            nn.initializers.xavier_uniform() if self.xavier_init else torch_linear_kernel_init
        )
        q = src_vid if pos_vid is None else src_vid + pos_vid
        k = src_txt if pos_txt is None else src_txt + pos_txt
        # the scramble depends on the row count the reference saw (B, not 2B),
        # so stacked pos|neg callers precompute per-half factors and pass them in
        if pair_factors is None and vid_valid_mask is not None and txt_valid_mask is not None:
            pair_factors = scrambled_pair_factors(
                vid_valid_mask, txt_valid_mask, self.num_heads
            )
        attn_out = ProjAttention(
            self.num_heads,
            dropout=self.dropout,
            out_kernel_init=kinit,
            dtype=self.dtype,
            name="cross_attn",
        )(
            q,
            k,
            src_txt,
            key_valid_mask=txt_valid_mask,
            pair_factors=pair_factors,
            deterministic=deterministic,
        )
        x = src_vid + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)

        suffix = "_mlm" if (self.two_mlp and is_mlm) else ""
        y = apply_ln(
            self,
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1{suffix}"),
            x,
            deterministic=deterministic,
        )
        y = FFN(
            self.dim_feedforward,
            self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            kernel_init=kinit,
            dtype=self.dtype,
            name=f"ffn{suffix}",
        )(y, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = apply_ln(
            self,
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2{suffix}"),
            x,
            deterministic=deterministic,
        )
        return x


class _T2VScanBody(nn.Module):
    """nn.scan body: carry = the refined video stream; everything else is
    broadcast. Produces the stacked-parameter layout params['layers']['layer']
    with a leading num_layers axis (convert.py stacks/unstacks)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    activation: str
    two_mlp: bool
    xavier_init: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, carry, src_txt, txt_valid_mask, pos_txt, pos_vid,
                 vid_valid_mask, pair_factors, is_mlm, deterministic):
        x = T2VLayer(
            self.d_model, self.num_heads, self.dim_feedforward, self.dropout,
            self.activation, two_mlp=self.two_mlp, xavier_init=self.xavier_init,
            dtype=self.dtype, name="layer",
        )(
            src_txt, carry, txt_valid_mask, pos_txt, pos_vid, vid_valid_mask,
            pair_factors, is_mlm=is_mlm, deterministic=deterministic,
        )
        return x, None


class T2VEncoder(nn.Module):
    """Stack of T2VLayers; the video stream is refined, text is re-read every
    layer (reference T2V_TransformerEncoder, model/transformer.py:208-242).

    scan=True folds the homogeneous layers into one nn.scan body (stacked
    params, ~1/num_layers the traced graph for this stack) — same math,
    different compile footprint; see MESMConfig.scan_layers."""

    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    activation: str = "prelu"
    two_mlp: bool = False
    xavier_init: bool = True
    scan: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        src_txt: jnp.ndarray,
        src_vid: jnp.ndarray,
        txt_valid_mask: Optional[jnp.ndarray],
        pos_txt: Optional[jnp.ndarray] = None,
        pos_vid: Optional[jnp.ndarray] = None,
        vid_valid_mask: Optional[jnp.ndarray] = None,
        pair_factors: Optional[tuple] = None,
        *,
        is_mlm: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.scan and self.num_layers > 1:
            body = nn.scan(
                _T2VScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
            )(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, self.activation, self.two_mlp, self.xavier_init,
                self.dtype, name="layers",
            )
            x, _ = body(
                src_vid, src_txt, txt_valid_mask, pos_txt, pos_vid,
                vid_valid_mask, pair_factors, is_mlm, deterministic,
            )
            return x
        x = src_vid
        for i in range(self.num_layers):
            x = T2VLayer(
                self.d_model,
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                two_mlp=self.two_mlp,
                xavier_init=self.xavier_init,
                dtype=self.dtype,
                name=f"layer{i}",
            )(
                src_txt,
                x,
                txt_valid_mask,
                pos_txt,
                pos_vid,
                vid_valid_mask,
                pair_factors,
                is_mlm=is_mlm,
                deterministic=deterministic,
            )
        return x

"""Attention modules: a shared functional core + the two projection styles.

The reference uses two attention flavors:
  - torch nn.MultiheadAttention (packed qkv in-projection + out-projection):
    DETR encoder self-attn and T2V cross-attn layers
    (reference model/transformer.py:490,620).
  - a vendored projection-free MultiheadAttention (out-projection only,
    vdim may differ from the query embed dim): decoder self/cross attention
    (reference model/attention.py:61-122; decoder usage transformer.py:689,701).

Both share one numerical core: scaled QK^T, additive masking, max-subtracted
softmax (reference model/attention.py:360-381), attention dropout, AV, out
projection. `attention_core` is that core, written batch-first over
(B, L, E); it is the target the fused Pallas kernel replaces (ops/
attention_pallas.py), selected via `mesm_tpu.kernels.use_pallas_attention`.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import torch_linear_kernel_init

NEG_INF = -1e9


def attention_core(
    q: jnp.ndarray,  # (B, Lq, E)  — already includes positional terms
    k: jnp.ndarray,  # (B, Lk, E)
    v: jnp.ndarray,  # (B, Lk, Ev)
    num_heads: int,
    key_valid_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True = attendable
    logit_bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to (B,h,Lq,Lk)
    pair_factors: Optional[tuple] = None,  # ((B,h,Lq), (B,h,Lk)) bool: mask q&k pairs
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Multi-head attention core. Returns (B, Lq, Ev) BEFORE out-projection.

    Scaling uses head_dim of the *query* embedding, matching the reference
    (model/attention.py:281-286) — this matters for the decoder cross-attn,
    whose queries are 2*d_model wide.
    """
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    head_dim = E // num_heads
    v_head_dim = Ev // num_heads
    scale = head_dim**-0.5

    # Head split via reshape only; the head axis rides as a dot batch dim.
    # Measured note: XLA emits the SAME program (same ~0.7 ms/step of layout
    # copies at the charades geometry) for this bqhd form and the explicit
    # transpose(0,2,1,3) form — the copies are XLA's layout assignment
    # around the attention fusions, not the user-level transpose. Removing
    # them requires replacing the whole chain (ops/attention_pallas.py
    # "packed" kernel), not rewriting the einsum.
    qh = q.reshape(B, Lq, num_heads, head_dim)
    kh = k.reshape(B, Lk, num_heads, head_dim)
    vh = v.reshape(B, Lk, num_heads, v_head_dim)

    # In bf16 compute mode the logits tensor — the dominant HBM traffic at
    # L>=195 — is STORED bf16 (MXU still accumulates f32 internally); the
    # softmax below upcasts element-wise inside its fusions, so no f32 copy
    # ever hits HBM. fp32 mode keeps f32 logits for bit-parity.
    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh * scale, kh, preferred_element_type=acc_t
    )
    if logit_bias is not None:
        logits = logits + logit_bias
    if pair_factors is not None:
        # outer-product pair masking (the reference's scrambled T2V pair mask,
        # see models/t2v.py): pair (q, k) of head (b, h) is disallowed when
        # BOTH factors flag it. Kept factored so no (B,h,Lq,Lk) tensor is
        # materialized — XLA fuses the broadcast into the logits elementwise.
        qf, kf = pair_factors
        logits = jnp.where(qf[..., :, None] & kf[..., None, :], NEG_INF, logits)
    if key_valid_mask is not None:
        logits = jnp.where(key_valid_mask[:, None, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh, preferred_element_type=acc_t)
    return out.reshape(B, Lq, Ev).astype(v.dtype)


def dispatch_attention_core(q, k, v, **kwargs):
    """Route to the Pallas fused kernel where it is measured to win
    (see mesm_tpu/kernels.py for the policy), else the XLA core.

    Kernels are inference-only: pallas_call carries no autodiff rule here,
    so non-deterministic (training) calls always take the XLA core, whose
    gradient XLA derives."""
    from mesm_tpu import kernels

    if kwargs.get("deterministic", True) and kernels.use_pallas_attention(
        q.shape[0], q.shape[1], k.shape[1], q.dtype
    ):
        from mesm_tpu.ops.attention_pallas import fused_attention

        return fused_attention(q, k, v, **kwargs)
    return attention_core(q, k, v, **kwargs)


class ProjAttention(nn.Module):
    """Multi-head attention with packed qkv in-projection + out-projection
    (torch nn.MultiheadAttention semantics, same-dim q/k/v).

    The packed kernel keeps the torch parameter layout (one (E, 3E) kernel)
    so checkpoint conversion is a single transpose.
    """

    num_heads: int
    dropout: float = 0.0
    # torch MHA defaults: xavier in-projection, Linear-default out kernel,
    # zero biases. Stacks that re-init with a global xavier pass (reference
    # transformer.py:78-81,168-171) pass out_kernel_init=xavier.
    out_kernel_init: Callable = torch_linear_kernel_init
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        key_valid_mask: Optional[jnp.ndarray] = None,
        logit_bias: Optional[jnp.ndarray] = None,
        pair_factors: Optional[tuple] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        E = q.shape[-1]
        # torch packs q/k/v projections in one (3E, E) weight; we keep (E, 3E).
        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (E, 3 * E), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,), jnp.float32)
        wq, wk, wv = jnp.split(in_kernel, 3, axis=1)
        bq, bk, bv = jnp.split(in_bias, 3)
        qp = q @ wq.astype(q.dtype) + bq.astype(q.dtype)
        kp = k @ wk.astype(k.dtype) + bk.astype(k.dtype)
        vp = v @ wv.astype(v.dtype) + bv.astype(v.dtype)
        dropout_rng = (
            self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        )
        out = dispatch_attention_core(
            qp,
            kp,
            vp,
            num_heads=self.num_heads,
            key_valid_mask=key_valid_mask,
            logit_bias=logit_bias,
            pair_factors=pair_factors,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        )
        out = nn.Dense(
            E,
            kernel_init=self.out_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out


class CoreAttention(nn.Module):
    """Projection-free attention: callers project q/k/v themselves; only the
    out-projection (vdim -> vdim, zero-init bias) lives here.

    Parity: reference model/attention.py:61-122 (q/k/v proj weights are None,
    out_proj = Linear(vdim, vdim) with bias zeroed at init :113-114).
    """

    num_heads: int
    dropout: float = 0.0
    out_kernel_init: Callable = torch_linear_kernel_init
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        key_valid_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        dropout_rng = (
            self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        )
        out = dispatch_attention_core(
            q,
            k,
            v,
            num_heads=self.num_heads,
            key_valid_mask=key_valid_mask,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        )
        Ev = v.shape[-1]
        out = nn.Dense(
            Ev,
            kernel_init=self.out_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out

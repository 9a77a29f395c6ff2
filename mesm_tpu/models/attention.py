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
    split_qk: Optional[tuple] = None,  # (q2 (B,Lq,E2), k2 (B,Lk,E2)): see below
) -> jnp.ndarray:
    """Multi-head attention core. Returns (B, Lq, Ev) BEFORE out-projection.

    Scaling uses head_dim of the *query* embedding, matching the reference
    (model/attention.py:281-286) — this matters for the decoder cross-attn,
    whose queries are 2*d_model wide.

    split_qk: the DAB decoder's cross-attn queries/keys are PER-HEAD concats
    of content and positional halves (reference transformer.py:759-789).
    Since <cat(qc_h, qp_h), cat(kc_h, kp_h)> = <qc_h, kc_h> + <qp_h, kp_h>,
    passing the positional half as split_qk=(q2, k2) computes identical
    logits from TWO plain dot products — no interleaved per-head concat, no
    2*d-wide tensors (the concat materialized as (B, L, 2d) copies,
    0.084 ms/batch in trace r3_sq). The scale stays the CONCAT convention:
    head_dim = (E + E2) // num_heads.
    """
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    E_total = E + (split_qk[0].shape[-1] if split_qk is not None else 0)
    head_dim = E_total // num_heads
    v_head_dim = Ev // num_heads
    scale = head_dim**-0.5

    # Head split via reshape only; the head axis rides as a dot batch dim.
    # Measured note: XLA emits the SAME program (same ~0.7 ms/step of layout
    # copies at the charades geometry) for this bqhd form and the explicit
    # transpose(0,2,1,3) form — the copies are XLA's layout assignment
    # around the attention fusions, not the user-level transpose. Removing
    # them requires replacing the whole chain (ops/attention_pallas.py
    # "packed" kernel), not rewriting the einsum.
    hd1 = E // num_heads
    qh = q.reshape(B, Lq, num_heads, hd1)
    kh = k.reshape(B, Lk, num_heads, hd1)
    vh = v.reshape(B, Lk, num_heads, v_head_dim)

    # In bf16 compute mode the logits tensor — the dominant HBM traffic at
    # L>=195 — is STORED bf16 (MXU still accumulates f32 internally); the
    # softmax below upcasts element-wise inside its fusions, so no f32 copy
    # ever hits HBM. fp32 mode keeps f32 logits for bit-parity.
    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh * scale, kh, preferred_element_type=acc_t
    )
    if split_qk is not None:
        q2, k2 = split_qk
        hd2 = q2.shape[-1] // num_heads
        logits = logits + jnp.einsum(
            "bqhd,bkhd->bhqk",
            q2.reshape(B, Lq, num_heads, hd2) * jnp.asarray(scale, q2.dtype),
            k2.reshape(B, Lk, num_heads, hd2),
            preferred_element_type=acc_t,
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


def attention_core_shortkey(
    q: jnp.ndarray,  # (B, Lq, E)
    k: jnp.ndarray,  # (B, Lk, E)  Lk small (t2v/enhance text keys)
    v: jnp.ndarray,  # (B, Lk, Ev)
    num_heads: int,
    key_valid_mask: Optional[jnp.ndarray] = None,
    pair_factors: Optional[tuple] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """attention_core re-formulated for SHORT key sequences (the t2v/enhance
    cross-attn sites: ~195 video queries x ~17 text keys).

    The standard bqhd,bkhd->bhqk einsum makes XLA canonicalize both operands
    to (B, H, L, hd) — at hd=32 that means lane-padded 4x-waste layouts and
    ~0.4 ms/batch of relayout copies around these sites (round-2 trace,
    BASELINE.md). Three Pallas kernels that kept per-head lane slices of the
    long query all measured net losses. Here ALL heads' logits come from ONE
    dense matmul instead: the keys are packed block-diagonally over heads
    into kp (B, E, H*Lk) — head h occupies key columns [h*Lk, (h+1)*Lk) and
    contributes only its hd-slice of E — so

        logits[b, q, h*Lk + j] = sum_d q[b, q, h*hd+d] * k[b, j, h*hd+d]

    is exactly the per-head logit, computed as (B,Lq,E) @ (B,E,H*Lk) with
    both operands in the model-native layout (no head transposes anywhere).
    The softmax normalizes each Lk-segment independently (grouped softmax —
    a fusion-internal reshape, not a layout change), and AV is one more
    dense matmul against the block-diagonal vp (B, H*Lk, Ev). Only the TINY
    k/v tensors get rearranged (17x256 each); the big query stream never
    leaves (B, L, E).

    Numerics match attention_core: same scale, finite NEG_INF masking (a
    fully-masked (b,h,q) row — possible under the scrambled pair mask —
    yields the same uniform-over-keys weights), f32 softmax, same dtype
    casts. Replaces reference model/attention.py:360-387 at these sites.
    """
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    H = num_heads
    hd = E // H
    hdv = Ev // H
    scale = hd**-0.5
    F = H * Lk

    # block-diagonal head packing of keys/values (tiny tensors)
    head_of_e = jnp.arange(E) // hd  # (E,)
    S = (head_of_e[:, None] == jnp.arange(H)[None, :]).astype(k.dtype)  # (E, H)
    kp = (k.transpose(0, 2, 1)[:, :, None, :] * S[None, :, :, None]).reshape(
        B, E, F
    )  # kp[b, e, h*Lk+j] = k[b, j, e] * [e in head h]
    head_of_ev = jnp.arange(Ev) // hdv
    T = (jnp.arange(H)[:, None] == head_of_ev[None, :]).astype(v.dtype)  # (H, Ev)
    vp = (v[:, None, :, :] * T[None, :, None, :]).reshape(B, F, Ev)

    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum(
        "bqe,bef->bqf", q * scale, kp, preferred_element_type=acc_t
    )  # (B, Lq, F)
    if pair_factors is not None:
        qf, kf = pair_factors  # (B, H, Lq), (B, H, Lk) bool
        qf_f = jnp.repeat(qf.transpose(0, 2, 1), Lk, axis=-1)  # (B, Lq, F)
        kf_f = kf.reshape(B, 1, F)
        logits = jnp.where(qf_f & kf_f, NEG_INF, logits)
    if key_valid_mask is not None:
        valid_f = jnp.tile(key_valid_mask, (1, H))[:, None, :]  # (B, 1, F)
        logits = jnp.where(valid_f, logits, NEG_INF)
    from mesm_tpu import kernels

    if kernels.SHORTKEY_VARIANT == "segmm":
        # Segment softmax WITHOUT the (B, Lq, H, Lk) reshape: subtract the
        # GLOBAL row max (softmax is invariant per segment; valid logits are
        # LN-bounded so cross-head exp(l - gmax) cannot underflow), then get
        # per-segment sums with one tiny matmul against the block indicator
        # and broadcast them back with its transpose — everything stays
        # (B, Lq, F). A segment whose keys are ALL masked (scrambled pair
        # mask) underflows to sum 0 and falls back to the reference's
        # uniform-over-keys weights explicitly. (Measured alternative: one
        # (F, F) block-diagonal-ones matmul doing sum+broadcast together
        # traced SLOWER — 4.213 vs 4.103 ms/batch, r3_segmm2 vs r3_segmm.)
        seg = jnp.repeat(jnp.eye(H, dtype=jnp.float32), Lk, axis=0)  # (F, H)
        l32 = logits.astype(jnp.float32)
        e = jnp.exp(l32 - jax.lax.stop_gradient(jnp.max(l32, axis=-1, keepdims=True)))
        sums = jnp.einsum("bqf,fh->bqh", e, seg)  # (B, Lq, H)
        sums_f = jnp.einsum("bqh,fh->bqf", sums, seg)
        weights = jnp.where(sums_f > 0.0, e / sums_f, 1.0 / Lk).astype(v.dtype)
    else:
        # grouped softmax: per-head max/sum over each Lk lane segment (the
        # reshape splits the minor axis only — fusion-internal in principle)
        l32 = logits.astype(jnp.float32).reshape(B, Lq, H, Lk)
        e = jnp.exp(l32 - jax.lax.stop_gradient(jnp.max(l32, axis=-1, keepdims=True)))
        weights = (
            (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(B, Lq, F).astype(v.dtype)
        )
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bqf,bfe->bqe", weights, vp, preferred_element_type=acc_t)
    return out.astype(v.dtype)


def attention_core_shortquery(
    q: jnp.ndarray,  # (B, Lq, E)  Lq small (SS-recon sentences, decoder queries)
    k: jnp.ndarray,  # (B, Lk, E)  Lk long (video)
    v: jnp.ndarray,  # (B, Lk, Ev)
    num_heads: int,
    key_valid_mask: Optional[jnp.ndarray] = None,
    pair_factors: Optional[tuple] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    split_qk: Optional[tuple] = None,  # (q2, k2) additive logits, see attention_core
) -> jnp.ndarray:
    """attention_core re-formulated for SHORT query sequences against LONG
    keys (SS-recon cross-attn: ~3 sentences x 194 video clips; decoder
    cross-attn: 10 anchors x 195 memory positions).

    The standard bqhd,bkhd->bhqk einsum head-splits the LONG key/value
    tensors into (B, H, Lk, hd), and XLA's layout assignment then flips the
    whole video stream feeding them into L-minor layouts — measured
    ~0.45 ms/batch of [128,194,256]{1,2,0} copies attributed to
    ss_reconstructor/*/cross_attn/reshape (trace r3_segmm). Here the TINY
    query is packed block-diagonally over heads into qp (B, P=H*Lq, E) —
    row h*Lq+q holds query q of head h in its head's E-slice — so

        logits[b, h*Lq+q, j] = sum_d q[b, q, h*hd+d] * k[b, j, h*hd+d]

    comes from ONE dense (B,P,E) x (B,Lk,E) contraction with k/v untouched
    in model-native layout. Each packed row is a COMPLETE softmax row (no
    segmentation), and AV is one dense matmul; the per-head output block is
    selected from the (B, H, Lq, Ev) view at tiny-Lq cost. Numerics match
    attention_core (finite NEG_INF masking -> uniform on fully-masked rows,
    f32 softmax, reference scale convention)."""
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    H = num_heads
    hd = E // H
    hdv = Ev // H
    E_total = E + (split_qk[0].shape[-1] if split_qk is not None else 0)
    scale = (E_total // H) ** -0.5
    P = H * Lq

    S = (jnp.arange(H)[:, None] == jnp.arange(E)[None, :] // hd).astype(q.dtype)  # (H, E)
    qp = (q[:, None, :, :] * S[None, :, None, :]).reshape(B, P, E)

    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum(
        "bpe,bke->bpk", qp * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=acc_t,
    )  # (B, P, Lk)
    if split_qk is not None:
        q2, k2 = split_qk
        E2 = q2.shape[-1]
        hd2 = E2 // H
        S2 = (jnp.arange(H)[:, None] == jnp.arange(E2)[None, :] // hd2).astype(q2.dtype)
        qp2 = (q2[:, None, :, :] * S2[None, :, None, :]).reshape(B, P, E2)
        logits = logits + jnp.einsum(
            "bpe,bke->bpk", qp2 * jnp.asarray(scale, q2.dtype), k2,
            preferred_element_type=acc_t,
        )
    if pair_factors is not None:
        qf, kf = pair_factors  # (B, H, Lq), (B, H, Lk) bool
        qf_r = qf.reshape(B, P, 1)
        kf_r = jnp.repeat(kf, Lq, axis=1)  # (B, P, Lk) — tiny row count
        logits = jnp.where(qf_r & kf_r, NEG_INF, logits)
    if key_valid_mask is not None:
        logits = jnp.where(key_valid_mask[:, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    outp = jnp.einsum("bpk,bke->bpe", weights, v, preferred_element_type=acc_t)
    T = (jnp.arange(H)[:, None] == jnp.arange(Ev)[None, :] // hdv).astype(v.dtype)
    out = jnp.einsum(
        "bhqe,he->bqe", outp.reshape(B, H, Lq, Ev), T, preferred_element_type=acc_t
    )  # select each output column's own-head block (tiny)
    return out.astype(v.dtype)


def _attention_core_remat(q, k, v, **kwargs):
    """jax.checkpoint'd attention core for the TRAINING path.

    The plain core's backward reloads the saved (B, H, Lq, Lk) probability
    (and keep-mask) tensors from HBM — 78 MB each at the flagship train
    geometry (64, 8, 195, 195) f32. Under jax.checkpoint the backward
    recomputes the logits→softmax(→dropout-mask) chain from the (B, L, E)
    inputs instead, trading ~0.02 ms of MXU recompute per site for those
    round-trips. Same rng key → identical dropout mask on recompute, so
    values and grads match the plain core (pinned by
    tests/test_attention.py::test_attn_remat_matches_plain). On-chip
    verdict: kernels.ATTN_REMAT."""
    statics = {
        n: kwargs.pop(n)
        for n in ("num_heads", "dropout_rate", "deterministic")
        if n in kwargs
    }
    arrays = {n: a for n, a in kwargs.items() if a is not None}

    @jax.checkpoint
    def core(q, k, v, arrays):
        return attention_core(q, k, v, **statics, **arrays)

    return core(q, k, v, arrays)


def dispatch_attention_core(q, k, v, **kwargs):
    """Route to the Pallas fused kernel where it is measured to win
    (see mesm_tpu/kernels.py for the policy), else the XLA core.

    Kernels are inference-only: pallas_call carries no autodiff rule here,
    so non-deterministic (training) calls always take the XLA core, whose
    gradient XLA derives."""
    from mesm_tpu import kernels

    det = kwargs.get("deterministic", True)
    dropout_inactive = det or kwargs.get("dropout_rate", 0.0) == 0.0
    has_split = kwargs.get("split_qk") is not None
    if (not has_split) and dropout_inactive and kernels.use_pallas_attention(
        q.shape[0], q.shape[1], k.shape[1], q.dtype
    ):
        if det:
            from mesm_tpu.ops.attention_pallas import fused_attention

            return fused_attention(q, k, v, **kwargs)
        if kwargs.get("logit_bias") is None:
            # training (grad) path: custom_vjp wrapper — kernel forward,
            # flash-style XLA-recompute backward
            from mesm_tpu.ops.attention_pallas import fused_attention_trainable

            return fused_attention_trainable(
                q, k, v, kwargs["num_heads"],
                kwargs.get("key_valid_mask"), kwargs.get("pair_factors"),
            )
    if (not has_split) and kwargs.get("logit_bias") is None and kernels.use_shortkey_packed(
        q.shape[0], q.shape[1], k.shape[1], q.dtype, deterministic=det
    ):
        sk_kwargs = {key: val for key, val in kwargs.items() if key != "logit_bias"}
        no_dropout = sk_kwargs.get("dropout_rate", 0.0) == 0.0 or sk_kwargs.get(
            "deterministic", True
        )
        if kernels.SHORTKEY_VARIANT == "kernel" and no_dropout:
            from mesm_tpu.ops.attention_pallas import fused_attention_shortkey

            return fused_attention_shortkey(
                q, k, v,
                num_heads=sk_kwargs["num_heads"],
                key_valid_mask=sk_kwargs.get("key_valid_mask"),
                pair_factors=sk_kwargs.get("pair_factors"),
                interpret=jax.default_backend() == "cpu",
            )
        return attention_core_shortkey(q, k, v, **sk_kwargs)
    if kwargs.get("logit_bias") is None and kernels.use_shortquery_packed(
        q.shape[0], q.shape[1], k.shape[1], q.dtype, deterministic=det
    ):
        sq_kwargs = {key: val for key, val in kwargs.items() if key != "logit_bias"}
        return attention_core_shortquery(q, k, v, **sq_kwargs)
    if kernels.use_attn_remat(q.shape[1], k.shape[1], deterministic=det):
        return _attention_core_remat(q, k, v, **kwargs)
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
        split_qk: Optional[tuple] = None,
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
            split_qk=split_qk,
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

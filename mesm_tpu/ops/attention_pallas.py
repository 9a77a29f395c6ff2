"""Fused multi-head attention Pallas kernel.

Replaces the reference's unfused bmm -> masked_fill -> softmax -> bmm chain
(reference model/attention.py:360-387). At MESM's geometry (L <= 600,
head_dim 32/64) the whole per-(sample, head) attention fits in VMEM, so the
kernel computes QK^T, masking, the max-subtracted softmax and the AV product
in one pass — the (B, H, Lq, Lk) logits tensor never round-trips to HBM,
which is the dominant cost of the unfused path at these sizes.

Numerics match ops/attention.attention_core exactly (same scale convention:
head_dim of the query embedding; same finite -1e9 masking; fp32 logits).

Scope: the no-dropout, no-additive-bias case (the eval/serving hot path and
the CLIP tower use it; training attention-dropout falls back to the XLA core
via models/attention.dispatch_attention_core).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Below this logits area, per-block kernel overhead beats the HBM savings and
# the XLA core wins (measured on v5e: the model's 10x195 decoder and 195x17
# t2v sites regress under the kernel). Tune per generation if needed.
MIN_FUSED_LQ = 64
MIN_FUSED_LK = 64

# Which kernel layout fused_attention uses (see the four _mha_kernel_*):
# "batched" = sample-tiled batched dots over (B,H,L,hd) operands (v3);
# "packed" = sample-tiled, heads split in-kernel from (B,L,E) operands (v4).
# Env override MESM_ATTN_VARIANT for experiments.
import os as _os

DEFAULT_VARIANT = _os.environ.get("MESM_ATTN_VARIANT", "batched")


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (Lq, hd)
    k = k_ref[0, 0]  # (Lk, hd)
    v = v_ref[0, 0]  # (Lk, hdv)
    m = mask_ref[0]  # (1, Lk) float, 1 = attendable (broadcasts over Lq)

    logits = jax.lax.dot_general(
        (q * scale).astype(jnp.float32),
        k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lq, Lk)
    logits = jnp.where(m > 0, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _mha_kernel_allheads(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, heads: int):
    """v2 layout: one grid step per SAMPLE computes all heads (8x fewer grid
    steps than the per-(sample, head) kernel; heads unrolled statically)."""
    m = mask_ref[0]  # (1, Lk)
    for h in range(heads):
        q = q_ref[0, h]  # (Lq, hd)
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            (q * scale).astype(jnp.float32),
            k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(m > 0, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_kernel_batched(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """v3 layout: one grid step per (sample-tile, head). Batched dots over NB
    samples amortize per-block overhead ~NB-fold vs the per-(sample, head)
    grid, and the VPU softmax vectorizes over the whole (NB, Lq, Lk) tile."""
    q = q_ref[:, 0]  # (NB, Lq, hd)
    k = k_ref[:, 0]  # (NB, Lk, hd)
    v = v_ref[:, 0]  # (NB, Lk, hdv)
    m = mask_ref[:, 0]  # (NB, Lk) float, 1 = attendable

    logits = jax.lax.dot_general(
        (q * scale).astype(jnp.float32),
        k.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NB, Lq, Lk)
    logits = jnp.where(m[:, None, :] > 0, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o_ref[:, 0] = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _mha_kernel_packed(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, heads: int):
    """v4 "packed" layout: blocks stay in the model's native (NB, L, E)
    shape — the head split happens INSIDE the kernel as 32-lane slices, so
    XLA never materializes a (B, H, L, hd) transpose around the custom call
    (the copies cost ~0.3 ms/step at the charades geometry, and the
    transposed operands force layout churn on neighbouring fusions).
    Logits are f32 in VMEM and never touch HBM."""
    q = q_ref[...]  # (NB, Lq, E)
    k = k_ref[...]  # (NB, Lk, E)
    v = v_ref[...]  # (NB, Lk, Ev)
    # mask rides as (NB, 1, Lk) so its block's last two dims satisfy the
    # Mosaic (8,128)-or-full rule at any NB; it broadcasts over Lq as-is
    m = mask_ref[...]  # (NB, 1, Lk) float, 1 = attendable
    E = q.shape[-1]
    Ev = v.shape[-1]
    hd = E // heads
    hdv = Ev // heads
    outs = []
    for h in range(heads):
        qh = (q[:, :, h * hd:(h + 1) * hd] * jnp.asarray(scale, q.dtype))
        kh = k[:, :, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            # Mosaic requires a 32-bit matmul accumulator; for bf16 inputs
            # the result is immediately rounded to bf16 storage — the same
            # precision as the XLA chain's bf16-stored logits — so the
            # softmax below runs at the VPU's 2x bf16 element rate. The
            # kernel is softmax-VPU-bound (~16 of 17 us per grid step), so
            # this is the dominant in-kernel lever. fp32 inputs keep f32.
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)  # (NB, Lq, Lk)
        logits = jnp.where(m > 0, logits, jnp.asarray(NEG_INF, logits.dtype))
        p = _softmax_lastdim(logits).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v[:, :, h * hdv:(h + 1) * hdv],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _softmax_lastdim(logits):
    """Max-subtracted softmax in the logits' own dtype, with an f32 sum.

    For bf16 logits this runs the max/exp elementwise stages at the VPU's
    2x bf16 rate; the denominator accumulates in f32 (195 terms of <= 1.0,
    bf16-rounded — matches the XLA chain's bf16-stored-logits numerics)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    return e / s.astype(e.dtype)


def _mha_kernel_packed_pair(
    q_ref, k_ref, v_ref, mask_ref, qf_ref, kf_ref, o_ref, *, scale: float, heads: int
):
    """Packed layout + the factored pair mask (models/t2v.py
    scrambled_pair_factors): pair (q, k) of head (b, h) is disallowed when
    BOTH factors flag it. Factors arrive HEAD-MAJOR as (H, NB, 1, L) floats
    (1 = flagged) so the per-head load indexes the leading axis (Mosaic
    lowers middle-axis integer indexing to an unsupported >2D gather) and
    the blocks' last two dims are (1, L) = full at any NB; the (Lq, Lk)
    outer product lives only in VMEM."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    m = mask_ref[...]  # (NB, 1, Lk)
    E = q.shape[-1]
    Ev = v.shape[-1]
    hd = E // heads
    hdv = Ev // heads
    outs = []
    for h in range(heads):
        qh = q[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        kh = k[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        qfh = qf_ref[h].reshape(q.shape[0], -1, 1)  # (NB,1,Lq) -> (NB,Lq,1)
        kfh = kf_ref[h]  # (NB, 1, Lk), broadcasts over Lq
        dis = (qfh > 0) & (kfh > 0)
        logits = jnp.where(dis, NEG_INF, logits)
        logits = jnp.where(m > 0, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                p, v[:, :, h * hdv:(h + 1) * hdv],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _mha_kernel_packed_shortkey(
    q_ref, k_ref, v_ref, mask_ref, qf_ref, kf_ref, o_ref, *, scale: float, heads: int
):
    """Packed layout for SHORT KEY sequences (t2v/enhance cross-attn: 195
    video queries x 17 text keys). The straightforward layout lane-pads Lk
    to 128 (7.5x VPU waste on the softmax — measured net loss); here the
    logits live TRANSPOSED as (NB, Lk, Lq) so the long query axis fills the
    lanes and the softmax reduces over the short sublane axis. Optional
    factored pair mask as in _mha_kernel_packed_pair."""
    q = q_ref[...]  # (NB, Lq, E)
    k = k_ref[...]  # (NB, Lk, E)
    v = v_ref[...]  # (NB, Lk, Ev)
    NB, Lk = k.shape[0], k.shape[1]
    mT = mask_ref[...].reshape(NB, Lk, 1)  # (NB,1,Lk) -> (NB,Lk,1)
    E = q.shape[-1]
    Ev = v.shape[-1]
    hd = E // heads
    hdv = Ev // heads
    outs = []
    for h in range(heads):
        qh = q[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        kh = k[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logitsT = jax.lax.dot_general(
            kh, qh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (NB, Lk, Lq)
        if qf_ref is not None:
            qfh = qf_ref[h]  # (NB, 1, Lq), broadcasts over Lk rows
            kfh = kf_ref[h].reshape(NB, Lk, 1)
            logitsT = jnp.where((qfh > 0) & (kfh > 0), NEG_INF, logitsT)
        logitsT = jnp.where(mT > 0, logitsT, NEG_INF)
        pT = jax.nn.softmax(logitsT, axis=1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                pT, v[:, :, h * hdv:(h + 1) * hdv],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (NB, Lq, hdv)
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _shortkey_nopair(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, heads: int):
    _mha_kernel_packed_shortkey(
        q_ref, k_ref, v_ref, mask_ref, None, None, o_ref, scale=scale, heads=heads
    )


def _mha_kernel_shortkey_onematmul(
    q_ref, kp_ref, vp_ref, valid_ref, qf_ref, kf_ref, o_ref, *, scale: float,
    heads: int, lk: int
):
    """v5 "one-matmul" short-key kernel (t2v/enhance sites: ~195 q x ~17 k).

    ALL heads' logits come from ONE dense matmul against the block-diagonally
    head-packed keys kp (E, F=H*Lk) — logits[q, h*Lk+j] is head h's logit —
    so there are no per-head lane slices anywhere (the measured blocker of
    the three round-2 short-key kernels). The segmented softmax subtracts the
    GLOBAL row max (per-segment softmax is shift-invariant; a fully-masked
    segment underflows to sum 0 and takes the reference's uniform-over-keys
    fallback), gets per-segment sums with two thin MXU matmuls against the
    segment indicator, and AV is one dense matmul against the packed values
    vp (F, Ev). Operands stay model-native (B, L, E)-shaped at the custom
    call, which also pins XLA to standard {2,1,0} layouts at the boundary —
    the XLA-side chain otherwise flips the whole video stream L-minor
    (measured ~0.45 ms/batch of copies, traces/r3_segmm)."""
    q = q_ref[...]  # (NB, Lq, E)
    kp = kp_ref[...]  # (NB, E, F)
    vp = vp_ref[...]  # (NB, F, Ev)
    valid = valid_ref[...]  # (NB, 1, F) f32, 1 = attendable
    NB, Lq, E = q.shape
    F = kp.shape[-1]
    H = heads

    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), kp,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NB, Lq, F) f32
    if qf_ref is not None:
        # expand qf (NB, Lq, H) to lanes via a thin matmul with the segment
        # indicator; pair (q, f) is disallowed iff qf & kf
        expand = (
            jax.lax.broadcasted_iota(jnp.int32, (H, F), 1) // lk
            == jax.lax.broadcasted_iota(jnp.int32, (H, F), 0)
        ).astype(jnp.float32)
        qf_f = jax.lax.dot_general(
            qf_ref[...], expand,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NB, Lq, F)
        dis = (qf_f > 0) & (kf_ref[...] > 0)
        logits = jnp.where(dis, NEG_INF, logits)
    logits = jnp.where(valid > 0, logits, NEG_INF)

    gmax = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - gmax)  # fully-masked rows underflow to exactly 0
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // lk
        == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1)
    ).astype(jnp.float32)
    sums = jax.lax.dot_general(
        e, seg, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (NB, Lq, H)
    sums_f = jax.lax.dot_general(
        sums, seg, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (NB, Lq, F)
    p = jnp.where(sums_f > 0.0, e / sums_f, 1.0 / lk).astype(vp.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, vp, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _shortkey_onematmul_nopair(q_ref, kp_ref, vp_ref, valid_ref, o_ref, *, scale, heads, lk):
    _mha_kernel_shortkey_onematmul(
        q_ref, kp_ref, vp_ref, valid_ref, None, None, o_ref,
        scale=scale, heads=heads, lk=lk,
    )


def _shortkey_onematmul_tile(B, Lq, E, F, Ev, itemsize):
    """Largest divisor of B fitting the one-matmul kernel's VMEM set: q/kp/
    vp/o at model dtype + ~3 (Lq, F) f32 softmax temps per sample."""
    pad128 = lambda n: -128 * (-n // 128)
    per_sample = (
        (Lq * E + E * pad128(F) + pad128(F) * Ev + Lq * Ev) * itemsize
        + Lq * pad128(F) * 4 * 3
    )
    cap = max(1, int(10e6 // per_sample))
    for nb in range(min(cap, 8, B), 0, -1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention_shortkey(
    q, k, v, num_heads: int, key_valid_mask=None, pair_factors=None,
    interpret: bool = False,
):
    """Host wrapper for the v5 one-matmul short-key kernel: packs k/v
    block-diagonally over heads on the XLA side (tiny tensors — measured
    0.015 ms/batch per site, traces/r3_segmm) and launches the kernel on
    model-native (B, L, E) operands. pair_factors as in attention_core:
    ((B,H,Lq), (B,H,Lk)) bool."""
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    H = num_heads
    hd, hdv = E // H, Ev // H
    scale = hd**-0.5
    F = H * Lk

    S = (jnp.arange(E)[:, None] // hd == jnp.arange(H)[None, :]).astype(k.dtype)
    kp = (k.transpose(0, 2, 1)[:, :, None, :] * S[None, :, :, None]).reshape(B, E, F)
    T = (jnp.arange(H)[:, None] == jnp.arange(Ev)[None, :] // hdv).astype(v.dtype)
    vp = (v[:, None, :, :] * T[None, :, None, :]).reshape(B, F, Ev)
    if key_valid_mask is None:
        valid = jnp.ones((B, 1, F), jnp.float32)
    else:
        valid = jnp.tile(key_valid_mask.astype(jnp.float32), (1, H)).reshape(B, 1, F)

    NB = _shortkey_onematmul_tile(B, Lq, E, F, Ev, q.dtype.itemsize)
    cost = pl.CostEstimate(
        flops=2 * B * Lq * F * (E + Ev + 2 * H),
        bytes_accessed=q.dtype.itemsize * B * (Lq * E + E * F + F * Ev + Lq * Ev),
        transcendentals=B * Lq * F,
    )
    in_specs = [
        pl.BlockSpec((NB, Lq, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, E, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, F, Ev), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, 1, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = (q, kp, vp, valid)
    if pair_factors is not None:
        qf, kf = pair_factors
        qfT = qf.astype(jnp.float32).transpose(0, 2, 1)  # (B, Lq, H)
        kf_f = kf.astype(jnp.float32).reshape(B, 1, F)
        in_specs += [
            pl.BlockSpec((NB, Lq, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands += (qfT, kf_f)
        kernel = functools.partial(
            _mha_kernel_shortkey_onematmul, scale=scale, heads=H, lk=Lk
        )
    else:
        kernel = functools.partial(
            _shortkey_onematmul_nopair, scale=scale, heads=H, lk=Lk
        )
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NB, Lq, Ev), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, Ev), v.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


def _packed_batch_tile(B: int, Lq: int, Lk: int, E: int, Ev: int, itemsize: int) -> int:
    """Largest divisor of B fitting the packed kernel's VMEM working set:
    q/k/v/o blocks at model dtype + one head's f32 logits and softmax temp."""
    per_sample = (
        (Lq * E + Lk * E + Lk * Ev + Lq * Ev) * itemsize  # q, k, v, o blocks
        + -8 * (-Lq // 8) * -128 * (-Lk // 128) * 4 * 2   # f32 logits + temp
    )
    cap = max(1, int(10e6 // per_sample))
    for nb in range(min(cap, 8, B), 0, -1):
        if B % nb == 0:
            return nb
    return 1


def _batch_tile(B: int, Lq: int, Lk: int) -> int:
    """Largest divisor of B whose (NB, Lq, Lk) f32 logits tile (padded to the
    (8, 128) tiling, with ~2x headroom for softmax temporaries) fits the 16MB
    scoped-VMEM budget. Measured: NB=16 at 195x195 and NB=8 at 601x601 both
    OOM; NB=8 at 195x195 lowers and runs."""
    pad8 = lambda n: -8 * (-n // 8)
    pad128 = lambda n: -128 * (-n // 128)
    tile_bytes = pad8(Lq) * pad128(Lk) * 4 * 2
    cap = max(1, int(8e6 // tile_bytes))
    for nb in range(min(cap, 8, B), 0, -1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "variant"))
def _fused_attention_impl(
    q, k, v, mask, num_heads: int, interpret: bool, variant: str = "per_head",
    qf=None, kf=None,
):
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    H = num_heads
    hd, hdv = E // H, Ev // H
    scale = hd**-0.5

    if variant == "packed":
        # operands keep the model-native (B, L, E) shape: no (B,H,L,hd)
        # transpose at the custom-call boundary
        NB = _packed_batch_tile(B, Lq, Lk, E, Ev, q.dtype.itemsize)
        cost = pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * (hd + hdv),
            bytes_accessed=q.dtype.itemsize
            * B * (Lq * E + Lk * E + Lk * Ev + Lq * Ev),
            transcendentals=B * H * Lq * Lk,
        )
        in_specs = [
            pl.BlockSpec((NB, Lq, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, Lk, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, Lk, Ev), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1, Lk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands = (q, k, v, mask.reshape(B, 1, Lk))
        # short key sequences take the transposed-logits kernel (long query
        # axis on lanes); long keys the straight layout
        shortkey = Lk < MIN_FUSED_LK
        if qf is not None:
            body = _mha_kernel_packed_shortkey if shortkey else _mha_kernel_packed_pair
            kernel = functools.partial(body, scale=scale, heads=H)
            in_specs += [
                pl.BlockSpec((H, NB, 1, Lq), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, NB, 1, Lk), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM),
            ]
            operands += (qf.reshape(H, B, 1, Lq), kf.reshape(H, B, 1, Lk))
        else:
            body = _shortkey_nopair if shortkey else _mha_kernel_packed
            kernel = functools.partial(body, scale=scale, heads=H)
        return pl.pallas_call(
            kernel,
            grid=(B // NB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (NB, Lq, Ev), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, Lq, Ev), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)

    qh = q.reshape(B, Lq, H, hd).transpose(0, 2, 1, 3)  # (B,H,Lq,hd)
    kh = k.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lk, H, hdv).transpose(0, 2, 1, 3)
    # Mosaic requires the last two block dims to be (8,128)-divisible or equal
    # to the array dims; a (B, 1, Lk) mask with (1, 1, Lk) blocks satisfies it.
    mask3 = mask.reshape(B, 1, Lk)

    cost = pl.CostEstimate(
        flops=2 * B * H * Lq * Lk * (hd + hdv),
        bytes_accessed=4 * B * H * (Lq * hd + Lk * hd + Lk * hdv + Lq * hdv),
        transcendentals=B * H * Lq * Lk,
    )
    if variant == "batched":
        NB = _batch_tile(B, Lq, Lk)
        mask_bh = mask.reshape(B, 1, Lk)
        out = pl.pallas_call(
            functools.partial(_mha_kernel_batched, scale=scale),
            grid=(B // NB, H),
            in_specs=[
                pl.BlockSpec((NB, 1, Lq, hd), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, 1, Lk, hd), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, 1, Lk, hdv), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, 1, Lk), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (NB, 1, Lq, hdv), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Lq, hdv), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qh, kh, vh, mask_bh)
    elif variant == "all_heads":
        out = pl.pallas_call(
            functools.partial(_mha_kernel_allheads, scale=scale, heads=H),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Lq, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Lk, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Lk, hdv), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, H, Lq, hdv), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Lq, hdv), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qh, kh, vh, mask3)
    else:
        out = pl.pallas_call(
            functools.partial(_mha_kernel, scale=scale),
            grid=(B, H),
            in_specs=[
                pl.BlockSpec((1, 1, Lq, hd), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk, hd), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk, hdv), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, Lq, hdv), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Lq, hdv), v.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qh, kh, vh, mask3)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, Ev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_trainable(q, k, v, num_heads, key_valid_mask=None, pair_factors=None):
    """Differentiable wrapper over the fused kernel (flash-style remat VJP).

    pallas_call carries no autodiff rule, so the kernel was inference-only
    through round 2 (kernels.py). This wrapper gives it one: the FORWARD runs
    the measured-fastest path (fused_attention, which itself dispatches
    kernel vs XLA by shape), and the BACKWARD recomputes the XLA core under
    jax.vjp from the saved (q, k, v, mask) residuals — standard
    flash-attention rematerialization. Gradients are exactly the XLA core's
    (tests/test_attention.py grad-parity), and the (B, H, Lq, Lk) attention
    weights are never stored between forward and backward. Dropout is the
    caller's problem: only dropout-free attention may route here
    (models/attention.dispatch_attention_core)."""
    return fused_attention(
        q, k, v, num_heads=num_heads, key_valid_mask=key_valid_mask,
        pair_factors=pair_factors,
    )


def _fat_fwd(q, k, v, num_heads, key_valid_mask=None, pair_factors=None):
    out = fused_attention(
        q, k, v, num_heads=num_heads, key_valid_mask=key_valid_mask,
        pair_factors=pair_factors,
    )
    return out, (q, k, v, key_valid_mask, pair_factors)


def _fat_bwd(num_heads, res, g):
    from ..models.attention import attention_core

    q, k, v, mask, pair = res

    def f(q, k, v):
        return attention_core(
            q, k, v, num_heads=num_heads, key_valid_mask=mask, pair_factors=pair
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


fused_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_valid_mask: Optional[jnp.ndarray] = None,
    logit_bias: Optional[jnp.ndarray] = None,
    pair_factors: Optional[tuple] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
) -> jnp.ndarray:
    """Drop-in for models/attention.attention_core. Falls back to the XLA core
    when attention dropout is active or an additive bias is supplied. The
    factored pair mask (t2v sites) is supported by the packed variant; other
    variants fall back."""
    # variant by dtype, matching the measured policy in mesm_tpu/kernels.py:
    # bf16 -> v4 packed (wins from L=195); fp32 -> v3 batched (long only)
    variant = _os.environ.get("MESM_ATTN_VARIANT") or (
        "packed" if q.dtype == jnp.bfloat16 else "batched"
    )
    # the packed variant tolerates short KEY sequences (its VPU tiles pad Lk
    # to a lane group either way); the (B,H,L,hd)-layout variants need both
    # sides above the lowering minimum
    small = q.shape[1] < MIN_FUSED_LQ or k.shape[1] < (
        8 if variant == "packed" else MIN_FUSED_LK
    )
    if (
        (dropout_rate > 0.0 and not deterministic)
        or logit_bias is not None
        or (pair_factors is not None and variant != "packed")
        or small
    ):
        from ..models.attention import attention_core

        return attention_core(
            q, k, v,
            num_heads=num_heads,
            key_valid_mask=key_valid_mask,
            logit_bias=logit_bias,
            pair_factors=pair_factors,
            dropout_rate=dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        )
    B, Lk = k.shape[0], k.shape[1]
    if key_valid_mask is None:
        mask = jnp.ones((B, Lk), jnp.float32)
    else:
        mask = key_valid_mask.astype(jnp.float32)
    qf = kf = None
    if pair_factors is not None:
        # head-major (H, B, L): the kernel indexes heads on the leading axis
        qf = pair_factors[0].astype(jnp.float32).transpose(1, 0, 2)
        kf = pair_factors[1].astype(jnp.float32).transpose(1, 0, 2)
    interpret = jax.default_backend() == "cpu"
    return _fused_attention_impl(
        q, k, v, mask, num_heads, interpret, variant, qf, kf
    )

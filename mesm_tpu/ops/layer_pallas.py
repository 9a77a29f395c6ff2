"""Fused transformer-layer Pallas kernel for the video stream (eval path).

One pallas_call computes a WHOLE post-norm transformer layer on the running
(B, L, D) stream: qkv projections -> multi-head attention (packed head
split, optional scrambled pair mask) -> out projection -> residual ->
LayerNorm -> FFN (PReLU) -> residual -> LayerNorm. Replaces the reference's
per-op chain (reference model/transformer.py:485-559 T2V layer,
:615-673 encoder layer) with a single VMEM-resident pass.

Why built: at the charades eval geometry the XLA chain spends more on layout
copies around the attention einsums and on LayerNorm-stat reduction fusions
than on matmuls (trace evidence in BASELINE.md). Keeping the whole layer in
VMEM removes every intermediate HBM round-trip; the only HBM traffic left is
the stream in/out, the (small) text keys, and the weights.

MEASURED NEGATIVE RESULT (v5e, bf16, scripts/bench_layer_kernel.py, 32
chained layers/dispatch): the monolithic kernel LOSES to the XLA chain at
the charades geometry — encoder 0.851 vs 0.697 ms/layer (1.069 before the
merged-leading-dims dot fix below), t2v 1.104 vs 0.493. The HBM traffic the
fusion saves is smaller than what Mosaic gives up in MXU/VPU overlap across
the layer's mixed matmul/softmax/LN phases, which XLA's op-level pipeline
keeps busy concurrently. Kept (with flax-parity tests in
tests/test_layer_kernel.py) as the measured record and for possible
long-sequence geometries; NOT wired into any dispatch path.

Two layer flavors, selected by `self_attn`:
  - encoder (self-attn, reference :615-673):
      q = k = x + pos ; v = x
      x1 = x + attn ; s = LN1(x1) ; out = LN2(s + FFN(s))
  - t2v (cross-attn, reference :485-559):
      q = x + pos ; k, v from text (k includes pos_txt)
      x1 = x + attn ; out = LN2(x1 + FFN(LN1(x1)))

Numerics: dots accumulate f32 and round to the stream dtype exactly like the
XLA path; LayerNorm stats in f32 (flax _compute_stats upcasts too); softmax
f32. Eval-only (no dropout, no autodiff rule) — the dispatch in
models/{detr,t2v}.py gates on `deterministic`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LN_EPS = 1e-5


def _layernorm(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dot2(x, w, b):
    """(NB, L, Din) @ (Din, Dout) + b with f32 accumulation, stream dtype out.

    Leading dims are merged first so Mosaic issues ONE (NB*L, Din) matmul
    instead of NB separate L-row ones (pipeline-fill overhead per dot)."""
    NB, L, Din = x.shape
    y = jax.lax.dot_general(
        x.reshape(NB * L, Din), w.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype).reshape(NB, L, -1)


def _attention(qp, kp, vp, m, qf, kf, heads, scale):
    """Packed-head attention on projected (NB, L, D) tensors; optional pair
    factors arrive head-major (H, NB, 1, L), mask as (NB, 1, Lk) — unit dims
    keep every block's last two dims Mosaic-legal at any NB, and broadcast
    against the (NB, Lq, Lk) logits directly. Returns (NB, Lq, D)."""
    D = qp.shape[-1]
    hd = D // heads
    outs = []
    for h in range(heads):
        qh = qp[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        kh = kp[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if qf is not None:
            qfh = qf[h].reshape(qp.shape[0], -1, 1)  # (NB,1,Lq) -> (NB,Lq,1)
            dis = (qfh > 0) & (kf[h] > 0)
            logits = jnp.where(dis, NEG_INF, logits)
        logits = jnp.where(m > 0, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1).astype(vp.dtype)
        outs.append(
            jax.lax.dot_general(
                p, vp[:, :, h * hd:(h + 1) * hd],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=-1).astype(qp.dtype)


def _stream_layer_kernel(
    # operands (refs); pair refs present only when has_pair
    *refs,
    heads: int,
    self_attn: bool,
    has_pair: bool,
):
    if has_pair:
        (x_ref, pos_ref, k_ref, v_ref, m_ref, qf_ref, kf_ref,
         wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
         ln1s_ref, ln1b_ref, w1_ref, b1_ref, alpha_ref, w2_ref, b2_ref,
         ln2s_ref, ln2b_ref, o_ref) = refs
    else:
        (x_ref, pos_ref, k_ref, v_ref, m_ref,
         wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
         ln1s_ref, ln1b_ref, w1_ref, b1_ref, alpha_ref, w2_ref, b2_ref,
         ln2s_ref, ln2b_ref, o_ref) = refs
        qf_ref = kf_ref = None

    x = x_ref[...]  # (NB, Lq, D)
    q_in = x + pos_ref[...].astype(x.dtype)
    if self_attn:
        k_in, v_in = q_in, x
    else:
        k_in = k_ref[...]
        v_in = v_ref[...]
    D = x.shape[-1]
    scale = (D // heads) ** -0.5

    qp = _dot2(q_in, wq_ref[...], bq_ref[...])
    kp = _dot2(k_in, wk_ref[...], bk_ref[...])
    vp = _dot2(v_in, wv_ref[...], bv_ref[...])
    qf = qf_ref[...] if qf_ref is not None else None
    kf = kf_ref[...] if kf_ref is not None else None
    attn = _attention(qp, kp, vp, m_ref[...], qf, kf, heads, scale)
    attn = _dot2(attn, wo_ref[...], bo_ref[...])

    x1 = x + attn

    def ffn(s):
        h = _dot2(s, w1_ref[...], b1_ref[...]).astype(jnp.float32)
        a = alpha_ref[0, 0].astype(jnp.float32)
        h = (jnp.maximum(h, 0) + a * jnp.minimum(h, 0)).astype(x.dtype)
        return _dot2(h, w2_ref[...], b2_ref[...])

    if self_attn:  # encoder: the stream itself is normalized after attention
        s = _layernorm(x1, ln1s_ref[...], ln1b_ref[...])
        out = _layernorm(s + ffn(s), ln2s_ref[...], ln2b_ref[...])
    else:  # t2v: LN1 feeds only the FFN branch
        s = _layernorm(x1, ln1s_ref[...], ln1b_ref[...])
        out = _layernorm(x1 + ffn(s), ln2s_ref[...], ln2b_ref[...])
    o_ref[...] = out.astype(o_ref.dtype)


def _nb_tile(B: int, Lq: int, Lk: int, D: int, F: int, itemsize: int) -> int:
    """Largest divisor of B whose working set fits the VMEM budget."""
    pad8 = lambda n: -8 * (-n // 8)
    pad128 = lambda n: -128 * (-n // 128)
    per_sample = (
        itemsize * Lq * D * 8           # x, q_in, qp, vp-ish, attn, x1, s, out
        + itemsize * Lk * D * 3         # k_in, kp, vp
        + itemsize * Lq * F             # ffn hidden
        + pad8(Lq) * pad128(Lk) * 4 * 2  # f32 logits + softmax temp (per head)
    )
    weights = itemsize * (4 * D * D + 2 * D * F)
    cap = max(1, int((10e6 - weights) // per_sample))
    for nb in range(min(cap, 8, B), 0, -1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(
    jax.jit, static_argnames=("heads", "self_attn", "interpret")
)
def fused_stream_layer(
    x: jnp.ndarray,            # (B, Lq, D) running stream
    pos: jnp.ndarray,          # (B, Lq, D) query positional term
    k_in: Optional[jnp.ndarray],   # (B, Lk, D) keys incl. pos (t2v) | None (self)
    v_in: Optional[jnp.ndarray],   # (B, Lk, D) values (t2v) | None (self)
    mask: jnp.ndarray,         # (B, Lk) float, 1 = attendable
    pair_qf: Optional[jnp.ndarray],  # (H, B, Lq) float | None
    pair_kf: Optional[jnp.ndarray],  # (H, B, Lk) float | None
    params: dict,              # wq,bq,wk,bk,wv,bv,wo,bo,ln1s,ln1b,w1,b1,alpha,w2,b2,ln2s,ln2b
    heads: int,
    self_attn: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Lq, D = x.shape
    if self_attn:
        # dummy 1-length key operands keep the operand list static; unused
        k_in = jnp.zeros((B, 1, D), x.dtype)
        v_in = jnp.zeros((B, 1, D), x.dtype)
    Lk = mask.shape[1]
    F = params["w1"].shape[1]
    has_pair = pair_qf is not None
    NB = _nb_tile(B, Lq, Lk, D, F, x.dtype.itemsize)

    bspec = lambda *shape_map: pl.BlockSpec(
        shape_map[0], shape_map[1], memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs = [
        bspec((NB, Lq, D), lambda b: (b, 0, 0)),            # x
        bspec((NB, Lq, D), lambda b: (b, 0, 0)),            # pos
        bspec((NB, k_in.shape[1], D), lambda b: (b, 0, 0)),  # k_in
        bspec((NB, v_in.shape[1], D), lambda b: (b, 0, 0)),  # v_in
        bspec((NB, 1, Lk), lambda b: (b, 0, 0)),            # mask
    ]
    operands = [x, pos, k_in, v_in, mask.reshape(B, 1, Lk)]
    if has_pair:
        H = heads
        in_specs += [
            bspec((H, NB, 1, Lq), lambda b: (0, b, 0, 0)),
            bspec((H, NB, 1, Lk), lambda b: (0, b, 0, 0)),
        ]
        operands += [pair_qf.reshape(H, B, 1, Lq), pair_kf.reshape(H, B, 1, Lk)]
    w_order = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
               "ln1s", "ln1b", "w1", "b1", "alpha", "w2", "b2", "ln2s", "ln2b"]
    for name in w_order:
        arr = params[name]
        if arr.ndim == 1:  # vectors as (1, N) rows — Mosaic wants >= 2D blocks
            arr = arr.reshape(1, -1)
        in_specs.append(full(arr))
        operands.append(arr)

    cost = pl.CostEstimate(
        flops=2 * B * (Lq * D * D * 2 + Lk * D * D * 2 + Lq * Lk * D * 2
                       + Lq * D * F * 2),
        bytes_accessed=x.dtype.itemsize * B * Lq * D * 2,
        transcendentals=B * heads * Lq * Lk,
    )
    kernel = functools.partial(
        _stream_layer_kernel, heads=heads, self_attn=self_attn, has_pair=has_pair
    )
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NB, Lq, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Fused LayerNorm -> Dense (-> ReLU): the input-projection hot path.
#
# The reference's LinearLayer (model/model.py:412-434) applies LayerNorm to
# the RAW 2818-wide video features before projecting to 256. In the XLA
# chain that costs three full reads of the (rows, 2818) input (one per stat
# pass, one for normalize+matmul); this kernel reads it once. Unlike the
# full-layer megakernel above, this op is HBM-bound (K=2818-deep matmul,
# trivial VPU work), so fusing passes is the right trade here.
# ---------------------------------------------------------------------------


def _ln_dense_kernel(x_ref, s_ref, b_ref, w_ref, d_ref, o_ref, *, relu: bool):
    x = x_ref[...]  # (R, D) or (1, L, D)
    if x.ndim == 3:
        x = x.reshape(-1, x.shape[-1])
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    out = jax.lax.dot_general(
        y.astype(x.dtype), w_ref[...].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + d_ref[...].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0)
    o_ref[...] = out.astype(o_ref.dtype).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def fused_ln_dense(
    x: jnp.ndarray,        # (..., D)
    ln_scale: jnp.ndarray,  # (D,)
    ln_bias: jnp.ndarray,   # (D,)
    kernel: jnp.ndarray,    # (D, F)
    bias: jnp.ndarray,      # (F,)
    relu: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    lead = x.shape[:-1]
    D = x.shape[-1]
    F = kernel.shape[1]
    N = 1
    for s in lead:
        N *= s
    # Keep the input in its native >=3D shape and grid over the leading
    # (group) axis: a pre-call reshape to (N, D) is NOT free when the
    # operand is produced by a scan's dynamic-slice (measured: XLA
    # materializes a 0.17 ms/batch copy of the (10282, 2818) view).
    if x.ndim >= 3:
        G = N // lead[-1]
        L = lead[-1]
        x3 = x.reshape(G, L, D)
        # VMEM-aware row tile within each group: x block + its f32 upcast +
        # normalized copy + weights must fit the ~16MB scoped budget (TACoS
        # fp32 at (600, 4098) needs 23MB untiled — measured OOM)
        it = x.dtype.itemsize
        per_row = D * (it + 8) + F * 8
        cap = max(8, int((9e6 - it * D * F) // per_row))
        RL = L if L <= cap else (cap // 8) * 8
        out = pl.pallas_call(
            functools.partial(_ln_dense_kernel, relu=relu),
            grid=(G, pl.cdiv(L, RL)),
            in_specs=[
                pl.BlockSpec((1, RL, D), lambda g, r: (g, r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda g, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda g, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, F), lambda g, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda g, r: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, RL, F), lambda g, r: (g, r, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G, L, F), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * D * F,
                bytes_accessed=x.dtype.itemsize * (N * D + N * F + D * F),
                transcendentals=0,
            ),
            interpret=interpret,
        )(
            x3,
            ln_scale.reshape(1, D),
            ln_bias.reshape(1, D),
            kernel,
            bias.reshape(1, F),
        )
        return out.reshape(*lead, F)

    x2 = x.reshape(N, D)
    # 256-row tiles; a partial final block is clipped by pallas (garbage
    # rows in the padded read produce discarded outputs — no transcendental
    # in this kernel can turn them into NaN-traps). Below 256 rows the block
    # must EQUAL the array dim to stay Mosaic-legal at non-multiple-of-8 N.
    R = 256 if N >= 256 else N
    grid = pl.cdiv(N, R)
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, relu=relu),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, F), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * F,
            bytes_accessed=x.dtype.itemsize * (N * D + N * F + D * F),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x2,
        ln_scale.reshape(1, D),
        ln_bias.reshape(1, D),
        kernel,
        bias.reshape(1, F),
    )
    return out.reshape(N, F) if not lead else out.reshape(*lead, F)

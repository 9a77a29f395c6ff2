"""Fused int8 FFN Pallas kernel: linear1 -> PReLU -> linear2 in one pass.

Why a kernel: at the flagship geometry the FFN's linear1
((B*L, 256) @ (256, 1024)) measures 68.8 us — 99% of the bf16 MXU roofline
(13.0 GFLOP at 197 TFLOP/s = 66 us) — while ALSO writing a 51 MB bf16
hidden activation at ~HBM roofline, and linear2 reads it back (trace
r3_splitqk: 0.137 ms per FFN, 6 sites = 0.82 ms/batch). XLA cannot improve
either side at bf16. This kernel attacks both at once:

  - int8 x int8 -> s32 matmuls run the MXU at 2x the bf16 rate (v5e:
    394 vs 197 TOPS; measured 1.86x in isolation, scripts/bench_int8.py),
    halving the 66 us floor;
  - the 1024-wide hidden activation lives ONLY in VMEM per row tile —
    quantize / PReLU / requantize happen in-register, so the 51 MB
    round-trip disappears entirely (the reason the pure-XLA int8_dense
    path measured a net LOSS in-model: it kept the bf16 hidden tensor).

Quantization: per-output-channel symmetric weight scales (amax/127,
computed on the XLA side once per dispatch — loop-invariant, hoisted out of
the coalesced scan), per-row dynamic activation scales computed in-VMEM
(the two-pass amax that defeats XLA fusion is free inside the tile).
Weighted against reference FFN torch Linears (model/transformer.py:492-494,
537); eval-only — training keeps full precision. Metric parity is gated by
scripts/tpu_check.py like every other custom path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_i8(v):
    """Round-to-nearest for |v| <= 127 via an f32 hop: Mosaic lowers
    math.roundeven only at f32 (bf16 round, jnp.sign and i1 selects all
    failed to legalize — three measured compile failures; see git history).
    The scaling multiply stays in bf16; only convert+round pay f32 rate."""
    return jnp.round(v.astype(jnp.float32)).astype(jnp.int8)


def _ffn_int8_kernel(
    x_ref, w1_ref, s1_ref, b1_ref, alpha_ref, w2_ref, s2_ref, b2_ref, o_ref
):
    # The wide hidden tile has ~25M elements per site, so the quantize /
    # dequantize / PReLU chain is VPU-bound: an f32 version of this kernel
    # measured 0.137 ms/site — exactly the XLA bf16 chain, the int8 MXU win
    # fully eaten by f32 VPU work (trace r3_ffnk). The chain therefore runs
    # in bf16 (2x VPU element rate; int8 magnitudes fit bf16's 8-bit
    # mantissa exactly), with only the per-row amax reductions and scale
    # reciprocals in f32.
    x = x_ref[...]  # (R, K) model dtype
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)  # (R, 1) f32
    xq = _round_i8(x.astype(jnp.bfloat16) * (1.0 / xs).astype(jnp.bfloat16))
    acc1 = jax.lax.dot_general(
        xq, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (R, N1) s32
    # dequant + bias + PReLU in bf16: acc1 <= 127*127*K ~ 4.2e6 fits bf16's
    # range; relative rounding 2^-8 is far below the int8 quant error
    h = (
        acc1.astype(jnp.bfloat16) * s1_ref[...] * xs.astype(jnp.bfloat16)
        + b1_ref[...]
    )
    alpha = alpha_ref[0, 0].astype(jnp.bfloat16)
    h = jnp.maximum(h, 0) + alpha * jnp.minimum(h, 0)  # PReLU, no i1 mask
    ah = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=-1, keepdims=True)
    hr = (127.0 / jnp.maximum(ah, 1e-8)).astype(jnp.bfloat16)  # (R, 1)
    hq = _round_i8(h * hr)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (R, K2)
    hs = jnp.maximum(ah, 1e-8) * (1.0 / 127.0)
    o_ref[...] = (
        acc2.astype(jnp.bfloat16) * s2_ref[...] * hs.astype(jnp.bfloat16)
        + b2_ref[...]
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ffn_int8(
    x: jnp.ndarray,       # (..., K) bf16/f32
    w1: jnp.ndarray,      # (K, N1) float param
    b1: jnp.ndarray,      # (N1,)
    alpha: jnp.ndarray,   # (1,) PReLU slope
    w2: jnp.ndarray,      # (N1, K2)
    b2: jnp.ndarray,      # (K2,)
    interpret: bool = False,
) -> jnp.ndarray:
    """linear2(prelu(linear1(x))) with int8 MXU matmuls and the hidden
    activation resident in VMEM. Row-tiled over the flattened batch."""
    shape = x.shape
    K = shape[-1]
    N = 1
    for s in shape[:-1]:
        N *= s
    x2 = x.reshape(N, K)
    N1 = w1.shape[1]
    K2 = w2.shape[1]

    w1f = w1.astype(jnp.float32)
    s1 = jnp.maximum(jnp.max(jnp.abs(w1f), axis=0, keepdims=True), 1e-8) / 127.0
    w1q = jnp.round(w1f / s1).astype(jnp.int8)
    w2f = w2.astype(jnp.float32)
    s2 = jnp.maximum(jnp.max(jnp.abs(w2f), axis=0, keepdims=True), 1e-8) / 127.0
    w2q = jnp.round(w2f / s2).astype(jnp.int8)

    R = 256  # row tile: weights + x/h/acc tiles fit VMEM with headroom
    cost = pl.CostEstimate(
        flops=2 * N * K * N1 + 2 * N * N1 * K2,
        bytes_accessed=x.dtype.itemsize * N * (K + K2) + K * N1 + N1 * K2,
        transcendentals=0,
    )
    out = pl.pallas_call(
        _ffn_int8_kernel,
        grid=(pl.cdiv(N, R),),
        in_specs=[
            pl.BlockSpec((R, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((N1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, K2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K2), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(
        x2, w1q, s1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16).reshape(1, N1),
        alpha.astype(jnp.float32).reshape(1, 1),
        w2q, s2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16).reshape(1, K2),
    )
    return out.reshape(*shape[:-1], K2)


def ffn_int8_reference(x, w1, b1, alpha, w2, b2):
    """XLA mirror of the kernel's quantized math, same dtype staging
    (bf16 elementwise chain, f32 amax/scales) — the test oracle."""
    bf = jnp.bfloat16
    shape = x.shape
    x = x.reshape(-1, shape[-1])
    w1f = w1.astype(jnp.float32)
    s1 = jnp.maximum(jnp.max(jnp.abs(w1f), axis=0, keepdims=True), 1e-8) / 127.0
    w1q = jnp.round(w1f / s1).astype(jnp.int8)
    w2f = w2.astype(jnp.float32)
    s2 = jnp.maximum(jnp.max(jnp.abs(w2f), axis=0, keepdims=True), 1e-8) / 127.0
    w2q = jnp.round(w2f / s2).astype(jnp.int8)
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)
    xq = _round_i8(x.astype(bf) * (1.0 / xs).astype(bf))
    acc1 = jax.lax.dot_general(
        xq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h = acc1.astype(bf) * s1.astype(bf) * xs.astype(bf) + b1.astype(bf)
    h = jnp.maximum(h, 0) + alpha.astype(bf)[0] * jnp.minimum(h, 0)
    ah = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=-1, keepdims=True)
    hr = (127.0 / jnp.maximum(ah, 1e-8)).astype(bf)
    hq = _round_i8(h * hr)
    acc2 = jax.lax.dot_general(
        hq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    hs = jnp.maximum(ah, 1e-8) * (1.0 / 127.0)
    out = acc2.astype(bf) * s2.astype(bf) * hs.astype(bf) + b2.astype(bf)
    return out.astype(x.dtype).reshape(*shape[:-1], w2.shape[1])

"""Dynamic int8 quantized dense for the eval path.

v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOPS), so
FLOP-bound matmuls can halve their MXU time by quantizing BOTH operands:
per-output-channel symmetric weight scales (amax/127) and per-row dynamic
activation scales, dequantized in the epilogue. LayerNorm'd transformer
activations are well-conditioned for 8-bit dynamic quantization; metric
parity of the quantized eval path is gated the same way as bf16 compute
(scripts/tpu_check.py + tests/test_e2e.py metric-parity pattern).

Replaces reference FFN torch Linears (model/transformer.py:492-494,537) at
inference only — training keeps full precision.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """y = x @ kernel + bias with an s8 x s8 -> s32 MXU core.

    x: (..., K) float; kernel: (K, N) float param; bias: (N,).
    Per-row activation scales (dynamic), per-column weight scales.
    """
    k32 = kernel.astype(jnp.float32)
    wscale = jnp.maximum(jnp.abs(k32).max(axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(k32 / wscale).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    xscale = jnp.maximum(jnp.abs(x32).max(axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.round(x32 / xscale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xscale * wscale + bias.astype(jnp.float32)
    return out.astype(x.dtype)

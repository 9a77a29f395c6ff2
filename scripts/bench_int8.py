"""Microbenchmark: int8 (s8 x s8 -> s32) vs bf16 matmul on the TPU MXU, at
the MESM FFN geometry — decides whether a quantized FFN eval path can beat
the bf16 one (v5e datasheet: 394 TOPS int8 vs 197 TFLOPS bf16).

Measures via device trace (wall-clock through this environment's relay is
unreliable — BASELINE.md protocol): one jit containing N independent matmuls
per dtype, then per-op times from trace_report.

Run on the TPU host:  python scripts/bench_int8.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    M, K, N = 128 * 195, 256, 1024  # FFN linear1 at the charades geometry
    REP = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    @jax.jit
    def bf16_n(x, w):
        outs = []
        for i in range(REP):
            outs.append(
                jax.lax.dot_general(
                    x + jnp.bfloat16(i), w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)[0, 0]
            )
        return jnp.stack(outs)

    @jax.jit
    def int8_n(xq, wq):
        outs = []
        for i in range(REP):
            outs.append(
                jax.lax.dot_general(
                    xq + jnp.int8(i), wq,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )[0, 0]
            )
        return jnp.stack(outs)

    @jax.jit
    def int8_dyn_n(x, w):
        # full dynamic-quant pipeline as the FFN would run it: per-row
        # activation scales + per-column weight scales + int8 dot + dequant
        outs = []
        wscale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-6) / 127.0
        wq = jnp.round(w.astype(jnp.float32) / wscale).astype(jnp.int8)
        for i in range(REP):
            xi = x + jnp.bfloat16(i)
            xscale = (
                jnp.maximum(jnp.max(jnp.abs(xi), axis=-1, keepdims=True), 1e-6).astype(jnp.float32)
                / 127.0
            )
            xq = jnp.round(xi.astype(jnp.float32) / xscale).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            outs.append((acc.astype(jnp.float32) * xscale * wscale).astype(jnp.bfloat16)[0, 0])
        return jnp.stack(outs)

    for name, fn, args in (
        ("bf16", bf16_n, (x, w)),
        ("int8", int8_n, (xq, wq)),
        ("int8_dyn", int8_dyn_n, (x, w)),
    ):
        r = fn(*args)
        jax.block_until_ready(r)
        tdir = f"traces/int8_{name}"
        with jax.profiler.trace(tdir):
            for _ in range(5):
                r = fn(*args)
            jax.block_until_ready(r)
        from mesm_tpu.utils.trace_report import report

        print(f"===== {name} (per-op over {REP} matmuls x 5 iters)")
        print(report(tdir, top=6))


if __name__ == "__main__":
    main()

"""Micro-benchmark: XLA attention core vs fused Pallas variants on real TPU.

Usage: python scripts/bench_attention.py [B H Lq Lk hd] (default 128 8 195 195 32)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mesm_tpu.models.attention import attention_core
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    a = [int(x) for x in sys.argv[1:6]] or []
    B, H, Lq, Lk, hd = a + [128, 8, 195, 195, 32][len(a):]
    E = H * hd
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Lq, E)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, E)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, E)).astype(np.float32))
    mask_b = np.ones((B, Lk), bool)
    mask_b[:, -7:] = False
    maskf = jnp.asarray(mask_b.astype(np.float32))
    maskb = jnp.asarray(mask_b)

    def timeit(fn, *args, iters=30, warmup=5):
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1e6, r

    xla = jax.jit(lambda q, k, v, m: attention_core(q, k, v, num_heads=H, key_valid_mask=m))
    t_xla, r_xla = timeit(xla, q, k, v, maskb)
    print(f"XLA core      {t_xla:9.1f} us")

    for variant in ("per_head", "all_heads", "batched", "packed"):
        fn = lambda q, k, v, m: _fused_attention_impl(q, k, v, m, H, False, variant)
        try:
            t, r = timeit(fn, q, k, v, maskf)
            err = float(jnp.max(jnp.abs(r - r_xla)))
            print(f"{variant:13s} {t:9.1f} us  (xla/this = {t_xla / t:.2f}x, maxdiff {err:.2e})")
        except Exception as e:
            print(f"{variant:13s} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

"""Probe: fused stream-layer kernel vs the flax/XLA layer chain on real TPU.

Chains N layer applications inside one jit (lax.scan) so wall-clock is
device-dominated (the per-dispatch relay latency amortizes over N), then
reports ms/layer for both implementations at the charades eval geometry.

Usage: python scripts/bench_layer_kernel.py [encoder|t2v] [B L N]
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

    from mesm_tpu.models.detr import TransformerEncoderLayer
    from mesm_tpu.models.t2v import T2VLayer, scrambled_pair_factors
    from mesm_tpu.ops.layer_pallas import fused_stream_layer
    from tests.test_layer_kernel import map_params  # param-tree mapping

    flavor = sys.argv[1] if len(sys.argv) > 1 else "encoder"
    a = [int(x) for x in sys.argv[2:5]]
    B, L, N = a + [128, 195, 32][len(a):]
    D, H, F, Lt = 256, 8, 1024, 17
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32), dt)
    pos = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32), dt)
    lens = rng.integers(L // 2, L + 1, B)
    vmask = jnp.asarray(np.arange(L)[None] < lens[:, None])

    if flavor == "encoder":
        layer = TransformerEncoderLayer(D, H, F, dropout=0.0, dtype=dt)
        params = layer.init(jax.random.PRNGKey(0), x, vmask, pos)["params"]
        flax_fn = lambda c: layer.apply(
            {"params": params}, c, vmask, pos, deterministic=True
        )
        kp = map_params(params, "self_attn")
        kern_fn = lambda c: fused_stream_layer(
            c, pos, None, None, vmask.astype(jnp.float32), None, None,
            kp, heads=H, self_attn=True,
        )
    else:
        txt = jnp.asarray(rng.normal(size=(B, Lt, D)).astype(np.float32), dt)
        pos_t = jnp.zeros((B, Lt, D), dt)
        tlens = rng.integers(3, Lt + 1, B)
        tmask = jnp.asarray(np.arange(Lt)[None] < tlens[:, None])
        layer = T2VLayer(D, H, F, dropout=0.0, dtype=dt)
        params = layer.init(
            jax.random.PRNGKey(1), txt, x, tmask, pos_t, pos, vmask
        )["params"]
        flax_fn = lambda c: layer.apply(
            {"params": params}, txt, c, tmask, pos_t, pos, vmask,
            deterministic=True,
        )
        qf, kf = scrambled_pair_factors(vmask, tmask, H)
        qf = jnp.asarray(qf, jnp.float32).transpose(1, 0, 2)
        kf = jnp.asarray(kf, jnp.float32).transpose(1, 0, 2)
        kp = map_params(params, "cross_attn")
        kern_fn = lambda c: fused_stream_layer(
            c, pos, txt + pos_t, txt, tmask.astype(jnp.float32), qf, kf,
            kp, heads=H, self_attn=False,
        )

    def chain(fn):
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=N)[0]
        return run

    for name, fn in (("flax/XLA", chain(flax_fn)), ("fused kernel", chain(kern_fn))):
        r = fn(x)
        jax.block_until_ready(r)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(x)
        jax.block_until_ready(r)
        dt_ms = (time.perf_counter() - t0) / iters / N * 1e3
        print(f"{flavor} {name:13s} {dt_ms:7.3f} ms/layer  (B={B} L={L} N={N})")

    # value check on device
    rf = flax_fn(x)
    rk = kern_fn(x)
    d = float(jnp.max(jnp.abs(rf.astype(jnp.float32) - rk.astype(jnp.float32))))
    print(f"{flavor} maxdiff flax-vs-kernel on device: {d:.3e}")


if __name__ == "__main__":
    main()

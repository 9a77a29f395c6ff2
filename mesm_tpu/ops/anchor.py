"""Layout anchor: an identity Pallas pass that pins row-major layouts.

MEASURED NEGATIVE at its motivating site — kept as the recorded experiment
and for future layout fights. Background: when the dedup video projection is
hoisted out of the dispatch-coalesced eval scan (parallel/step.py
_hoist_video_proj), the scan body's entry tensor becomes a plain while-loop
operand whose layout XLA assigns freely — it picks L-major ({2,0,1}-family)
layouts for the downstream video stream, flipping six LayerNorm-stat
reductions to strided form (0.046 -> 0.155 ms each, traces r3s_ctrl vs
r3s_hoist). This op pins the stream row-major at a custom-call boundary
(custom calls use default layouts), which does restore the fast LN stats —
but the L-major stream it removes was WORTH MORE: body busy 3.154 ->
3.364 ms/batch with the anchor (trace r3s_anchor), because six big stream
fusions run ~0.04 ms cheaper each in L-major form and the anchor's own
copies add ~0.08. Net: un-anchored group-hoist 3.66 total beats anchored
rows-hoist 3.89. Not wired into any dispatch path.

Eval-only: no autodiff rule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def layout_anchor(x: jnp.ndarray) -> jnp.ndarray:
    """Identity, but through a Pallas custom call: pins row-major layout.

    No-op off-TPU (layout games are meaningless on CPU, and interpret-mode
    would just burn time) and in kernels mode "off" (that mode must keep the
    whole program free of custom calls — it is the Mosaic-regression
    fallback, scripts/tpu_check.py)."""
    from .. import kernels

    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if not on_tpu or x.ndim != 3 or kernels.pallas_mode() == "off":
        return x
    B, L, D = x.shape
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, D), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
    )(x)

"""Global kernel dispatch switches.

Fused Pallas attention (ops/attention_pallas.py) vs the XLA core, measured on
v5e IN-MODEL via jax.profiler traces (round 2; wall-clock micro-timing
through this environment's remote relay proved unreliable — traces only):

  site (eval step)                       XLA chain    v3 "batched" kernel
  DETR encoder self-attn 128x8x195x195   1.76 ms/step 1.05 ms kernels + 0.31 ms
                                                      layout copies + fusion
                                                      ripple -> NET LOSS
                                                      (busy 6.5 -> 7.3 ms/step)
  DETR encoder self-attn 16x8x601x601    1.91 ms/lyr  1.02 ms/lyr -> step busy
                                                      32.0 -> 23.1 ms (-28%)

Why the short-length loss persists across three kernel layouts (per-head,
all-heads, sample-tiled batched): head_dim 32 pads to 128 lanes (4x VMEM and
MXU waste), and the (B,L,E)->(B,H,L,hd) layout change XLA inserts around the
custom call costs ~0.3 ms — the HBM saved on a 195x195 logits tile doesn't
cover it. At 600+ the logits tensor is 9.5x larger and the kernel wins big.

Round-2 update — the v4 "packed" layout (ops/attention_pallas.py
_mha_kernel_packed) finally wins at the flagship geometry: operands stay in
the model-native (B, L, E) shape and the head split happens inside the
kernel, so XLA inserts no (B,H,L,hd) transposes around the custom call and
the layout pressure on neighbouring LayerNorm fusions disappears. Measured
in-model (traces/eval_co8_packed vs traces/eval_co8, bf16 128x8x195x195):
step busy 4.74 -> 4.37 ms/batch (-7.8%), with the slow transposed-layout LN
reductions dropping 0.93 -> 0.32 ms as a side effect.

Modes: "off" (always XLA), "on" (kernel for any shape above the minimum
lowering size), "auto" (default — kernel only where measured to win, see
use_pallas_attention). Kernels are an INFERENCE path: the dispatch in
models/attention.py routes through them only for deterministic calls
(pallas_call has no autodiff rule here; training keeps the XLA core).
"""
from __future__ import annotations

import jax

_MODE: str = "auto"  # "auto" | "on" | "off"

# fp32 tier (v3 "batched" variant): long geometries only — at L=195 fp32 the
# batched kernel loses to XLA (round-1 measurement, see module docstring)
AUTO_MIN_LEN = 512
AUTO_MIN_BATCH = 16
# bf16 tier (v4 "packed" variant): wins from the flagship L=195 upward
PACKED_MIN_LEN = 128
PACKED_MIN_BATCH = 8
# fused LayerNorm->Dense (ops/layer_pallas.py): only worth it when the
# normalized axis is wide enough that re-reading the input dominates (the
# 2818-wide raw video features; hidden-size 256 blocks stay on XLA)
LN_DENSE_MIN_D = 1024


def use_fused_ln_dense(D: int) -> bool:
    """Dispatch for the fused LayerNorm->Dense input-projection kernel."""
    if _MODE == "off":
        return False
    if _MODE == "on":
        return True
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and D >= LN_DENSE_MIN_D


def set_pallas_attention(enabled) -> None:
    """Accepts True/'on', False/'off', or None/'auto'."""
    global _MODE
    if enabled is None or enabled == "auto":
        _MODE = "auto"
    elif enabled in (True, "on"):
        _MODE = "on"
    else:
        _MODE = "off"


def pallas_mode() -> str:
    return _MODE


def use_pallas_attention(B: int = 0, Lq: int = 0, Lk: int = 0, dtype=None) -> bool:
    """Shape- and dtype-aware dispatch decision for the current mode.

    Two measured tiers (both on v5e, in-model traces):
    - fp32 -> v3 "batched" variant, only for long geometries (TACoS
      16x8x601x601: step busy 32.0 -> 23.1 ms; at L=195 fp32 it loses).
      bf16 halves the XLA chain's logits traffic, erasing the batched
      variant's win (19.9 XLA vs 20.4 kernel at 601 bf16).
    - bf16 -> v4 "packed" variant from L >= 128 (charades 128x8x195x195:
      step busy 4.74 -> 4.37 ms/batch; layout churn removed).
    The variant itself is selected by dtype in attention_pallas.fused_attention."""
    if _MODE == "off":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if _MODE == "on":
        return True
    if not on_tpu:
        return False
    import jax.numpy as jnp

    if dtype == jnp.bfloat16:
        # both sides long. The short-key t2v/enhance sites (195 q x 17 k)
        # resisted THREE kernel attempts, all measured in-model: straight
        # packed layout busy 4.37 -> 5.04 ms/batch (17 keys lane-pad to 128);
        # transposed-logits shortkey variant 4.30 -> 4.45 (0.16 ms/site vs
        # ~0.11 XLA — per-head lane slices of the long query dominate at
        # tiny key counts). The shortkey kernel stays in the tree (tested,
        # attention_pallas._mha_kernel_packed_shortkey) but auto keeps XLA
        # for any Lk < PACKED_MIN_LEN.
        return min(Lq, Lk) >= PACKED_MIN_LEN and B >= PACKED_MIN_BATCH
    return min(Lq, Lk) >= AUTO_MIN_LEN and B >= AUTO_MIN_BATCH

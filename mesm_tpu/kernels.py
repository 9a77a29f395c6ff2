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

Modes: "off" (always XLA), "on" (kernel for any shape above the minimum
lowering size), "auto" (default — kernel only where measured to win: both
sequence lengths >= AUTO_MIN_LEN and batch >= AUTO_MIN_BATCH, TPU backend).
"""
from __future__ import annotations

import jax

_MODE: str = "auto"  # "auto" | "on" | "off"

AUTO_MIN_LEN = 512
AUTO_MIN_BATCH = 16


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

    bf16 halves the XLA chain's logits HBM traffic — the kernel's whole
    advantage — so in bf16 the kernel no longer wins even at TACoS geometry
    (measured: 19.9 ms XLA vs 20.4 ms kernel step busy at 16x8x601x601 bf16;
    fp32: 32.0 vs 23.1 in the kernel's favor). auto = fp32 + long + batched."""
    if _MODE == "off":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if _MODE == "on":
        return True
    import jax.numpy as jnp

    fp32 = dtype is None or dtype == jnp.float32
    return (
        on_tpu
        and fp32
        and min(Lq, Lk) >= AUTO_MIN_LEN
        and B >= AUTO_MIN_BATCH
    )

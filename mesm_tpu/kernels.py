"""Global kernel dispatch switches.

Fused Pallas attention (ops/attention_pallas.py) vs the XLA core, measured on
v5e (fp32, uncontended):

  geometry              XLA      per-head kernel   all-heads kernel
  32 x 8 x 195 x 195    415us    634us             515us     <- XLA wins
  16 x 8 x 600 x 600    4079us   1137us (3.6x)     1585us    <- kernel wins
  8  x 8 x 600 x 600    721us    1033us            1645us

At short lengths the model is latency-bound and XLA's batched matmuls +
fusion win; at TACoS-length sequences with enough rows, the (B,H,Lq,Lk)
logits tensor round-trips HBM in the XLA path and the fused kernel wins ~3.6x.

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


def use_pallas_attention(B: int = 0, Lq: int = 0, Lk: int = 0) -> bool:
    """Shape-aware dispatch decision for the current mode."""
    if _MODE == "off":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if _MODE == "on":
        return True
    # auto: only the measured-win regime, and only on real TPU
    return (
        on_tpu
        and min(Lq, Lk) >= AUTO_MIN_LEN
        and B >= AUTO_MIN_BATCH
    )

"""Global kernel dispatch switches.

`use_pallas_attention` gates the fused Pallas attention kernel
(ops/attention_pallas.py). Default: OFF. Measured on v5e at MESM geometry
(hidden 256, Lv<=194): the model is latency/op-count-bound, and inserting the
custom call breaks XLA's fusion around attention — the end-to-end eval step is
~25% slower with the kernel than pure XLA, even though the isolated kernel
beats isolated XLA attention 2.8x at the 195x195 site. Re-evaluate for larger
geometries (TACoS Lv=600) or future hardware; enable via
set_pallas_attention(True) or --pallas_attention=on.
"""
from __future__ import annotations

_PALLAS_ATTENTION: bool | None = None  # None = auto (currently: off)


def set_pallas_attention(enabled: bool | None) -> None:
    global _PALLAS_ATTENTION
    _PALLAS_ATTENTION = enabled


def use_pallas_attention() -> bool:
    if _PALLAS_ATTENTION is not None:
        return _PALLAS_ATTENTION
    return False

"""Global kernel dispatch switches.

`use_pallas_attention` gates the fused Pallas attention kernel
(ops/attention_pallas.py). Default: OFF. Measured on v5e at MESM geometry
(hidden 256, Lv<=194, fp32, uncontended host): isolated XLA attention 415us
vs the all-heads kernel 515us vs the per-(sample,head) kernel 634us at
B=32x8x195x195 — XLA's batched matmuls + fusion win outright at this size,
and in-model the custom call additionally breaks surrounding fusion (~25%
slower end-to-end eval). The kernel is kept for larger geometries (TACoS
Lv=600) and future hardware; enable via set_pallas_attention(True) or
--pallas_attention=on. Variants: ops/attention_pallas._fused_attention_impl
(per_head | all_heads).
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

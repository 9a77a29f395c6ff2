"""Global kernel dispatch switches.

`use_pallas_attention` gates the fused Pallas attention kernel. Default: on
for TPU backends, off elsewhere (the XLA einsum core is used on CPU, where
Pallas TPU kernels cannot run). Override explicitly for benchmarking either
path via `set_pallas_attention`.
"""
from __future__ import annotations

import jax

_PALLAS_ATTENTION: bool | None = None  # None = auto (TPU yes, others no)


def set_pallas_attention(enabled: bool | None) -> None:
    global _PALLAS_ATTENTION
    _PALLAS_ATTENTION = enabled


def use_pallas_attention() -> bool:
    if _PALLAS_ATTENTION is not None:
        return _PALLAS_ATTENTION
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False

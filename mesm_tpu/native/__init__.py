"""Native host-runtime components (C++ via the CPython C API).

Compiled lazily on first import into this package directory; every entry
point has a numpy fallback so the framework runs without a toolchain. The
native paths replace the reference's Python/mp.Pool host hot spots
(temporal NMS, per-query AP assignment, per-item mean-pool downsampling).
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, f"_mesm_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")

_native = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "module.cpp")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        logger.warning(f"native build failed ({e}); using numpy fallbacks")
        return False


def get_native():
    """Return the compiled module or None (fallbacks engage)."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
        os.path.join(_HERE, "module.cpp")
    ):
        if not _build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_mesm_native", _SO_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _native = mod
    except Exception as e:  # pragma: no cover
        logger.warning(f"native import failed ({e}); using numpy fallbacks")
        _native = None
    return _native


# ---------------------------------------------------------------------------
# dispatching wrappers
# ---------------------------------------------------------------------------


def temporal_nms_native(windows: np.ndarray, thd: float, max_after: int) -> Optional[List[int]]:
    nat = get_native()
    if nat is None:
        return None
    w = np.ascontiguousarray(windows, dtype=np.float64)
    return nat.temporal_nms(w, float(thd), int(max_after))


def ap_detection_native(
    preds: np.ndarray, gts: np.ndarray, thds: np.ndarray
) -> Optional[np.ndarray]:
    nat = get_native()
    if nat is None:
        return None
    p = np.ascontiguousarray(preds, dtype=np.float64).reshape(-1, 3)
    g = np.ascontiguousarray(gts, dtype=np.float64).reshape(-1, 2)
    t = np.ascontiguousarray(thds, dtype=np.float64).reshape(-1, 1)
    return np.asarray(nat.ap_detection(p, g, t))


def mean_pool_native(feat: np.ndarray, max_len: int) -> Optional[np.ndarray]:
    nat = get_native()
    if nat is None:
        return None
    f = np.ascontiguousarray(feat, dtype=np.float32)
    raw = nat.mean_pool(f, int(max_len))
    return np.frombuffer(raw, dtype=np.float32).reshape(max_len, f.shape[1]).copy()

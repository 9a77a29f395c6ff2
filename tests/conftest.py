"""Test harness: force an 8-device virtual CPU platform before JAX initializes.

Multi-chip sharding is validated on this virtual mesh (real multi-chip hardware
is not available in CI); bench.py separately targets the real TPU chip.

Note: this environment preloads a TPU PJRT plugin via sitecustomize and
force-sets JAX_PLATFORMS, so plain env vars are not enough — we override the
platform through jax.config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most of the full-tier wall time is CPU
# XLA compiles of the fused train/eval steps (minutes each), re-paid on
# every pytest invocation. Cache them on disk so re-runs only pay execution.
# Set via env (not jax.config) so subprocess-spawning tests (multihost
# workers, CLI smoke tests) inherit it. Keyed by jaxlib version + program,
# so stale entries can't serve wrong executables; the dir is gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded from the `-m 'not slow'` tier)"
    )
    config.addinivalue_line(
        "markers",
        "smoke: close-out gate subset (~8 min cold cache, measured "
        "2026-08-20; faster warm) covering every eval/"
        "train dispatch arity: coalesce=1, tuple-K, superbatch (incl. "
        "video_feat_g and rows staging), dedup/hoist, grad-accum, plus "
        "seconds-level span/config/metric sanity. Run via scripts/close_out.sh",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)

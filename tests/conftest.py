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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded from the `-m 'not slow'` tier)"
    )
    config.addinivalue_line(
        "markers",
        "smoke: close-out gate subset (<~7 min total) covering every eval/"
        "train dispatch arity: coalesce=1, tuple-K, superbatch (incl. "
        "video_feat_g and rows staging), dedup/hoist, grad-accum, plus "
        "seconds-level span/config/metric sanity. Run via scripts/close_out.sh",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Kernel dispatch policy (mesm_tpu/kernels.py)."""
import pytest

from mesm_tpu import kernels


@pytest.fixture(autouse=True)
def restore_mode():
    yield
    kernels.set_pallas_attention(None)


def test_modes():
    kernels.set_pallas_attention("off")
    assert not kernels.use_pallas_attention(128, 600, 600)
    kernels.set_pallas_attention(False)
    assert kernels.pallas_mode() == "off"
    kernels.set_pallas_attention("on")
    assert kernels.use_pallas_attention(1, 8, 8)
    kernels.set_pallas_attention(True)
    assert kernels.pallas_mode() == "on"
    kernels.set_pallas_attention(None)
    assert kernels.pallas_mode() == "auto"
    kernels.set_pallas_attention("auto")
    assert kernels.pallas_mode() == "auto"


def test_auto_policy_off_on_cpu():
    """Tests run on the CPU backend: auto must never pick the TPU kernel."""
    kernels.set_pallas_attention(None)
    assert not kernels.use_pallas_attention(128, 600, 600)
    assert not kernels.use_pallas_attention(8, 600, 600)
    assert not kernels.use_pallas_attention(128, 195, 195)


def test_auto_policy_fp32_only(monkeypatch):
    """bf16 halves the XLA logits traffic, erasing the kernel's win — auto
    must select the kernel only for fp32 (measured in kernels.py docstring)."""
    import jax.numpy as jnp

    kernels.set_pallas_attention(None)
    monkeypatch.setattr(kernels.jax, "default_backend", lambda: "tpu")
    assert kernels.use_pallas_attention(16, 600, 600, jnp.float32)
    assert not kernels.use_pallas_attention(16, 600, 600, jnp.bfloat16)
    assert kernels.use_pallas_attention(16, 600, 600)  # dtype unknown -> fp32
    assert not kernels.use_pallas_attention(8, 600, 600, jnp.float32)  # B < 16
    assert not kernels.use_pallas_attention(16, 195, 600, jnp.float32)  # short

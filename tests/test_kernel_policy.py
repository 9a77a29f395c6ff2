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


def test_scope_overrides_default_per_context():
    """pallas_scope is a context-local override: it wins over the process
    default inside the scope, restores on exit, and does not leak to other
    threads (the concurrent eval+train-in-one-process case)."""
    import threading

    kernels.set_pallas_attention("off")
    seen = {}
    with kernels.pallas_scope("on"):
        assert kernels.pallas_mode() == "on"

        def other_thread():
            seen["mode"] = kernels.pallas_mode()

        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        with kernels.pallas_scope("auto"):
            assert kernels.pallas_mode() == "auto"  # nesting
        assert kernels.pallas_mode() == "on"
    assert kernels.pallas_mode() == "off"  # default restored
    assert seen["mode"] == "off"  # other thread saw the process default


def test_auto_policy_off_on_cpu():
    """Tests run on the CPU backend: auto must never pick the TPU kernel."""
    kernels.set_pallas_attention(None)
    assert not kernels.use_pallas_attention(128, 600, 600)
    assert not kernels.use_pallas_attention(8, 600, 600)
    assert not kernels.use_pallas_attention(128, 195, 195)


def test_packed_formulation_tiers(monkeypatch):
    """Short-key (t2v/enhance) and short-query (SS-recon/decoder-cross)
    packed-formulation dispatch: engaged on TPU in range, never overlapping
    each other or the Pallas tier, off on CPU auto."""
    import jax.numpy as jnp

    kernels.set_pallas_attention(None)
    # CPU: auto never engages
    assert not kernels.use_shortkey_packed(128, 195, 17, jnp.bfloat16)
    assert not kernels.use_shortquery_packed(128, 3, 194, jnp.bfloat16)
    monkeypatch.setattr(kernels.jax, "default_backend", lambda: "tpu")
    # shortkey: t2v/enhance geometry
    assert kernels.use_shortkey_packed(128, 195, 17, jnp.bfloat16)
    assert not kernels.use_shortkey_packed(128, 195, 195, jnp.bfloat16)  # long keys
    assert not kernels.use_shortkey_packed(4, 195, 17, jnp.bfloat16)  # B < 8
    assert not kernels.use_shortkey_packed(128, 10, 17, jnp.bfloat16)  # short q
    # shortquery: ss-recon / decoder-cross geometry
    assert kernels.use_shortquery_packed(128, 3, 194, jnp.bfloat16)
    assert kernels.use_shortquery_packed(128, 10, 195, jnp.bfloat16)
    assert not kernels.use_shortquery_packed(128, 10, 10, jnp.bfloat16)  # dec self
    assert not kernels.use_shortquery_packed(128, 64, 194, jnp.bfloat16)  # long q
    # training (deterministic=False) keeps the XLA chain: the packed
    # formulations' backward measured 2x slower (kernels.py SHORTKEY_TRAIN)
    assert not kernels.use_shortkey_packed(
        128, 195, 17, jnp.bfloat16, deterministic=False
    )
    assert not kernels.use_shortquery_packed(
        128, 3, 194, jnp.bfloat16, deterministic=False
    )
    monkeypatch.setattr(kernels, "SHORTKEY_TRAIN", True)
    monkeypatch.setattr(kernels, "SHORTQUERY_TRAIN", True)
    assert kernels.use_shortkey_packed(
        128, 195, 17, jnp.bfloat16, deterministic=False
    )
    assert kernels.use_shortquery_packed(
        128, 3, 194, jnp.bfloat16, deterministic=False
    )
    monkeypatch.setattr(kernels, "SHORTKEY_TRAIN", False)
    monkeypatch.setattr(kernels, "SHORTQUERY_TRAIN", False)
    # no geometry satisfies two tiers at once
    for B, Lq, Lk in ((128, 195, 17), (128, 3, 194), (128, 10, 195),
                      (128, 195, 195), (16, 600, 600)):
        engaged = [
            kernels.use_pallas_attention(B, Lq, Lk, jnp.bfloat16),
            kernels.use_shortkey_packed(B, Lq, Lk, jnp.bfloat16),
            kernels.use_shortquery_packed(B, Lq, Lk, jnp.bfloat16),
        ]
        assert sum(engaged) <= 1, (B, Lq, Lk, engaged)


def test_auto_policy_dtype_tiers(monkeypatch):
    """Two measured tiers (kernels.py docstring): fp32 -> batched variant for
    long geometries only; bf16 -> packed variant from L >= 128."""
    import jax.numpy as jnp

    kernels.set_pallas_attention(None)
    monkeypatch.setattr(kernels.jax, "default_backend", lambda: "tpu")
    # fp32 tier
    assert kernels.use_pallas_attention(16, 600, 600, jnp.float32)
    assert kernels.use_pallas_attention(16, 600, 600)  # dtype unknown -> fp32
    assert not kernels.use_pallas_attention(8, 600, 600, jnp.float32)  # B < 16
    assert not kernels.use_pallas_attention(16, 195, 600, jnp.float32)  # short
    # bf16 tier: packed kernel from the flagship geometry upward, both sides
    # long — three kernel attempts at the short-key t2v sites all measured
    # net losses (kernels.py docstring), so they stay on XLA
    assert kernels.use_pallas_attention(128, 195, 195, jnp.bfloat16)
    assert kernels.use_pallas_attention(16, 600, 600, jnp.bfloat16)
    assert not kernels.use_pallas_attention(128, 195, 17, jnp.bfloat16)  # t2v keys
    assert not kernels.use_pallas_attention(128, 10, 195, jnp.bfloat16)  # decoder
    assert not kernels.use_pallas_attention(4, 195, 195, jnp.bfloat16)  # B < 8

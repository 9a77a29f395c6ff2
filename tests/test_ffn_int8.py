"""Fused int8 FFN kernel (ops/ffn_pallas.py): interpret-mode parity with its
quantized-math oracle, closeness to the exact bf16 FFN, and the FFN module's
dispatch (param tree unchanged, values match the oracle)."""
import jax
import jax.numpy as jnp
import numpy as np

from mesm_tpu import kernels
from mesm_tpu.ops.ffn_pallas import ffn_int8, ffn_int8_reference


def _mk(rng, N=96, K=32, N1=64):
    x = rng.normal(size=(N, K)).astype(np.float32)
    w1 = (rng.normal(size=(K, N1)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(N1,)) * 0.1).astype(np.float32)
    alpha = np.array([0.25], np.float32)
    w2 = (rng.normal(size=(N1, K)) * 0.1).astype(np.float32)
    b2 = (rng.normal(size=(K,)) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, w1, b1, alpha, w2, b2))


def test_kernel_matches_quantized_oracle():
    rng = np.random.default_rng(0)
    args = _mk(rng)
    got = ffn_int8(*args, interpret=True)
    want = ffn_int8_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2)


def test_kernel_ragged_rows():
    """N not divisible by the row tile: cdiv grid pads the tail block."""
    rng = np.random.default_rng(1)
    x, w1, b1, alpha, w2, b2 = _mk(rng, N=96)
    x3 = x.reshape(4, 24, 32)[:3, :17]  # (3, 17, 32): N = 51
    got = ffn_int8(x3, w1, b1, alpha, w2, b2, interpret=True)
    want = ffn_int8_reference(x3, w1, b1, alpha, w2, b2)
    assert got.shape == (3, 17, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2)


def test_quantization_error_vs_exact():
    """int8 dynamic quant of LN-scale activations stays within ~1% relative
    of the exact FFN (sanity bound; metric-level parity is the real gate,
    scripts/tpu_check.py)."""
    rng = np.random.default_rng(2)
    x, w1, b1, alpha, w2, b2 = _mk(rng, N=256, K=64, N1=128)
    got = np.asarray(ffn_int8_reference(x, w1, b1, alpha, w2, b2))
    h = np.asarray(x) @ np.asarray(w1) + np.asarray(b1)
    h = np.maximum(h, 0) + 0.25 * np.minimum(h, 0)
    exact = h @ np.asarray(w2) + np.asarray(b2)
    denom = np.abs(exact).mean()
    assert np.abs(got - exact).mean() / denom < 0.02


def test_ffn_module_dispatch_and_param_tree(monkeypatch):
    """FFN module routes to the kernel when INT8_FFN is on (deterministic,
    prelu) without changing its parameter tree."""
    from mesm_tpu.models.layers import FFN

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    ffn = FFN(dim_feedforward=64, d_model=32, dropout=0.0, activation="prelu")
    params = ffn.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    base = ffn.apply({"params": params}, x, deterministic=True)

    monkeypatch.setattr(kernels, "use_int8_ffn", lambda: True)
    q_params = ffn.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    assert jax.tree.structure(q_params) == jax.tree.structure(params)
    got = ffn.apply({"params": params}, x, deterministic=True)
    want = ffn_int8_reference(
        x, params["linear1"]["kernel"], params["linear1"]["bias"],
        params["PReLU_0"]["alpha"], params["linear2"]["kernel"],
        params["linear2"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2)
    # and the quantized path is close to the exact one
    assert float(jnp.abs(got - base).mean() / jnp.abs(base).mean()) < 0.05

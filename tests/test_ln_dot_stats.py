"""Dot-stats LayerNorm (models/layers.ln_dot_stats): parity vs nn.LayerNorm.

The variant computes LN statistics as MXU dot-products with a ones-vector so
the feature-axis reduction survives the L-minor layouts the packed eval
formulations induce (kernels.use_dot_stats_ln). Functional contract: flax
nn.LayerNorm semantics (f32 fast-variance stats); for bf16 inputs the squares
round to bf16 (flax squares in f32), so bf16 parity is tolerance-gated here
and METRIC-gated on TPU (scripts/tpu_check.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mesm_tpu import kernels
from mesm_tpu.models.layers import apply_ln, ln_dot_stats


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
def test_ln_dot_stats_matches_flax(dtype, tol):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 32) * 3 + 1, dtype)
    scale = jnp.asarray(rng.randn(32), jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)

    norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    want = norm.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = ln_dot_stats(x, scale, bias, 1e-5)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol * 5,
    )


class _Block(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        return apply_ln(
            self,
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1"),
            x,
            deterministic=deterministic,
        )


def test_apply_ln_gate_params_and_values():
    """Gated on (mode 'on' opens the CPU path), apply_ln must keep the exact
    nn.LayerNorm param layout and match its values."""
    x = jnp.asarray(np.random.RandomState(1).randn(64, 80, 16), jnp.float32)
    blk = _Block()
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params["norm1"].keys()) == {"scale", "bias"}

    off = blk.apply({"params": params}, x)
    kernels.set_dot_stats_ln(True)
    try:
        with kernels.pallas_scope(True):
            assert kernels.use_dot_stats_ln(64 * 80, 16)
            on = blk.apply({"params": params}, x)
            # non-deterministic calls (training) must keep the stock path
            # regardless of the gate
            train = blk.apply({"params": params}, x, deterministic=False)
    finally:
        kernels.set_dot_stats_ln(False)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(train), np.asarray(off))


def test_t2v_layer_gated_matches_stock():
    """The wired sites (T2VLayer norm1/norm2) must produce the same outputs
    with the dot-stats gate open (f32: exact stats, tolerance ~1e-5)."""
    from mesm_tpu.models.t2v import T2VLayer

    rng = np.random.RandomState(2)
    B, Lt, Lv, D = 16, 8, 40, 32  # n_rows = 640 < threshold...
    kernels.DOT_STATS_MIN_ROWS, saved = 1, kernels.DOT_STATS_MIN_ROWS
    x_txt = jnp.asarray(rng.randn(B, Lt, D), jnp.float32)
    x_vid = jnp.asarray(rng.randn(B, Lv, D), jnp.float32)
    tmask = jnp.asarray(rng.rand(B, Lt) > 0.2)
    layer = T2VLayer(d_model=D, num_heads=4, dim_feedforward=64, dropout=0.0)
    params = layer.init(
        jax.random.PRNGKey(0), x_txt, x_vid, tmask, None, None
    )["params"]
    try:
        off = layer.apply({"params": params}, x_txt, x_vid, tmask, None, None)
        kernels.set_dot_stats_ln(True)
        with kernels.pallas_scope(True):
            on = layer.apply({"params": params}, x_txt, x_vid, tmask, None, None)
    finally:
        kernels.set_dot_stats_ln(False)
        kernels.DOT_STATS_MIN_ROWS = saved
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), rtol=2e-5, atol=2e-5)


def test_dot_stats_dispatch_bounds():
    kernels.set_dot_stats_ln(True)
    try:
        with kernels.pallas_scope(True):
            assert kernels.use_dot_stats_ln(4096, 256)
            assert not kernels.use_dot_stats_ln(4095, 256)  # small row counts
            assert not kernels.use_dot_stats_ln(8192, 2818)  # wide features
        with kernels.pallas_scope(False):
            assert not kernels.use_dot_stats_ln(8192, 256)  # metric-parity lever
        with kernels.pallas_scope(None):  # auto: requires a TPU backend
            assert not kernels.use_dot_stats_ln(8192, 256)
    finally:
        kernels.set_dot_stats_ln(False)

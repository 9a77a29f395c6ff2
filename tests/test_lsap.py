"""On-device LSAP vs scipy.optimize.linear_sum_assignment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mesm_tpu.ops.lsap import solve_lsap, solve_lsap_batch


def _total(cost, col4row):
    return sum(cost[i, int(c)] for i, c in enumerate(col4row))


@pytest.mark.parametrize("n,m,seed", [(1, 10, 0), (3, 10, 1), (5, 10, 2), (5, 5, 3), (8, 16, 4)])
def test_matches_scipy_optimal_cost(n, m, seed):
    rng = np.random.default_rng(seed)
    for trial in range(20):
        cost = rng.normal(size=(n, m)).astype(np.float32) * 10
        ours = np.asarray(solve_lsap(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == n, "assignment must be a matching"
        np.testing.assert_allclose(
            _total(cost, ours), cost[rows, cols].sum(), rtol=1e-5, atol=1e-4
        )


def test_row_mask_padding_is_inert():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n_valid = int(rng.integers(1, 6))
        cost_valid = rng.normal(size=(n_valid, 10)).astype(np.float32) * 5
        # pad to 5 rows
        cost = np.zeros((5, 10), np.float32)
        cost[:n_valid] = cost_valid
        mask = np.zeros(5, bool)
        mask[:n_valid] = True
        ours = np.asarray(solve_lsap(jnp.asarray(cost), jnp.asarray(mask)))[:n_valid]
        rows, cols = linear_sum_assignment(cost_valid)
        assert len(set(ours.tolist())) == n_valid
        np.testing.assert_allclose(
            _total(cost_valid, ours), cost_valid[rows, cols].sum(), rtol=1e-5, atol=1e-4
        )


def test_batched_and_jittable():
    rng = np.random.default_rng(11)
    cost = rng.normal(size=(6, 4, 10)).astype(np.float32)
    mask = np.ones((6, 4), bool)
    mask[2, 2:] = False
    fn = jax.jit(solve_lsap_batch)
    out = np.asarray(fn(jnp.asarray(cost), jnp.asarray(mask)))
    assert out.shape == (6, 4)
    for b in range(6):
        nv = int(mask[b].sum())
        rows, cols = linear_sum_assignment(cost[b, :nv])
        np.testing.assert_allclose(
            _total(cost[b, :nv], out[b, :nv]),
            cost[b, :nv][rows, cols].sum(),
            rtol=1e-5,
            atol=1e-4,
        )

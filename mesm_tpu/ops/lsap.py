"""On-device linear sum assignment (rectangular Hungarian / Jonker-Volgenant).

The reference ships every cost matrix to the CPU and calls
scipy.optimize.linear_sum_assignment per sample per decoder layer
(reference model/matcher.py:106-117) — a device->host sync on every training
step. Here the O(n^3) shortest-augmenting-path algorithm runs inside the XLA
program with `lax` loops, so matching fuses into the train step.

Problem sizes are tiny (rows = targets <= 5, cols = queries = 10), so the
sequential inner loops cost nothing; the win is staying on device.

Conventions:
  - cost: (n, m) with n <= m. Each row is assigned a distinct column.
  - Variable row counts are handled by padding invalid rows with a constant
    cost; a constant (column-independent) row cannot change which columns the
    valid rows receive, it only absorbs leftover columns.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Python floats, NOT jnp scalars: a module-level jnp.float32(...) would
# materialize a device constant at import time and initialize the XLA
# backend — which breaks jax.distributed.initialize() on multi-host setups
# (it must run before any backend use; see parallel/multihost.py). These are
# f32-exact and take their dtype from the expressions they enter.
_INF = 1e30
_BIG = 1e6


def solve_lsap(cost: jnp.ndarray, row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve min-cost assignment for a (n, m) cost matrix, n <= m.

    Args:
      cost: (n, m) float matrix.
      row_mask: optional (n,) bool; False rows are padded with a constant cost
        (their returned column is meaningless and must be masked by the caller).

    Returns:
      col4row: (n,) int32, column assigned to each row. The assignment restricted
      to valid rows is optimal and matches scipy.optimize.linear_sum_assignment.
    """
    n, m = cost.shape
    if n > m:
        raise ValueError(f"solve_lsap requires n <= m, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    if row_mask is not None:
        cost = jnp.where(row_mask[:, None], cost, _BIG)

    # e-maxx style shortest augmenting path with dual potentials.
    # 1-indexed rows (1..n) and columns (1..m); index 0 is the virtual slot.
    def insert_row(i, carry):
        u, v, p = carry  # u:(n+1,), v:(m+1,), p:(m+1,) row matched to column j
        p = p.at[0].set(i)
        minv = jnp.full((m + 1,), _INF, jnp.float32)
        way = jnp.zeros((m + 1,), jnp.int32)
        used = jnp.zeros((m + 1,), bool)

        def cond(state):
            _, _, p_, _, _, _, j0 = state
            return p_[j0] != 0

        def body(state):
            u_, v_, p_, minv_, way_, used_, j0 = state
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0 - 1, :] - u_[i0] - v_[1:]
            better = (~used_[1:]) & (cur < minv_[1:])
            minv_ = minv_.at[1:].set(jnp.where(better, cur, minv_[1:]))
            way_ = way_.at[1:].set(jnp.where(better, j0, way_[1:]))
            reach = jnp.where(used_[1:], _INF, minv_[1:])
            j1 = jnp.argmin(reach).astype(jnp.int32) + 1
            delta = reach[j1 - 1]
            # Dual update: used columns' rows gain delta, used columns lose it,
            # tentative distances of unused columns shrink by it.
            u_ = u_.at[p_].add(jnp.where(used_, delta, 0.0))
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = jnp.where(used_, minv_, minv_ - delta)
            return (u_, v_, p_, minv_, way_, used_, j1)

        state = (u, v, p, minv, way, used, jnp.int32(0))
        u, v, p, minv, way, used, j0 = lax.while_loop(cond, body, state)

        # Walk the augmenting path back, flipping matched edges.
        def aug_cond(s):
            _, j0_ = s
            return j0_ != 0

        def aug_body(s):
            p_, j0_ = s
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (p_, j1)

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    p0 = jnp.zeros((m + 1,), jnp.int32)
    _, _, p = lax.fori_loop(1, n + 1, insert_row, (u0, v0, p0))

    # Invert column->row matching into row->column.
    rows = p[1:]  # (m,), 0 = unmatched column
    scatter_idx = jnp.where(rows > 0, rows - 1, n)  # n is out of bounds -> dropped
    col4row = jnp.zeros((n,), jnp.int32).at[scatter_idx].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop"
    )
    return col4row


def solve_lsap_batch(cost: jnp.ndarray, row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """vmapped solve_lsap: (B, n, m) [+ (B, n) mask] -> (B, n)."""
    if row_mask is None:
        return jax.vmap(lambda c: solve_lsap(c))(cost)
    return jax.vmap(solve_lsap)(cost, row_mask)

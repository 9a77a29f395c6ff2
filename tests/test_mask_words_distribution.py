"""Statistical validation of the Gumbel top-k MLM masking deviation.

PARITY.md deviation #2 claims mesm_tpu's on-device weighted Gumbel top-k
(models/mesm.py gumbel_mask_words_choice) draws the same distribution as the
reference's host-side weighted np.random.choice without replacement
(reference model/model.py:361-384: choices = np.random.choice(l, m,
replace=False, p=w)). This test makes the claim empirical: chi-square of
both samplers' chosen-SET frequencies against the EXACT enumeration of
sequential weighted sampling without replacement, including the POS-bias
case (words_weight 2 for NN/VB/JJ/RB tokens, 1 otherwise — reference
dataset/tokenizer.py:139-147).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import chisquare

from mesm_tpu.models.mesm import gumbel_mask_words_choice


def exact_set_probs(p, m):
    """P(chosen set S) for sequential weighted sampling w/o replacement:
    sum over orderings of S of prod p_i / (remaining mass)."""
    n = len(p)
    probs = {}
    for perm in itertools.permutations(range(n), m):
        pr, mass = 1.0, 1.0
        for i in perm:
            pr *= p[i] / mass
            mass -= p[i]
        key = frozenset(perm)
        probs[key] = probs.get(key, 0.0) + pr
    return probs


def draws_to_counts(sets, categories):
    index = {s: i for i, s in enumerate(categories)}
    counts = np.zeros(len(categories), np.int64)
    for s in sets:
        counts[index[s]] += 1
    return counts


@pytest.mark.slow
@pytest.mark.parametrize(
    "weights",
    [
        np.array([1, 1, 1, 1, 1, 1, 1], np.float32),  # uniform
        np.array([2, 1, 2, 1, 1, 2, 1], np.float32),  # POS bias (weight 2)
    ],
    ids=["uniform", "pos_biased"],
)
def test_gumbel_topk_matches_weighted_choice_without_replacement(weights):
    L = len(weights)  # valid length 7 -> m = 7 // 3 = 2 masked words
    m = max(L // 3, 1)
    N = 20000
    p = weights.astype(np.float64)
    p /= p.sum()
    theory = exact_set_probs(p, m)
    categories = sorted(theory, key=sorted)
    expected = np.array([theory[s] for s in categories]) * N
    assert abs(expected.sum() - N) < 1e-6 * N

    # ours: one vectorized draw of N rows through the real model function
    pad = 3  # trailing padding positions exercise the eligibility mask
    words_mask = jnp.asarray(
        np.repeat([[1] * L + [0] * pad], N, axis=0).astype(np.float32)
    )
    words_weight = jnp.asarray(
        np.repeat([list(weights) + [0.0] * pad], N, axis=0).astype(np.float32)
    )
    chosen = np.asarray(
        gumbel_mask_words_choice(jax.random.PRNGKey(7), words_mask, words_weight)
    )
    assert chosen[:, L:].sum() == 0  # padding never chosen
    assert (chosen.sum(1) == m).all()
    ours = [frozenset(np.flatnonzero(row)) for row in chosen]

    # reference sampler: np.random.choice without replacement, row by row
    rng = np.random.default_rng(11)
    ref = []
    for _ in range(N):
        # np.random.choice p= uses the normalized weights like the reference
        # (F.normalize(weight, p=1) then np.random.choice(..., p=p))
        ref.append(frozenset(rng.choice(L, m, replace=False, p=p).tolist()))

    for name, sample in (("gumbel_topk", ours), ("np_choice", ref)):
        counts = draws_to_counts(sample, categories)
        stat, pvalue = chisquare(counts, f_exp=expected)
        assert pvalue > 1e-4, (
            f"{name} deviates from the exact weighted-without-replacement "
            f"law: chi2={stat:.1f} p={pvalue:.2e}"
        )


@pytest.mark.slow
def test_gumbel_topk_short_rows_left_unmasked():
    """Rows with <= 1 valid word are never masked (reference :372-373)."""
    words_mask = jnp.asarray([[1, 0, 0], [1, 1, 0]], jnp.float32)
    words_weight = jnp.asarray([[1, 0, 0], [1, 1, 0]], jnp.float32)
    chosen = np.asarray(
        gumbel_mask_words_choice(jax.random.PRNGKey(0), words_mask, words_weight)
    )
    assert chosen[0].sum() == 0  # l == 1: untouched
    assert chosen[1].sum() == 1  # l == 2: m = max(0, 1) = 1

"""Span geometry golden tests (goldens from reference docstring examples,
utils/span_utils.py:12-19,31-38,54-60,105-109 and utils/data_utils.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mesm_tpu.ops import span


def test_span_xx_to_cxw_golden():
    spans = jnp.array([[0.0, 1.0], [0.2, 0.4]])
    out = span.span_xx_to_cxw(spans)
    np.testing.assert_allclose(out, [[0.5, 1.0], [0.3, 0.2]], atol=1e-6)


def test_span_xx_to_cxw_batched():
    spans = jnp.array([[[0.0, 1.0], [0.2, 0.4]]])
    out = span.span_xx_to_cxw(spans)
    np.testing.assert_allclose(out, [[[0.5, 1.0], [0.3, 0.2]]], atol=1e-6)


def test_span_cxw_to_xx_golden():
    spans = jnp.array([[0.5, 1.0], [0.3, 0.2]])
    out = span.span_cxw_to_xx(spans)
    np.testing.assert_allclose(out, [[0.0, 1.0], [0.2, 0.4]], atol=1e-6)


def test_roundtrip():
    rng = np.random.default_rng(1)
    st = rng.uniform(0, 0.5, (16,))
    ed = st + rng.uniform(0, 0.5, (16,))
    xx = jnp.stack([jnp.asarray(st), jnp.asarray(ed)], axis=-1)
    back = span.span_cxw_to_xx(span.span_xx_to_cxw(xx))
    np.testing.assert_allclose(back, xx, atol=1e-6)


def test_temporal_iou_golden():
    s1 = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    iou, union = span.temporal_iou(s1, s2)
    np.testing.assert_allclose(iou, [[0.6667, 0.2], [0.0, 0.5]], atol=1e-4)
    np.testing.assert_allclose(union, [[0.3, 1.0], [0.8, 1.0]], atol=1e-4)


def test_generalized_temporal_iou_golden():
    s1 = jnp.array([[0.0, 0.2], [0.5, 1.0]])
    s2 = jnp.array([[0.0, 0.3], [0.0, 1.0]])
    giou = span.generalized_temporal_iou(s1, s2)
    np.testing.assert_allclose(giou, [[0.6667, 0.2], [-0.2, 0.5]], atol=1e-4)


def test_pairwise_matches_diag():
    rng = np.random.default_rng(2)
    st = rng.uniform(0, 0.5, (8,))
    ed = st + rng.uniform(0.01, 0.5, (8,))
    a = jnp.stack([jnp.asarray(st), jnp.asarray(ed)], -1)
    st2 = rng.uniform(0, 0.5, (8,))
    ed2 = st2 + rng.uniform(0.01, 0.5, (8,))
    b = jnp.stack([jnp.asarray(st2), jnp.asarray(ed2)], -1)
    full = span.generalized_temporal_iou(a, b)
    diag = span.pairwise_generalized_temporal_iou(a, b)
    np.testing.assert_allclose(diag, jnp.diagonal(full), atol=1e-6)
    full_iou, _ = span.temporal_iou(a, b)
    np.testing.assert_allclose(
        span.pairwise_temporal_iou(a, b), jnp.diagonal(full_iou), atol=1e-6
    )


def test_np_cross_matches_jnp():
    rng = np.random.default_rng(3)
    st = rng.uniform(0, 0.5, (5,)); ed = st + rng.uniform(0.01, 0.5, (5,))
    a = np.stack([st, ed], -1)
    st2 = rng.uniform(0, 0.5, (7,)); ed2 = st2 + rng.uniform(0.01, 0.5, (7,))
    b = np.stack([st2, ed2], -1)
    np_iou, np_union = span.np_temporal_iou_cross(a, b)
    j_iou, j_union = span.temporal_iou(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np_iou, j_iou, atol=1e-6)
    np.testing.assert_allclose(np_union, j_union, atol=1e-6)


def test_np_paired_loose_union():
    pred = np.array([[0.0, 1.0], [2.0, 3.0], [1.0, 1.0]])
    gt = np.array([[0.5, 1.5], [2.0, 3.0], [1.0, 1.0]])
    iou = span.np_temporal_iou_paired(pred, gt)
    # loose union = enclosing interval (reference behavior)
    np.testing.assert_allclose(iou, [0.5 / 1.5, 1.0, 0.0], atol=1e-6)

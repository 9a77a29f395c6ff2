"""Native C++ extension vs the pure-Python/numpy implementations."""
import numpy as np
import pytest

from mesm_tpu import native


@pytest.fixture(scope="module")
def nat():
    mod = native.get_native()
    if mod is None:
        pytest.skip("native toolchain unavailable")
    return mod


def test_mean_pool_matches_numpy(nat):
    from mesm_tpu.data.datasets import mean_pool_downsample

    rng = np.random.default_rng(0)
    for L, D, M in [(37, 5, 10), (1402, 16, 600), (21, 3, 20)]:
        feat = rng.normal(size=(L, D)).astype(np.float32)
        fast = native.mean_pool_native(feat, M)
        # numpy reference: cumsum path (bypasses the native dispatch)
        idxs = np.round(np.arange(0, M + 1) / M * L).clip(max=L - 1).astype(int)
        s, e = idxs[:-1], idxs[1:]
        cs = np.concatenate([np.zeros((1, D), np.float32), np.cumsum(feat, 0)])
        slow = (cs[e] - cs[s]) / (e - s).clip(min=1)[:, None]
        deg = s >= e
        slow[deg] = feat[s[deg]]
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)
        # dispatched path agrees as well
        np.testing.assert_allclose(mean_pool_downsample(feat, M), fast, rtol=1e-4, atol=1e-5)


def _py_nms(predictions, thd, max_after):
    def iou(a, b):
        inter = max(0, min(a[1], b[1]) - max(a[0], b[0]))
        uni = max(a[1], b[1]) - min(a[0], b[0])
        return inter / uni if uni else 0

    pool = sorted(predictions, key=lambda x: x[2], reverse=True)
    kept = []
    while pool and len(kept) < max_after:
        best = pool.pop(0)
        kept.append(best)
        pool = [p for p in pool if iou(best[:2], p[:2]) <= thd]
    return kept


def test_nms_matches_python(nat):
    rng = np.random.default_rng(1)
    for _ in range(30):
        n = int(rng.integers(2, 25))
        st = rng.uniform(0, 100, n)
        ed = st + rng.uniform(1, 40, n)
        sc = rng.uniform(0, 1, n)
        preds = np.stack([st, ed, sc], -1).tolist()
        fast_idx = native.temporal_nms_native(np.asarray(preds), 0.5, 10)
        fast = [preds[i] for i in fast_idx]
        slow = _py_nms(preds, 0.5, 10)
        assert fast == slow


def test_ap_matches_python(nat):
    from mesm_tpu.metrics import average_precision_detection

    rng = np.random.default_rng(2)
    thds = np.linspace(0.5, 0.95, 10)
    for _ in range(20):
        n_gt = int(rng.integers(1, 5))
        n_pred = int(rng.integers(1, 12))
        gts = []
        for _ in range(n_gt):
            st = rng.uniform(0, 80)
            gts.append({"video-id": "q", "t-start": st, "t-end": st + rng.uniform(2, 30)})
        preds = []
        for _ in range(n_pred):
            st = rng.uniform(0, 80)
            preds.append(
                {"video-id": "q", "t-start": st, "t-end": st + rng.uniform(2, 30),
                 "score": float(rng.uniform(0, 1))}
            )
        fast = native.ap_detection_native(
            np.array([[p["t-start"], p["t-end"], p["score"]] for p in preds]),
            np.array([[g["t-start"], g["t-end"]] for g in gts]),
            thds,
        )
        # pure-python path: route around the native dispatch via 2 video ids
        gts2 = [dict(g) for g in gts]
        gts2[0]["video-id"] = "q"
        slow = _py_ap(gts, preds, thds)
        np.testing.assert_allclose(fast, slow, atol=1e-9)


def _py_ap(ground_truth, prediction, tiou_thresholds):
    """Direct port of the reference AP loop for oracle purposes."""
    from mesm_tpu.metrics import interpolated_precision_recall
    from mesm_tpu.ops.span import np_temporal_iou_cross

    n_thds = len(tiou_thresholds)
    n_gts = len(ground_truth)
    ap = np.zeros(n_thds)
    lock = np.full((n_thds, n_gts), -1)
    prediction = sorted(prediction, key=lambda x: -x["score"])
    tp = np.zeros((n_thds, len(prediction)))
    fp = np.zeros((n_thds, len(prediction)))
    gts = [dict(g, index=i) for i, g in enumerate(ground_truth)]
    for idx, pred in enumerate(prediction):
        p = np.array([[pred["t-start"], pred["t-end"]]])
        g = np.array([[x["t-start"], x["t-end"]] for x in gts])
        tious = np_temporal_iou_cross(p, g)[0].reshape(-1)
        order = tious.argsort()[::-1]
        for t_idx, thr in enumerate(tiou_thresholds):
            for j in order:
                if tious[j] < thr:
                    fp[t_idx, idx] = 1
                    break
                if lock[t_idx, gts[j]["index"]] >= 0:
                    continue
                tp[t_idx, idx] = 1
                lock[t_idx, gts[j]["index"]] = idx
                break
            if fp[t_idx, idx] == 0 and tp[t_idx, idx] == 0:
                fp[t_idx, idx] = 1
    tpc = np.cumsum(tp, 1)
    fpc = np.cumsum(fp, 1)
    rec = tpc / n_gts
    prec = tpc / (tpc + fpc)
    for t_idx in range(n_thds):
        ap[t_idx] = interpolated_precision_recall(prec[t_idx], rec[t_idx])
    return ap

"""Metric-suite parity against the reference's ACTUAL eval code.

Imports /root/reference/eval.py (stubbing the absent `ftfy` dependency pulled
in via its dataset package) and compares `eval_submission` outputs — every
brief key and the per-range R1/mAP tables — on randomized synthetic
submissions, for both the charades IoU-threshold family and the TACoS family
(superlong range + {0.1,0.3,0.5,0.7} thresholds).

Reference anchors: eval.py:164-440 (eval_submission / eval_moment_retrieval /
compute_mr_ap / compute_mr_r1); ranges eval.py:233-262.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_eval():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "ftfy" not in sys.modules:  # only used at tokenize time, never here
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    import eval as ref_eval_module

    # The reference's compute_mr_ap uses mp.Pool (fork). Forking this
    # multithreaded (JAX-initialized) pytest process can deadlock the
    # children on inherited lock state — observed as a wedged suite with
    # orphaned pool workers (and forkserver can't re-import the reference's
    # `eval` module in its clean helper). Swap its `mp` handle for a serial
    # Pool shim: identical math, no forks, and faster on a 1-core host.
    class _SerialPool:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def imap_unordered(self, fn, it, chunksize=1):
            return map(fn, it)

    ref_eval_module.mp = types.SimpleNamespace(Pool=_SerialPool)
    return ref_eval_module


def fabricate_submission(rng, n=60, max_windows=1, dur_range=(20, 200)):
    submission, gt = [], []
    for qid in range(n):
        dur = float(rng.uniform(*dur_range))
        n_gt = int(rng.integers(1, max_windows + 1))
        gt_windows = []
        for _ in range(n_gt):
            st = float(rng.uniform(0, dur * 0.8))
            ed = float(rng.uniform(st + 0.5, dur))
            gt_windows.append([st, ed])
        preds = []
        for k in range(10):
            # mix of near-hits and misses so every IoU threshold is exercised
            if k == 0 and rng.random() < 0.6:
                st, ed = gt_windows[0]
                jitter = rng.uniform(-0.15, 0.15, 2) * (ed - st)
                p = [max(st + jitter[0], 0), min(ed + jitter[1], dur)]
            else:
                a = float(rng.uniform(0, dur * 0.9))
                p = [a, min(a + float(rng.uniform(1, dur / 2)), dur)]
            preds.append([round(p[0], 4), round(p[1], 4), round(float(rng.random()), 4)])
        preds.sort(key=lambda r: -r[2])
        submission.append(
            dict(qid=qid, query=f"q{qid}", vid=f"v{qid % 17}",
                 pred_relevant_windows=preds)
        )
        gt.append(dict(qid=qid, query=f"q{qid}", vid=f"v{qid % 17}",
                       duration=dur, relevant_windows=gt_windows))
    return submission, gt


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif isinstance(v, (int, float)) or v is None:
            out[key] = v
    return out


@pytest.mark.parametrize("dataset_name,seed", [("charades", 0), ("tacos", 1)])
def test_eval_submission_matches_reference(ref_eval, dataset_name, seed):
    from mesm_tpu.metrics import eval_submission as ours

    rng = np.random.default_rng(seed)
    dur_range = (20, 1000) if dataset_name == "tacos" else (20, 200)
    submission, gt = fabricate_submission(rng, n=60, dur_range=dur_range)

    theirs = ref_eval.eval_submission(
        submission, gt, verbose=False, dataset_name=dataset_name
    )
    mine = ours(submission, gt, dataset_name=dataset_name, num_workers=2)

    ft, fm = _flatten(theirs), _flatten(mine)
    for k, v in ft.items():
        assert k in fm, f"missing metric {k}"
        if v is None:
            assert fm[k] is None, k
        else:
            assert abs(fm[k] - v) < 1e-6, f"{k}: ref {v} vs ours {fm[k]}"

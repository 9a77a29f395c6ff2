"""Batcher/loader edge cases."""
import numpy as np
import pytest

from mesm_tpu.data.pipeline import Loader
from mesm_tpu.data.sampler import GroupAwareBatcher, RowBudgetBatcher


class FakeDataset:
    def __init__(self, groups):  # groups: list of (video_id, n_rows)
        self.merged_data = [
            {"video_id": [vid] * n, "n": n} for vid, n in groups
        ]

    def max_group_size(self):
        return max(len(e["video_id"]) for e in self.merged_data)

    def __len__(self):
        return len(self.merged_data)

    def __getitem__(self, i):
        return self.merged_data[i]


def test_capacity_too_small_raises():
    ds = FakeDataset([("a", 5), ("b", 2)])
    with pytest.raises(ValueError, match="row_capacity"):
        RowBudgetBatcher(ds, row_capacity=4, shuffle=False)


def test_single_group_batches_dropped():
    ds = FakeDataset([("a", 2), ("a", 2), ("b", 2)])
    # capacity 2: every batch has one entry -> all single-group -> dropped
    batches = list(RowBudgetBatcher(ds, row_capacity=2, shuffle=False))
    assert batches == []
    # eval mode keeps them
    batches = list(
        RowBudgetBatcher(ds, row_capacity=2, shuffle=False, drop_single_group=False)
    )
    assert sum(len(b) for b in batches) == 3


def test_shuffle_varies_by_epoch():
    ds = FakeDataset([(f"v{i}", 1) for i in range(20)])
    b = RowBudgetBatcher(ds, row_capacity=5, shuffle=True, seed=0)
    e1 = [tuple(x) for x in b]
    e2 = [tuple(x) for x in b]
    assert e1 != e2  # reshuffled across epochs
    # but a fresh batcher with the same seed replays epoch 1
    b2 = RowBudgetBatcher(ds, row_capacity=5, shuffle=True, seed=0)
    assert [tuple(x) for x in b2] == e1


def test_group_aware_never_repeats_video():
    ds = FakeDataset([("a", 1), ("a", 1), ("a", 1), ("b", 1), ("c", 1), ("c", 1)])
    for batch in GroupAwareBatcher(ds, row_capacity=3, shuffle=True, seed=1):
        vids = [ds.merged_data[i]["video_id"][0] for i in batch]
        assert len(vids) == len(set(vids))


def test_loader_propagates_worker_errors():
    class Exploding(FakeDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    ds = Exploding([("a", 1), ("b", 1), ("c", 1), ("d", 1)])
    batcher = RowBudgetBatcher(ds, row_capacity=2, shuffle=False)
    loader = Loader(ds, batcher, collate=lambda e: e, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)

"""Data layer tests over synthetic annotation + HDF5 fixtures."""
import gzip
import json
import os

import numpy as np
import pytest

from mesm_tpu.data import (
    CharadesDataset,
    GloVeSimpleTokenizer,
    GroupAwareBatcher,
    Loader,
    QVHighlightsDataset,
    RowBudgetBatcher,
    Vocabulary,
)
from mesm_tpu.data.collate import BatchSpec, make_collate
from mesm_tpu.data.datasets import mean_pool_downsample
from mesm_tpu.data.tokenizers import ClipBPETokenizer

import h5py

DV = 12
SENTS = [
    "a person opens the door",
    "someone closes a window",
    "the dog runs fast",
    "a man reads the book",
    "person turns on a light",
]


@pytest.fixture(scope="module")
def charades_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("charades")
    ann = root / "annotations"
    ann.mkdir()
    rng = np.random.default_rng(0)
    vids = [f"V{i:03d}" for i in range(6)]
    durations = {v: float(rng.integers(20, 40)) for v in vids}

    for split, fname in [("train", "charades_sta_train.txt"), ("test", "charades_sta_test.txt")]:
        lines = []
        for i, v in enumerate(vids):
            for j in range((i % 3) + 1):  # 1..3 sentences per video
                d = durations[v]
                st = float(rng.uniform(0, d * 0.6))
                ed = float(rng.uniform(st + 1, d))
                lines.append(f"{v} {st:.2f} {ed:.2f}##{SENTS[(i + j) % len(SENTS)]}\n")
        (ann / fname).write_text("".join(lines))

    for fname in ["Charades_v1_train.csv", "Charades_v1_test.csv"]:
        rows = ["id,subject,scene,quality,relevance,verified,script,objects,descriptions,length\n"]
        for v in vids:
            rows.append(f"{v},s,x,7,7,Yes,script,objects,desc,{durations[v]}\n")
        (ann / fname).write_text("".join(rows))

    words = sorted({w for s in SENTS for w in s.split()})
    vocab = Vocabulary(words)
    with open(ann / "GloVe_tokenized_count.txt", "w") as f:
        for w in words:
            f.write(f"{w} {vocab.wtoi[w]} 5\n")

    feat = root / "feat.hdf5"
    with h5py.File(feat, "w") as f:
        for v in vids:
            L = int(rng.integers(15, 40))
            f.create_dataset(v, data=rng.normal(size=(L, DV)).astype(np.float32))

    return dict(ann=str(ann), feat=str(feat), vocab=vocab, vids=vids, durations=durations)


def make_charades(root, split="train", max_gather_size=-1, recfw=True, clip_len=1):
    return CharadesDataset(
        ann_path=root["ann"],
        feat_files=[root["feat"]],
        split=split,
        use_tef=True,
        clip_len=clip_len,
        max_words_l=8,
        max_video_l=20,
        tokenizer_type="GloVeSimple",
        load_vocab_pkl=False,
        bpe_path="",
        vocab=root["vocab"],
        normalize_video=True,
        contra_samples=2,
        recfw=recfw,
        vocab_size=10,
        max_gather_size=max_gather_size,
    )


def test_mean_pool_downsample_oracle():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(37, 5)).astype(np.float32)
    out = mean_pool_downsample(feat, 10)
    assert out.shape == (10, 5)
    # oracle: reference loop semantics (dataset/base.py:100-114)
    idxs = np.round(np.arange(0, 11) / 10 * 37).clip(max=36).astype(int)
    for i in range(10):
        s, e = idxs[i], idxs[i + 1]
        expect = feat[s:e].mean(0) if s < e else feat[s]
        np.testing.assert_allclose(out[i], expect, rtol=1e-5)
    short = rng.normal(size=(7, 5)).astype(np.float32)
    np.testing.assert_array_equal(mean_pool_downsample(short, 10), short)


def test_charades_dataset_item(charades_root):
    ds = make_charades(charades_root)
    assert len(ds) == 6  # one merged entry per video (max_gather_size=-1)
    item = ds[0]
    n = item["num_clips"]
    assert item["video_feat"].shape[1] == DV + 2  # TEF appended
    assert item["video_feat"].shape[0] <= 20
    assert item["words_id"].shape == (n, 8)
    assert item["clip_mask"].shape == (n, item["video_feat"].shape[0])
    assert item["clip_mask"].any(axis=1).all()
    assert item["pos_idx"].shape == (n, 2)
    # pos indices inside the clip, neg outside
    for i in range(n):
        assert item["clip_mask"][i][item["pos_idx"][i]].all()


def test_gather_size_chunks(charades_root):
    ds = make_charades(charades_root, max_gather_size=1)
    assert len(ds) == sum(len(v) for v in [e["sentence"] for e in ds.merged_data])
    assert ds.max_group_size() == 1


def test_collate_shapes_and_padding(charades_root):
    ds = make_charades(charades_root)
    spec = BatchSpec(row_capacity=8, max_video_l=20, group_capacity=3)
    collate = make_collate(spec)
    batch, meta = collate([ds[0], ds[1]])
    n_rows = meta["n_rows"]
    assert batch["video_feat"].shape == (8, 20, DV + 2)
    assert batch["row_mask"].sum() == n_rows
    assert batch["words_id"].shape == (8, 8)
    assert (batch["group_id"][: n_rows] <= 1).all()
    # ss gather: own position points back at the row itself
    for r in range(n_rows):
        assert batch["ss_sent_idx"][r, batch["ss_own_pos"][r]] == r
        assert batch["ss_sent_mask"][r, batch["ss_own_pos"][r]]
    # norm spans consistent with moment/duration
    nm = batch["norm_moment"][:n_rows]
    assert (nm >= 0).all() and (nm <= 1.0001).all()
    np.testing.assert_allclose(
        batch["norm_span"][:n_rows, 0], nm.mean(-1), rtol=1e-5
    )
    # padded rows are copies of row 0
    assert (batch["video_feat"][n_rows:] == batch["video_feat"][0][None]).all()


def test_collate_video_length_buckets(charades_root):
    """With buckets set, each batch pads to the smallest bucket that fits its
    longest video; values equal the fixed-bucket collate on the shared
    prefix."""
    ds = make_charades(charades_root)
    fixed = make_collate(BatchSpec(row_capacity=8, max_video_l=20, group_capacity=3))
    bucketed = make_collate(
        BatchSpec(
            row_capacity=8, max_video_l=20, group_capacity=3,
            video_buckets=(8, 16, 20),
        )
    )
    bb, meta = bucketed([ds[0], ds[1]])
    fb, _ = fixed([ds[0], ds[1]])
    Lv = bb["video_feat"].shape[1]
    assert Lv in (8, 16, 20)
    vmax = int(fb["video_mask"].sum(1).max())
    assert Lv == next(b for b in (8, 16, 20) if b >= vmax)
    np.testing.assert_array_equal(bb["video_feat"], fb["video_feat"][:, :Lv])
    np.testing.assert_array_equal(bb["video_mask"], fb["video_mask"][:, :Lv])
    np.testing.assert_array_equal(bb["clip_mask"], fb["clip_mask"][:, :Lv])
    np.testing.assert_array_equal(bb["norm_moment"], fb["norm_moment"])


def test_row_budget_batcher(charades_root):
    ds = make_charades(charades_root)
    b = RowBudgetBatcher(ds, row_capacity=5, shuffle=True, seed=0)
    for batch in b:
        rows = sum(len(ds.merged_data[i]["video_id"]) for i in batch)
        assert rows <= 5
        vids = {ds.merged_data[i]["video_id"][0] for i in batch}
        assert len(vids) >= 2


def test_group_aware_batcher(charades_root):
    ds = make_charades(charades_root, max_gather_size=1)
    b = GroupAwareBatcher(ds, row_capacity=4, shuffle=True, seed=0)
    seen = 0
    for batch in b:
        vids = [ds.merged_data[i]["video_id"][0] for i in batch]
        assert len(vids) == len(set(vids)), "same video twice in one batch"
        seen += len(batch)
    assert seen > 0


def test_loader_threaded_matches_serial(charades_root):
    ds = make_charades(charades_root)
    spec = BatchSpec(row_capacity=8, max_video_l=20, group_capacity=3)
    collate = make_collate(spec)
    b1 = RowBudgetBatcher(ds, row_capacity=8, shuffle=False)
    serial = list(Loader(ds, b1, collate, num_workers=1))
    b2 = RowBudgetBatcher(ds, row_capacity=8, shuffle=False)
    threaded = list(Loader(ds, b2, collate, num_workers=3))
    assert len(serial) == len(threaded)
    for (sb, sm), (tb, tm) in zip(serial, threaded):
        assert sm["qid"] == tm["qid"]
        np.testing.assert_array_equal(sb["video_mask"], tb["video_mask"])


def test_loader_process_pool_matches_serial(charades_root):
    """Process-pool loader mode (forkserver context): same batches, same
    order, same rng stream as serial/thread mode — the first process-mode
    epoch pins the dataset's epoch offset at 0 so item_rng keys match
    thread-mode epoch 0 (pipeline._iter_process), and the fixture's
    contra_samples=2 means pos_idx/neg_idx actually exercise that rng.
    Also covers loader picklability (dataset __getstate__ drops the thread
    lock, FeatureStore re-opens handles, Collate is a module-level class)."""
    import pickle

    ds = make_charades(charades_root)
    pickle.loads(pickle.dumps(ds.store))  # FeatureStore round-trips
    spec = BatchSpec(row_capacity=8, max_video_l=20, group_capacity=3)
    collate = make_collate(spec)
    pickle.loads(pickle.dumps(collate))  # collate must survive the worker trip
    b1 = RowBudgetBatcher(ds, row_capacity=8, shuffle=False)
    serial = list(Loader(ds, b1, collate, num_workers=1))  # epoch 0
    ds2 = make_charades(charades_root)
    pickle.loads(pickle.dumps(ds2))  # whole dataset round-trips
    b2 = RowBudgetBatcher(ds2, row_capacity=8, shuffle=False)
    loader2 = Loader(ds2, b2, collate, num_workers=2, mode="process")
    procs = list(loader2)  # process epoch 0 == serial epoch 0
    assert any("pos_idx" in sb for sb, _ in serial)  # rng path is exercised
    assert len(serial) == len(procs)
    for (sb, sm), (pb, pm) in zip(serial, procs):
        assert sm["qid"] == pm["qid"]
        assert set(sb) == set(pb)
        for k in sb:
            np.testing.assert_array_equal(sb[k], pb[k], err_msg=k)
    # epoch 1 advances the offset: fresh randomness, still deterministic
    b3 = RowBudgetBatcher(ds2, row_capacity=8, shuffle=False)
    procs1 = list(Loader(ds2, b3, collate, num_workers=2, mode="process"))
    assert ds2._epoch_offset == 1
    changed = False
    for (pb0, _), (pb1, _) in zip(procs, procs1):
        if "pos_idx" in pb0 and not np.array_equal(pb0["pos_idx"], pb1["pos_idx"]):
            changed = True
    assert changed, "epoch 1 should redraw contra samples"


def test_planned_bucket_batches_match_walk(charades_root):
    """evaluate.planned_bucket_batches predicts the walked loader's bucket
    set from HDF5 shape metadata alone — zero __getitem__ calls — and the
    batches built from its planned index lists carry EXACTLY the signatures
    the full walk produces (warm_eval_step's O(buckets) fast path)."""
    from mesm_tpu.evaluate import planned_bucket_batches

    ds = make_charades(charades_root)
    # exact_length == the actual per-item feature length, for every entry
    for i in range(len(ds)):
        assert ds.exact_length(i) == ds[i]["video_feat"].shape[0]
    ds._visit_counts = {}

    spec = BatchSpec(
        row_capacity=8, max_video_l=20, group_capacity=3,
        video_buckets=(16, 20),
    )
    b = RowBudgetBatcher(ds, row_capacity=8, shuffle=False)
    b.sort_by_length = True  # runner's eval batcher setting
    loader = Loader(ds, b, make_collate(spec), num_workers=1)

    planned = planned_bucket_batches(loader)  # consumes one batcher epoch
    assert planned is not None
    assert ds._visit_counts == {}, "prediction must not build items"

    def sig(batch):
        return tuple(sorted((k, np.asarray(v).shape) for k, v in batch.items()))

    walked = {}  # bucket -> signature (same order as the planned epoch:
    for batch, _meta in loader:  # shuffle=False + sort_by_length is stable)
        walked.setdefault(batch["video_mask"].shape[1], sig(batch))
    assert sorted(walked) == [bk for bk, _ in planned]
    for bucket, idx_batch in planned:
        built, _m = loader._build(idx_batch)
        assert built["video_mask"].shape[1] == bucket
        assert sig(built) == walked[bucket]


def test_planned_bucket_batches_fallback_none():
    """Hand-rolled loaders (no batcher/BatchSpec) return None: warm_eval_step
    falls back to the full walk."""
    from mesm_tpu.evaluate import planned_bucket_batches

    assert planned_bucket_batches([({"x": np.zeros(3)}, {})]) is None


# ---------------------------------------------------------------------------
# CLIP BPE tokenizer with a tiny synthetic merge table
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_bpe(tmp_path_factory):
    p = tmp_path_factory.mktemp("bpe") / "bpe.txt.gz"
    merges = ["#version: tiny", "t h", "th e</w>", "o g</w>", "d og</w>", "o p", "op e"]
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")
    return str(p)


def test_clip_bpe_tokenizer(tiny_bpe):
    id2label = {"<unknown>": 10, "<start>": 11, "<end>": 12}
    tok = ClipBPETokenizer(True, id2label, tiny_bpe)
    ids, weights, unk, labels = tok.tokenize("the dog", max_valid_length=8)
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.sot
    n = int((ids[0] != 0).sum())
    assert ids[0, n - 1] == tok.eot
    # "the" -> one merged token, "dog" -> one merged token
    assert n == 4  # sot the dog eot
    assert weights[0, 0] == 0  # sot carries weight 0
    assert (weights[0, 1:3] > 0).all()
    # unknown tokens (not in the 3-entry keep vocab) labeled <unknown>
    assert labels[0, 0] == 11 and labels[0, n - 1] == 12
    assert (labels[0, 1 : n - 1] == 10).all()
    assert unk[0, 1 : n - 1].all()
    # roundtrip decode
    assert tok.encode("the dog")[0] == [tok.encoder["the</w>"], tok.encoder["dog</w>"]]


# ---------------------------------------------------------------------------
# QVHighlights with synthetic jsonl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qvh_root(tmp_path_factory, charades_root):
    root = tmp_path_factory.mktemp("qvh")
    ann = root / "annotations"
    ann.mkdir()
    rng = np.random.default_rng(3)
    words = sorted({w for s in SENTS for w in s.split()})
    with open(ann / "GloVe_tokenized_count.txt", "w") as f:
        vocab = charades_root["vocab"]
        for w in words:
            f.write(f"{w} {vocab.wtoi[w]} 5\n")

    feat = root / "feat.hdf5"
    entries = []
    qid = 0
    with h5py.File(feat, "w") as f:
        for i in range(4):  # 4 raw videos, 2 clips each
            for c in range(2):
                vid = f"Y{i}_{c * 150:.1f}_{(c + 1) * 150:.1f}"
                L = int(rng.integers(10, 16))
                f.create_dataset(vid, data=rng.normal(size=(L, DV)).astype(np.float32))
                n_rel = int(rng.integers(2, 5))
                rel_ids = sorted(rng.choice(L, n_rel, replace=False).tolist())
                windows = [[int(r * 2), int(r * 2 + 2)] for r in rel_ids[:2]]
                qid += 1
                entries.append(
                    dict(
                        qid=qid,
                        query=SENTS[(i + c) % len(SENTS)],
                        vid=vid,
                        duration=2 * L,
                        relevant_clip_ids=rel_ids,
                        saliency_scores=[[int(x) for x in rng.integers(0, 5, 3)] for _ in rel_ids],
                        relevant_windows=windows,
                    )
                )
    with open(ann / "highlight_train_release.jsonl", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return dict(ann=str(ann), feat=str(feat), vocab=charades_root["vocab"])


def test_qvh_dataset_and_collate(qvh_root):
    ds = QVHighlightsDataset(
        ann_path=qvh_root["ann"],
        feat_files=[qvh_root["feat"]],
        split="train",
        use_tef=True,
        clip_len=2,
        max_words_l=8,
        max_video_l=16,
        tokenizer_type="GloVeSimple",
        load_vocab_pkl=False,
        bpe_path="",
        vocab=qvh_root["vocab"],
        normalize_video=True,
        contra_samples=2,
        recfw=True,
        vocab_size=10,
        max_gather_size=-1,
        max_windows=5,
    )
    assert len(ds) == 4  # grouped by raw video id
    item = ds[0]
    assert item["num_clips"] == 2
    assert isinstance(item["video_feat"], list)
    assert item["norm_moment"][0].shape[1] == 2
    assert (item["saliency_label"][0] > 0).any()

    spec = BatchSpec(
        row_capacity=6, max_video_l=16, group_capacity=2,
        multi_clip=True, max_windows=5, ss_video_l=32,
    )
    collate = make_collate(spec)
    batch, meta = collate([ds[0], ds[1]])
    assert batch["norm_moment"].shape == (6, 5, 2)
    assert batch["tgt_mask"][: meta["n_rows"]].any(axis=1).all()
    assert batch["saliency_label"].shape == (6, 16)
    assert batch["ss_video_feat_groups"].shape == (2, 32, DV + 2)
    assert batch["ss_group_slot"][: meta["n_rows"]].max() == 1

    # exact_length: max over the entry's clips of min(HDF5 rows, cap) —
    # must equal the actual longest per-clip feature (warm-path predictor)
    for i in range(len(ds)):
        assert ds.exact_length(i) == max(f.shape[0] for f in ds[i]["video_feat"])

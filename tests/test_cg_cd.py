"""Charades-CG / -CD adapters: json parsing, inverted-span fixing, split files."""
import json
import os

import h5py
import numpy as np
import pytest

from mesm_tpu.data import CharadesCDDataset, CharadesCGDataset, Vocabulary

SENTS = ["a person opens the door", "the dog runs fast", "a man reads the book"]
DV = 8


@pytest.fixture(scope="module")
def cg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cg")
    ann = root / "annotations"
    ann.mkdir()
    rng = np.random.default_rng(0)
    vids = [f"G{i:02d}" for i in range(4)]

    def make_obj():
        obj = {}
        for i, v in enumerate(vids):
            duration = float(rng.integers(20, 40))
            stamps, sentences = [], []
            for j in range(2):
                st = float(rng.uniform(0, duration * 0.5))
                ed = float(rng.uniform(st + 1, duration))
                if j == 1:
                    st, ed = ed, st  # inverted annotation, must be fixed
                stamps.append([st, ed])
                sentences.append(SENTS[(i + j) % len(SENTS)])
            obj[v] = {"duration": duration, "timestamps": stamps, "sentences": sentences}
        return obj

    for name in ["train.json", "novel_composition.json", "novel_word.json", "test_trivial.json"]:
        with open(ann / name, "w") as f:
            json.dump(make_obj(), f)
    for name in ["charades_train.json", "charades_val.json", "charades_test_iid.json",
                 "charades_test_ood.json"]:
        with open(ann / name, "w") as f:
            json.dump(make_obj(), f)

    words = sorted({w for s in SENTS for w in s.split()})
    vocab = Vocabulary(words)
    with open(ann / "GloVe_tokenized_count.txt", "w") as f:
        for w in words:
            f.write(f"{w} {vocab.wtoi[w]} 5\n")
    feat = root / "feat.hdf5"
    with h5py.File(feat, "w") as f:
        for v in vids:
            f.create_dataset(v, data=rng.normal(size=(25, DV)).astype(np.float32))
    return dict(ann=str(ann), feat=str(feat), vocab=vocab)


def _make(cls, root, split):
    return cls(
        ann_path=root["ann"], feat_files=[root["feat"]], split=split,
        use_tef=True, clip_len=1, max_words_l=8, max_video_l=16,
        tokenizer_type="GloVeSimple", load_vocab_pkl=False, bpe_path="",
        vocab=root["vocab"], normalize_video=True, contra_samples=2,
        recfw=True, vocab_size=8, max_gather_size=-1,
    )


@pytest.mark.parametrize("cls,split", [
    (CharadesCGDataset, "train"),
    (CharadesCGDataset, "novel_composition"),
    (CharadesCGDataset, "novel_word"),
    (CharadesCDDataset, "test_ood"),
    (CharadesCDDataset, "val"),
])
def test_splits_load(cg_root, cls, split):
    ds = _make(cls, cg_root, split)
    assert len(ds.data) == 8  # 4 videos x 2 sentences
    for rec in ds.data:
        st, ed = rec["moment"]
        assert st <= ed <= 40  # inverted spans fixed, clamped to duration
        if split != "train":
            assert rec["qid"] is not None and rec["relevant_windows"] == [[st, ed]]
    item = ds[0]
    assert item["video_feat"].shape[1] == DV + 2
    assert item["clip_mask"].any(axis=1).all()

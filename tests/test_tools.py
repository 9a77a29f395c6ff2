"""Offline data tools (npy2hdf5, keep-vocab count files)."""
import os

import h5py
import numpy as np

from mesm_tpu.data.tools import build_glove_count, npy2hdf5
from mesm_tpu.data.datasets import load_glove_keep_vocab


def test_npy2hdf5_roundtrip(tmp_path):
    feats = {}
    for i in range(3):
        arr = np.random.default_rng(i).normal(size=(5 + i, 4)).astype(np.float32)
        np.save(tmp_path / f"vid{i}.npy", arr)
        feats[f"vid{i}"] = arr
    out = tmp_path / "out.hdf5"
    npy2hdf5(str(tmp_path / "*.npy"), str(out))
    with h5py.File(out) as f:
        for vid, arr in feats.items():
            np.testing.assert_array_equal(f[vid][:], arr)


def test_npz2hdf5(tmp_path):
    arr = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
    np.savez(tmp_path / "vidx.npz", features=arr)
    out = tmp_path / "out.hdf5"
    npy2hdf5(str(tmp_path / "*.npz"), str(out))
    with h5py.File(out) as f:
        np.testing.assert_array_equal(f["vidx"][:], arr)


def test_glove_count_and_keep_vocab(tmp_path):
    ann = tmp_path / "ann"
    ann.mkdir()
    lines = [
        "V1 0.0 5.0##the dog runs\n",
        "V1 1.0 6.0##the dog sleeps\n",
        "V2 2.0 7.0##a person walks\n",
    ]
    (ann / "charades_sta_train.txt").write_text("".join(lines))
    (ann / "charades_sta_test.txt").write_text(lines[0])
    build_glove_count(str(ann), "charades")
    path = ann / "GloVe_tokenized_count.txt"
    assert path.exists()
    rows = [l.split() for l in path.read_text().splitlines()]
    # most frequent first
    counts = [int(r[2]) for r in rows]
    assert counts == sorted(counts, reverse=True)
    words = [r[0] for r in rows]
    assert words[0] in ("the", "dog")  # 'the'/'dog' appear 3x
    id2label = load_glove_keep_vocab(str(ann), vocab_size=3)
    assert id2label["<unknown>"] == 3
    assert len(id2label) == 4

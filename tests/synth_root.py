"""Build a synthetic charades-style dataset root on disk (annotations + HDF5 +
vocab files) so the reference-compatible CLIs run end-to-end without real data."""
from __future__ import annotations

import json
import os

import h5py
import numpy as np

DV = 12
SENTS = [
    "a person opens the door",
    "someone closes a window",
    "the dog runs fast",
    "a man reads the book",
    "person turns on a light",
    "a woman eats some food",
]


def make_charades_root(root: str, n_videos: int = 8, seed: int = 0):
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    vids = [f"V{i:03d}" for i in range(n_videos)]
    durations = {v: float(rng.integers(20, 40)) for v in vids}

    for split, fname in [("train", "charades_sta_train.txt"), ("test", "charades_sta_test.txt")]:
        lines = []
        for i, v in enumerate(vids):
            for j in range((i % 3) + 1):
                d = durations[v]
                # st >= 1.5 s keeps start_idx >= 1 at clip_len=1: the
                # reference's contra-sample negative pool is
                # [0,start) ∪ (end,video_len) (dataset/base.py:199) and
                # np.random.choice CRASHES on an empty pool when a span
                # covers every clip — real charades spans never start at 0s
                st = float(rng.uniform(1.5, d * 0.6))
                ed = float(rng.uniform(st + 1, d))
                lines.append(f"{v} {st:.2f} {ed:.2f}##{SENTS[(i + j) % len(SENTS)]}\n")
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(lines))

    for fname in ["Charades_v1_train.csv", "Charades_v1_test.csv"]:
        rows = ["id,subject,scene,quality,relevance,verified,script,objects,descriptions,length\n"]
        for v in vids:
            rows.append(f"{v},s,x,7,7,Yes,script,objects,desc,{durations[v]}\n")
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(rows))

    from mesm_tpu.data import Vocabulary

    words = sorted({w for s in SENTS for w in s.split()})
    vocab = Vocabulary(words)
    with open(os.path.join(ann, "GloVe_tokenized_count.txt"), "w") as f:
        for w in words:
            f.write(f"{w} {vocab.wtoi[w]} 5\n")

    feat_path = os.path.join(root, "feat.hdf5")
    with h5py.File(feat_path, "w") as f:
        for v in vids:
            L = int(rng.integers(15, 40))
            f.create_dataset(v, data=rng.normal(size=(L, DV)).astype(np.float32))

    # a GloVe-style text vector file for the GloVeSimple text encoder path
    glove_path = os.path.join(root, "glove_tiny.txt")
    with open(glove_path, "w") as f:
        for w in words:
            vec = rng.normal(size=300).astype(np.float32)
            f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")

    config = {
        "exp_id": "synth",
        "dataset_name": "charades",
        "ann_path": ann,
        "feat_files": [feat_path],
        "use_tef": True,
        "clip_len": 1,
        "max_words_l": 8,
        "max_video_l": 20,
        "tokenizer_type": "GloVeSimple",
        "load_vocab_pkl": False,
        "normalize_video": True,
        "normalize_txt": True,
        "contra_samples": 2,
        "batch_size": 4,
        "eval_batch_size": 4,
        "num_workers": 2,
        "vocab_size": 10,
        "max_windows": 5,
        "max_gather_size": -1,
        "text_model_path": glove_path,
        "share_MLP": True,
        "hidden_dim": 32,
        "dropout": 0.1,
        "nheads": 4,
        "dim_feedforward": 64,
        "num_recfw_layers": 1,
        "t2v_layers": 1,
        "enc_layers": 1,
        "dec_layers": 2,
        "input_dropout": 0.5,
        "v_feat_dim": DV,
        "t_feat_dim": 300,
        "num_queries": 5,
        "n_input_proj": 2,
        "rec_fw": True,
        "rec_ss": True,
        "num_recss_layers": 1,
        "aux_loss": True,
        "rank_coef": 12,
        "loss_span_coef": 10,
        "loss_giou_coef": 1,
        "loss_label_coef": 4,
        "loss_saliency_coef": 4,
        "loss_recfw_coef": 0.1,
        "loss_recss_coef": 0.1,
        "seed": 2019,
        "lr": 0.0002,
        "lr_drop": 400,
        "gamma": 0.5,
        "weight_decay": 0.0001,
        "n_epoch": 2,
        "grad_clip": 0.1,
        "max_es_cnt": 200,
        "save_interval": 50,
        "result_root": os.path.join(root, "results"),
        "stop_score": "mAP",
        "eval_epoch_interval": 1,
        "sort_results": True,
        "nms_thd": -1,
        "max_ts_val": 150,
        "max_before_nms": 10,
        "max_after_nms": 10,
    }
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)
    return cfg_path

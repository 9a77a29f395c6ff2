"""End-to-end smoke run on the VGG+GloVe-pkl path: precomputed 300-d word
features as `words_id` (NLTKFeatureTokenizer + load_vocab_pkl), text encoder
is a pass-through (reference runner.py:261-265, model/model.py:145-152)."""
import json
import os
import pickle
from collections import Counter

import h5py
import numpy as np

import pytest

pytestmark = pytest.mark.slow


def make_glove_pkl_root(root: str, seed: int = 0):
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    sents = [
        "a person opens the door",
        "someone closes a window",
        "the dog runs fast",
        "a man reads the book",
    ]
    DV = 10
    vids = [f"V{i:03d}" for i in range(6)]
    durations = {v: float(rng.integers(20, 40)) for v in vids}

    for split, fname in [("train", "charades_sta_train.txt"), ("test", "charades_sta_test.txt")]:
        lines = []
        for i, v in enumerate(vids):
            for j in range((i % 2) + 1):
                d = durations[v]
                st = float(rng.uniform(0, d * 0.6))
                ed = float(rng.uniform(st + 1, d))
                lines.append(f"{v} {st:.2f} {ed:.2f}##{sents[(i + j) % len(sents)]}\n")
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(lines))
    for fname in ["Charades_v1_train.csv", "Charades_v1_test.csv"]:
        rows = ["id,descriptions,length\n"] + [f"{v},desc,{durations[v]}\n" for v in vids]
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(rows))

    # glove.pkl: {w2id, id2vec, counter} (reference build_vocab_from_pkl)
    words = sorted({w for s in sents for w in s.split()})
    w2id = {w: i for i, w in enumerate(words)}
    id2vec = {i: rng.normal(size=300).astype(np.float32) for i in range(len(words))}
    counter = Counter({w: 5 for w in words})
    with open(os.path.join(ann, "glove.pkl"), "wb") as f:
        pickle.dump({"w2id": w2id, "id2vec": id2vec, "counter": counter}, f)

    feat_path = os.path.join(root, "feat.hdf5")
    with h5py.File(feat_path, "w") as f:
        for v in vids:
            L = int(rng.integers(15, 40))
            f.create_dataset(v, data=rng.normal(size=(L, DV)).astype(np.float32))

    config = {
        "exp_id": "vggglove_synth", "dataset_name": "charades",
        "ann_path": ann, "feat_files": [feat_path],
        "use_tef": True, "clip_len": 0.17, "max_words_l": 8, "max_video_l": 20,
        "tokenizer_type": "GloVeNLTK", "load_vocab_pkl": True,
        "normalize_video": True, "normalize_txt": True, "contra_samples": 2,
        "batch_size": 4, "eval_batch_size": 4, "num_workers": 2,
        "vocab_size": 10, "max_windows": 5, "max_gather_size": -1,
        "text_model_path": "unused",
        "share_MLP": True, "hidden_dim": 32, "dropout": 0.1, "nheads": 4,
        "dim_feedforward": 64, "num_recfw_layers": 1, "t2v_layers": 1,
        "enc_layers": 1, "dec_layers": 2, "input_dropout": 0.5,
        "v_feat_dim": DV, "t_feat_dim": 300, "num_queries": 5, "n_input_proj": 2,
        "rec_fw": True, "rec_ss": True, "num_recss_layers": 1, "aux_loss": True,
        "rank_coef": 12, "loss_span_coef": 10, "loss_giou_coef": 1,
        "loss_label_coef": 4, "loss_saliency_coef": 4,
        "loss_recfw_coef": 0.1, "loss_recss_coef": 0.1,
        "seed": 2019, "lr": 2e-4, "lr_drop": 400, "gamma": 0.1,
        "weight_decay": 1e-4, "n_epoch": 1, "grad_clip": 0.1,
        "max_es_cnt": 200, "save_interval": 50,
        "result_root": os.path.join(root, "results"), "stop_score": "mAP",
        "eval_epoch_interval": 1, "sort_results": True, "nms_thd": -1,
        "max_ts_val": 150, "max_before_nms": 10, "max_after_nms": 10,
    }
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)
    return cfg_path


def test_glove_pkl_train(tmp_path):
    cfg_path = make_glove_pkl_root(str(tmp_path))
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path])
    with open(os.path.join(opt.result_dir, "train.log.txt")) as f:
        line = [l for l in f if "loss_overall" in l][-1]
    toks = line.split()
    assert np.isfinite(float(toks[toks.index("loss_overall") + 1]))
    # MLM path ran with the pkl keep-vocab (vocab_size+1 classes)
    assert "loss_rec_fw" in line

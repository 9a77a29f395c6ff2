"""End-to-end smoke run with TACoS-style settings: fractional clip_len (-1),
max_gather_size chunking + GroupAwareBatcher, TwoMLP enhance (share_MLP=False),
and the triplet saliency loss."""
import json
import os

import h5py
import numpy as np

import pytest

pytestmark = pytest.mark.slow


def make_tacos_root(root: str, seed: int = 0):
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    sents = [
        "the person chops an onion",
        "someone washes the plate",
        "a cook stirs the pot",
        "the chef slices bread",
    ]
    DV = 10
    feat_path = os.path.join(root, "feat.hdf5")
    obj = {"train": {}, "test": {}}
    with h5py.File(feat_path, "w") as f:
        for i in range(8):
            vid = f"s13-d{i:02d}"
            L = int(rng.integers(30, 60))
            f.create_dataset(vid, data=rng.normal(size=(L, DV)).astype(np.float32))
            fps = 2.0
            n_frames = L * 10
            stamps, sentences = [], []
            split = "train" if i < 4 else "test"
            # Test videos get exactly max_gather_size(=2) sentences, i.e. ONE
            # chunk-row per video: the reference's val loader is a plain
            # shuffled DataLoader (runner.py:103-107), and a val batch whose
            # rows all come from one video crashes its sample_outclass_neg
            # (utils/data_utils.py:122, empty out-of-group candidate set).
            # One row per video makes every eval batch multi-group by
            # construction. Train keeps 3-6 sentences/video so the gather
            # chunking + SplitGatherBatchSampler path stays exercised.
            n_sent = 2 if split == "test" else int(rng.integers(3, 7))
            for j in range(n_sent):
                # frame margins keep the fractional span (clip_len -1,
                # reference base.py:174-176) off clip 0 and the last clip,
                # so the reference's contra-sample negative pool
                # (base.py:199, crashes when empty) always has a candidate
                st = int(rng.integers(30, n_frames - 50))
                ed = int(st + rng.integers(10, n_frames - st - 5))
                stamps.append([st, ed])
                sentences.append(sents[(i + j) % len(sents)])
            obj[split][vid] = {
                "num_frames": n_frames, "fps": fps,
                "timestamps": stamps, "sentences": sentences,
            }
    for split in ("train", "test"):
        with open(os.path.join(ann, f"{split}.json"), "w") as f:
            json.dump(obj[split], f)

    words = sorted({w for s in sents for w in s.split()})
    from mesm_tpu.data import Vocabulary

    vocab = Vocabulary(words)
    with open(os.path.join(ann, "GloVe_tokenized_count.txt"), "w") as f:
        for w in words:
            f.write(f"{w} {vocab.wtoi[w]} 5\n")
    glove_path = os.path.join(root, "glove_tiny.txt")
    with open(glove_path, "w") as f:
        for w in words:
            vec = rng.normal(size=300).astype(np.float32)
            f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")

    config = {
        "exp_id": "tacos_synth", "dataset_name": "tacos",
        "ann_path": ann, "feat_files": [feat_path],
        "use_tef": True, "clip_len": -1, "max_words_l": 8, "max_video_l": 24,
        "tokenizer_type": "GloVeSimple", "load_vocab_pkl": False,
        "normalize_video": True, "normalize_txt": True, "contra_samples": 2,
        "batch_size": 3, "eval_batch_size": 4, "num_workers": 2,
        "vocab_size": 10, "max_windows": 5, "max_gather_size": 2,
        "text_model_path": glove_path, "share_MLP": False,
        "hidden_dim": 32, "dropout": 0.1, "nheads": 4, "dim_feedforward": 64,
        "num_recfw_layers": 1, "t2v_layers": 1, "enc_layers": 1, "dec_layers": 2,
        "input_dropout": 0.5, "v_feat_dim": DV, "t_feat_dim": 300,
        "num_queries": 5, "n_input_proj": 2,
        "rec_fw": True, "rec_ss": True, "num_recss_layers": 1, "aux_loss": True,
        "rank_coef": 1, "use_triplet": True, "saliency_margin": 0.2,
        "set_cost_class": 6, "loss_label_coef": 6,
        "loss_span_coef": 10, "loss_giou_coef": 1, "loss_saliency_coef": 1,
        "loss_recfw_coef": 0.1, "loss_recss_coef": 0.1,
        "seed": 2019, "lr": 2e-4, "lr_drop": 400, "gamma": 0.1,
        "weight_decay": 1e-4, "n_epoch": 1, "grad_clip": 0.1,
        "max_es_cnt": 200, "save_interval": 50,
        "result_root": os.path.join(root, "results"), "stop_score": "miou",
        "eval_epoch_interval": 1, "sort_results": True, "nms_thd": -1,
        "max_ts_val": 1000, "max_before_nms": 10, "max_after_nms": 10,
    }
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)
    return cfg_path


def test_tacos_train_and_eval(tmp_path):
    cfg_path = make_tacos_root(str(tmp_path))
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path])
    run_dir = opt.result_dir
    with open(os.path.join(run_dir, "train.log.txt")) as f:
        line = [l for l in f if "loss_overall" in l][-1]
    toks = line.split()
    assert np.isfinite(float(toks[toks.index("loss_overall") + 1]))
    # metric files exist and carry the TACoS brief (superlong range possible)
    import glob as _glob

    metrics_files = _glob.glob(os.path.join(run_dir, "*metrics.json"))
    assert metrics_files
    with open(metrics_files[0]) as f:
        metrics = json.load(f)
    assert "MR-full-miou" in metrics["brief"]

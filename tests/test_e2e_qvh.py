"""End-to-end smoke run on a synthetic QVHighlights root: multi-clip targets,
hungarian matching in the train step, saliency labels, triplet loss, and the
per-group concatenated SS-MESM video path."""
import json
import os

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def make_qvh_root(root: str, seed: int = 0):
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
    feat_path = os.path.join(root, "feat.hdf5")
    entries = {"train": [], "val": []}
    qid = 0
    with h5py.File(feat_path, "w") as f:
        for i in range(6):
            for c in range(2):
                vid = f"Y{i}_{c * 150:.1f}_{(c + 1) * 150:.1f}"
                L = int(rng.integers(10, 16))
                f.create_dataset(vid, data=rng.normal(size=(L, DV)).astype(np.float32))
                n_rel = int(rng.integers(2, 5))
                rel = sorted(rng.choice(L, n_rel, replace=False).tolist())
                windows = [[int(r * 2), int(r * 2 + 2)] for r in rel[:2]]
                qid += 1
                rec = dict(
                    qid=qid,
                    query=sents[(i + c) % len(sents)],
                    vid=vid,
                    duration=2 * L,
                    relevant_clip_ids=rel,
                    saliency_scores=[[int(x) for x in rng.integers(0, 5, 3)] for _ in rel],
                    relevant_windows=windows,
                )
                entries["train" if i < 4 else "val"].append(rec)
    for split, fname in [
        ("train", "highlight_train_release.jsonl"),
        ("val", "highlight_val_release.jsonl"),
    ]:
        with open(os.path.join(ann, fname), "w") as f:
            for e in entries[split]:
                f.write(json.dumps(e) + "\n")

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
        "exp_id": "qvh_synth", "dataset_name": "qvhighlights",
        "ann_path": ann, "feat_files": [feat_path],
        "use_tef": True, "clip_len": 2, "max_words_l": 8, "max_video_l": 16,
        "tokenizer_type": "GloVeSimple", "load_vocab_pkl": False,
        "normalize_video": True, "normalize_txt": True, "contra_samples": 2,
        "batch_size": 4, "eval_batch_size": 4, "num_workers": 2,
        "vocab_size": 10, "max_windows": 5, "max_gather_size": -1,
        "text_model_path": glove_path, "share_MLP": True,
        "hidden_dim": 32, "dropout": 0.1, "nheads": 4, "dim_feedforward": 64,
        "num_recfw_layers": 1, "t2v_layers": 1, "enc_layers": 1, "dec_layers": 2,
        "input_dropout": 0.5, "v_feat_dim": DV, "t_feat_dim": 300,
        "num_queries": 5, "n_input_proj": 2,
        "rec_fw": True, "rec_ss": True, "num_recss_layers": 1, "aux_loss": True,
        "rank_coef": 12, "use_triplet": True, "saliency_margin": 0.2,
        "loss_span_coef": 10, "loss_giou_coef": 1, "loss_label_coef": 4,
        "loss_saliency_coef": 1, "loss_recfw_coef": 0.5, "loss_recss_coef": 0.1,
        "seed": 2018, "lr": 2e-4, "lr_drop": 400, "gamma": 0.5,
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


def test_qvh_train_and_eval(tmp_path):
    cfg_path = make_qvh_root(str(tmp_path))
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path])
    run_dir = opt.result_dir
    assert os.path.exists(os.path.join(run_dir, "model_val_best.ckpt")) or os.path.exists(
        os.path.join(run_dir, "model_latest.ckpt")
    )
    with open(os.path.join(run_dir, "train.log.txt")) as f:
        line = [l for l in f if "loss_overall" in l][-1]
    toks = line.split()
    total = float(toks[toks.index("loss_overall") + 1])
    assert np.isfinite(total)
    # hungarian + triplet + multi-window losses all present
    assert "loss_rec_ss" in line and "loss_saliency" in line


def test_qvh_train_and_eval_coalesced(tmp_path):
    """Same e2e run with --eval_coalesce 2: the multi-clip (qvh) eval path —
    list-of-window targets, 3-annotator saliency, and the device-side
    ss_video_feat group expansion added by device_feed — must survive the
    scanned coalesced step (on TPU the auto policy coalesces by default;
    value-equivalence of coalescing itself is proven in test_coalesce.py)."""
    cfg_path = make_qvh_root(str(tmp_path))
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path, "--eval_coalesce", "2"])
    run_dir = opt.result_dir
    subs = [f for f in os.listdir(run_dir) if f.endswith("val_preds.jsonl")]
    assert subs, f"no submission written in {os.listdir(run_dir)}"
    with open(os.path.join(run_dir, subs[0])) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) > 0
    for r in rows[:3]:
        assert np.isfinite(np.asarray(r["pred_relevant_windows"])).all()

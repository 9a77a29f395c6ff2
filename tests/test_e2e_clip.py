"""End-to-end smoke run on the CLIP path (the flagship C+SF-style config):
BPE tokenizer with MLM keep-vocab, CLIP tower built from a torch checkpoint by
shape inference, frozen-text caching, vocab_size+3 MLM classes."""
import gzip
import json
import os

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch


def make_clip_root(root: str, seed: int = 0):
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    sents = [
        "the dog opened the door",
        "the dog ate the food",
        "the door opened fast",
        "the food fell on the floor",
    ]
    DV = 10

    # tiny BPE merge table covering the words above
    bpe_path = os.path.join(root, "bpe.txt.gz")
    merges = ["#version: tiny", "t h", "th e</w>", "o g</w>", "d og</w>",
              "o o", "d oo", "doo r</w>", "f oo", "foo d</w>",
              "o p", "op e", "ope n", "open ed</w>",
              "a t", "at e</w>", "f a", "fa s", "fas t</w>",
              "f e", "fe l", "fel l</w>", "o n</w>", "f l", "fl oo", "floo r</w>"]
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")

    # synthetic CLIP text tower checkpoint (reference layout); arch is
    # inferred from tensor shapes by the builder (runner.py parity)
    from test_clip_text import TorchClipText

    torch.manual_seed(0)
    oracle = TorchClipText()
    sd = oracle.reference_named_state_dict()
    # widen the token embedding to the BPE vocab (49408) and the positional
    # embedding to CLIP's context length (77) — the builder infers both from
    # tensor shapes
    full_vocab = 49408
    width = sd["token_embedding.weight"].shape[1]
    sd["token_embedding.weight"] = torch.randn(full_vocab, width) * 0.02
    sd["positional_embedding"] = torch.randn(77, width) * 0.01
    ckpt_path = os.path.join(root, "clip_text_encoder.pth")
    torch.save({k: v.to(torch.float16) for k, v in sd.items()}, ckpt_path)

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
        rows = ["id,descriptions,length\n"] + [f"{v},d,{durations[v]}\n" for v in vids]
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(rows))

    # MLM keep-vocab over BPE token ids (data tool output format)
    from mesm_tpu.data.tokenizers import ClipBPETokenizer
    from collections import Counter

    tok = ClipBPETokenizer(False, None, bpe_path)
    counts = Counter()
    for s in sents:
        ids, _ = tok.encode(s)
        counts.update(ids)
    with open(os.path.join(ann, "CLIP_tokenized_count.txt"), "w") as f:
        for tid, c in counts.most_common():
            f.write(f"{tid} {c}\n")

    feat_path = os.path.join(root, "feat.hdf5")
    with h5py.File(feat_path, "w") as f:
        for v in vids:
            L = int(rng.integers(15, 40))
            f.create_dataset(v, data=rng.normal(size=(L, DV)).astype(np.float32))

    config = {
        "exp_id": "clip_synth", "dataset_name": "charades",
        "ann_path": ann, "feat_files": [feat_path],
        "use_tef": True, "clip_len": 1, "max_words_l": 8, "max_video_l": 20,
        "tokenizer_type": "CLIP", "load_vocab_pkl": False, "bpe_path": bpe_path,
        "normalize_video": True, "normalize_txt": True, "contra_samples": 2,
        "batch_size": 4, "eval_batch_size": 4, "num_workers": 2,
        "vocab_size": 6, "max_windows": 5, "max_gather_size": -1,
        "text_model_path": ckpt_path, "share_MLP": True,
        "hidden_dim": 32, "dropout": 0.1, "nheads": 4, "dim_feedforward": 64,
        "num_recfw_layers": 1, "t2v_layers": 1, "enc_layers": 1, "dec_layers": 2,
        "input_dropout": 0.5, "v_feat_dim": DV,
        "t_feat_dim": 32,  # CLIP transformer width of the synthetic tower
        "num_queries": 5, "n_input_proj": 2,
        "rec_fw": True, "rec_ss": True, "num_recss_layers": 1, "aux_loss": True,
        "rank_coef": 12, "loss_span_coef": 10, "loss_giou_coef": 1,
        "loss_label_coef": 4, "loss_saliency_coef": 4,
        "loss_recfw_coef": 0.1, "loss_recss_coef": 0.1,
        "seed": 2019, "lr": 2e-4, "lr_drop": 400, "gamma": 0.5,
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


def test_clip_path_train(tmp_path):
    cfg_path = make_clip_root(str(tmp_path))
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path])
    with open(os.path.join(opt.result_dir, "train.log.txt")) as f:
        line = [l for l in f if "loss_overall" in l][-1]
    toks = line.split()
    assert np.isfinite(float(toks[toks.index("loss_overall") + 1]))
    # MLM ran with vocab_size+3 classes over the BPE keep-vocab
    assert "loss_rec_fw" in line and "rec_fw_acc" in line

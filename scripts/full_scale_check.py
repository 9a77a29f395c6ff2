"""Full-size converter + eval de-risk (round-3 directive).

Fabricates a RELEASED-LAYOUT reference checkpoint at the REAL charades
C+SF_C scale — the actual torch reference model imported from
/root/reference and built at hidden 256 / v_feat 2818 (2816+TEF) / CLIP
text (B/32-structured tower state dict, architecture inferred from shapes
like reference runner.py:167-187) — then runs the full public pipeline:

    torch ckpt {model, optimizer, lr_scheduler, epoch, opt-Namespace}
      -> mesm_tpu.evaluate (TestOptions opt.json reload, byte-sniffed torch
         load, convert, CLIP tower merge, eval epoch on TPU, metrics)

and additionally asserts, at full scale:
  * converter round-trip: params -> torch state dict -> params is exact
  * reference torch forward vs converted mesm_tpu forward <= 2e-3 on
    pred_spans/pred_logits/saliency (f32, same batch; the slow-tier test
    suite pins <= 1e-4 at small scale — this checks nothing breaks at the
    real dims)

After this, the only remaining real-data risk is the data itself
(PARITY.md). Run on the TPU host:  python scripts/full_scale_check.py
Writes FULLSCALE_CHECK.json at the repo root.
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ROOT = os.environ.get("MESM_FULLSCALE_ROOT", "/tmp/mesm_fullscale_root")
REF_ROOT = "/root/reference"

DV = 2816  # CLIP+SlowFast concat (config/charades/C+SF_C.json v_feat_dim)
DT = 512


def log(msg):
    print(f"[full-scale] {msg}", file=sys.stderr, flush=True)


def fabricate_clip_b32_text_ckpt(path: str, seed: int = 0):
    """CLIP-B/32 text-tower state dict STRUCTURE (width 512, 12 layers,
    heads 512//64=8, vocab 49408, context 77) with random weights, saved
    fp16 like the released file. The builder infers every dim from shapes."""
    import torch

    g = torch.Generator().manual_seed(seed)
    W, L, V, C = 512, 12, 49408, 77

    def r(*shape, s=0.02):
        return (torch.randn(*shape, generator=g) * s).to(torch.float16)

    sd = {
        "token_embedding.weight": r(V, W),
        "positional_embedding": r(C, W, s=0.01),
        "text_projection": r(W, W),
        "ln_final.weight": torch.ones(W, dtype=torch.float16),
        "ln_final.bias": torch.zeros(W, dtype=torch.float16),
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        sd.update({
            p + "ln_1.weight": torch.ones(W, dtype=torch.float16),
            p + "ln_1.bias": torch.zeros(W, dtype=torch.float16),
            p + "ln_2.weight": torch.ones(W, dtype=torch.float16),
            p + "ln_2.bias": torch.zeros(W, dtype=torch.float16),
            p + "attn.in_proj_weight": r(3 * W, W),
            p + "attn.in_proj_bias": torch.zeros(3 * W, dtype=torch.float16),
            p + "attn.out_proj.weight": r(W, W),
            p + "attn.out_proj.bias": torch.zeros(W, dtype=torch.float16),
            p + "mlp.c_fc.weight": r(4 * W, W),
            p + "mlp.c_fc.bias": torch.zeros(4 * W, dtype=torch.float16),
            p + "mlp.c_proj.weight": r(W, 4 * W),
            p + "mlp.c_proj.bias": torch.zeros(W, dtype=torch.float16),
        })
    torch.save(sd, path)


def build_root(n_videos: int = 40, seed: int = 0) -> dict:
    """Synthetic charades root at real feature scale + tiny BPE."""
    import h5py

    ann = os.path.join(ROOT, "annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    sents = [
        "the dog opened the door",
        "the dog ate the food",
        "the door opened fast",
        "the food fell on the floor",
    ]
    bpe_path = os.path.join(ROOT, "bpe.txt.gz")
    merges = ["#version: tiny", "t h", "th e</w>", "o g</w>", "d og</w>",
              "o o", "d oo", "doo r</w>", "f oo", "foo d</w>",
              "o p", "op e", "ope n", "open ed</w>",
              "a t", "at e</w>", "f a", "fa s", "fas t</w>",
              "f e", "fe l", "fel l</w>", "o n</w>", "f l", "fl oo", "floo r</w>"]
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")

    vids = [f"V{i:03d}" for i in range(n_videos)]
    durations = {v: float(np.clip(rng.normal(28.7, 8.0), 8, 72)) for v in vids}
    for split, fname in [("train", "charades_sta_train.txt"), ("test", "charades_sta_test.txt")]:
        lines = []
        for i, v in enumerate(vids):
            for j in range((i % 3) + 1):
                d = durations[v]
                st = float(rng.uniform(0, d * 0.6))
                ed = float(rng.uniform(st + 1, d))
                lines.append(f"{v} {st:.2f} {ed:.2f}##{sents[(i + j) % len(sents)]}\n")
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(lines))
    for fname in ["Charades_v1_train.csv", "Charades_v1_test.csv"]:
        rows = ["id,length\n"] + [f"{v},{durations[v]}\n" for v in vids]
        with open(os.path.join(ann, fname), "w") as f:
            f.write("".join(rows))

    feat_path = os.path.join(ROOT, "feat.hdf5")
    if not os.path.exists(feat_path):
        log(f"writing {n_videos}-video {DV}-d feature HDF5")
        with h5py.File(feat_path, "w") as f:
            for v in vids:
                L = max(int(round(durations[v])), 4)
                f.create_dataset(v, data=rng.normal(size=(L, DV)).astype(np.float32))

    # MLM keep-vocab over BPE ids (data tool output format)
    from collections import Counter

    from mesm_tpu.data.tokenizers import ClipBPETokenizer

    tok = ClipBPETokenizer(False, None, bpe_path)
    counts = Counter()
    for s in sents:
        ids, _ = tok.encode(s)
        counts.update(ids)
    with open(os.path.join(ann, "CLIP_tokenized_count.txt"), "w") as f:
        for tid, c in counts.most_common():
            f.write(f"{tid} {c}\n")

    clip_path = os.path.join(ROOT, "clip_text_encoder.pth")
    if not os.path.exists(clip_path):
        fabricate_clip_b32_text_ckpt(clip_path)
    return dict(ann=ann, feat=feat_path, bpe=bpe_path, clip=clip_path)


def full_scale_opt_dict(paths: dict, result_dir: str) -> dict:
    """The C+SF_C hyperparameters of record (config/charades/C+SF_C.json)
    pointed at the synthetic root."""
    return {
        "exp_id": "fullscale", "dataset_name": "charades", "seed": 0,
        "ann_path": paths["ann"], "feat_files": [paths["feat"]],
        "use_tef": True, "clip_len": 1, "max_words_l": 32, "max_video_l": 194,
        "tokenizer_type": "CLIP", "load_vocab_pkl": False,
        "bpe_path": paths["bpe"], "text_model_path": paths["clip"],
        "normalize_video": True, "normalize_txt": True, "contra_samples": 2,
        "batch_size": 32, "eval_batch_size": 128, "num_workers": 2,
        "vocab_size": 1111, "max_windows": 5, "max_gather_size": -1,
        "share_MLP": True, "hidden_dim": 256, "dropout": 0.1, "nheads": 8,
        "dim_feedforward": 1024, "num_recfw_layers": 2, "t2v_layers": 2,
        "enc_layers": 2, "dec_layers": 2, "input_dropout": 0.5,
        "v_feat_dim": DV, "t_feat_dim": DT, "num_queries": 10,
        "n_input_proj": 2, "rec_fw": True, "rec_ss": True,
        "num_recss_layers": 4, "aux_loss": True, "rank_coef": 12,
        "loss_span_coef": 10, "loss_giou_coef": 1, "loss_label_coef": 4,
        "loss_saliency_coef": 4, "loss_recfw_coef": 0.1, "loss_recss_coef": 0.1,
        "eos_coef": 0.1, "use_triplet": False, "iou_gamma": 0.9,
        "recss_tau": 0.5, "results_root": os.path.join(ROOT, "results"),
        "max_ts_val": 200, "compute_dtype": "float32", "result_dir": result_dir,
        "use_txt_pos": False, "span_loss_type": "l1", "pre_norm": False,
        "position_embedding": "sine", "saliency_margin": 0.2,
        "set_cost_span": 10, "set_cost_giou": 1, "set_cost_class": 4,
        "stop_score": "mAP", "nms_thd": -1, "sort_results": True,
        "eval_epoch_interval": 1, "pallas_attention": "auto",
    }


def build_full_scale_reference_ckpt(opt_ns, out_path: str):
    """The actual torch reference model at C+SF_C dims, saved in the exact
    released on-disk layout (train.py:185-223: text encoder stripped,
    optimizer/lr_scheduler/epoch/opt-Namespace included)."""
    import torch

    from test_reference_parity import build_ref_model
    import types as _t

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import model.model as ref_model
    import model.matcher as ref_matcher
    import model.criterion as ref_criterion
    import model.transformer as ref_transformer
    import model.position_encoding as ref_position

    ref = _t.SimpleNamespace(
        model=ref_model, matcher=ref_matcher, criterion=ref_criterion,
        transformer=ref_transformer, position=ref_position,
    )
    torch.manual_seed(0)
    model = build_ref_model(ref, opt_ns)
    optimizer = torch.optim.AdamW(model.parameters(), lr=2e-4, weight_decay=1e-4)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 400, gamma=0.5)
    state = {
        k: v for k, v in model.state_dict().items() if not k.startswith("text_encoder")
    }
    payload = {
        "model": state,
        "optimizer": optimizer.state_dict(),
        "lr_scheduler": scheduler.state_dict(),
        "epoch": 123,
        "opt": argparse.Namespace(**vars(opt_ns)),
    }
    torch.save(payload, out_path)
    return model, state


def main() -> int:
    import jax
    import jax.numpy as jnp
    import torch

    t_start = time.time()
    paths = build_root()
    trained_dir = os.path.join(ROOT, "results", "charades-fullscale-trained")
    os.makedirs(trained_dir, exist_ok=True)

    opt_dict = full_scale_opt_dict(paths, trained_dir)
    # TEF bump exactly like BaseOptions (config.py): the model sees 2818
    opt_model = dict(opt_dict)
    opt_model["v_feat_dim"] = DV + 2
    opt_ns = argparse.Namespace(**opt_model)

    log("building full-scale reference torch model + released-layout ckpt")
    ckpt_path = os.path.join(trained_dir, "model_val_best.ckpt")
    ref_torch_model, ref_state = build_full_scale_reference_ckpt(opt_ns, ckpt_path)
    with open(os.path.join(trained_dir, "opt.json"), "w") as f:
        json.dump(opt_dict, f, indent=1)

    # ---- converter round-trip at full scale --------------------------------
    from mesm_tpu.config import TestOptions
    from mesm_tpu.convert import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )
    import mesm_tpu.runner as R

    topt = TestOptions().parse([
        "--config_file", os.path.join(trained_dir, "opt.json"),
        "--trained_result_dir", trained_dir,
        "--inference_id", "fullscale-check",
    ])
    mcfg = R.build_model_config(topt)
    params = torch_state_dict_to_params(
        {k: v.numpy() for k, v in ref_state.items()}, mcfg
    )
    back = params_to_torch_state_dict(params, mcfg)
    assert set(back) == set(ref_state), (
        sorted(set(back) ^ set(ref_state))[:10]
    )
    for k in ref_state:
        np.testing.assert_array_equal(back[k], ref_state[k].numpy(), err_msg=k)
    log(f"converter round-trip exact over {len(ref_state)} tensors")

    # ---- forward parity at full scale (f32, eval semantics, B=8) -----------
    # data/invocation mirror tests/test_reference_parity.py (fabricate /
    # run_reference / run_ours) at the REAL dims; eval mode needs no rng
    # pinning (no MLM masking, no negative pass compared)
    from test_reference_parity import fabricate
    from mesm_tpu.models.text_encoder import post_process_precomputed_text

    rng = np.random.default_rng(3)
    data = fabricate(rng, opt_ns, B=8, n_groups=4)
    model = R.build_model(topt, jnp.float32)
    wf, wm, sf = post_process_precomputed_text(jnp.asarray(data["raw_words"]))
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(data["video_feat"]), jnp.asarray(data["video_mask"]),
        wf, wm, sf,
        jnp.asarray(data["neg_rows"]),
        is_training=False, deterministic=True, compute_neg=False,
        clip_mask=jnp.asarray(data["clip_mask"]),
        ss_sent_idx=jnp.asarray(data["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(data["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(data["ss_own_pos"]),
    )
    t = lambda x: torch.from_numpy(np.asarray(x))
    ref_torch_model.eval()
    with torch.no_grad():
        tout = ref_torch_model(
            t(data["video_feat"]), t(data["video_mask"]),
            t(data["raw_words"]),  # words_id IS the precomputed features
            t(data["words_mask"]), t(data["words_weight"]),
            t(data["num_clips"]),
            dataset_name="charades", is_training=False,
            unknown_mask=t(data["unknown_mask"]), clip_mask=t(data["clip_mask"]),
        )
    diffs = {}
    for key in ("pred_spans", "pred_logits", "saliency_scores"):
        a = np.asarray(out[key], np.float32)
        b = tout[key].numpy()
        diffs[key] = float(np.abs(a - b).max())
    log(f"forward parity max-abs diffs: {diffs}")
    assert all(d <= 2e-3 for d in diffs.values()), diffs

    # ---- the full public eval pipeline on TPU ------------------------------
    log("running mesm_tpu.evaluate on the fabricated released checkpoint")
    from mesm_tpu.evaluate import inference

    metrics, _ = inference([
        "--config_file", os.path.join(trained_dir, "opt.json"),
        "--trained_result_dir", trained_dir,
        "--inference_id", "fullscale-eval",
    ])
    brief = metrics["brief"]
    assert all(np.isfinite(v) for v in brief.values()), brief
    log(f"eval brief: {json.dumps(brief, sort_keys=True)}")

    outp = {
        "ok": True,
        "backend": jax.default_backend(),
        "tensors_round_tripped": len(ref_state),
        "forward_max_abs_diff": diffs,
        "eval_brief": brief,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(REPO, "FULLSCALE_CHECK.json"), "w") as f:
        json.dump(outp, f, indent=1)
    log(f"wrote FULLSCALE_CHECK.json (ok=True, {outp['wall_s']}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

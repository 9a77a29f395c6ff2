"""End-to-end reference-vs-rebuild parity on shared synthetic datasets.

The strongest parity statement available without the released datasets
(they are not downloadable in this container): for EACH config family —
charades (CLIP-style single-window), qvhighlights (multi-clip LSAP,
3-annotator saliency, multi-window metrics), tacos (fractional clip_len -1,
max_gather_size chunking, TwoMLP share_MLP=False) — run the ACTUAL
reference pipeline end-to-end — its own `train.py` (a few CPU epochs) and
its own `eval.py` (reference /root/reference/train.py:99-229,
eval.py:488-537) — on a generated on-disk dataset root, then evaluate the
SAME torch checkpoint with mesm_tpu's `evaluate.py` (byte-sniffed torch
load + convert.py) on the SAME data, and diff every shared brief-metric
key.

Both pipelines are deterministic given the checkpoint, the annotations,
and the features, so the target is 0.0 on every key (acceptance gate:
within 0.3, the north-star tolerance). Exercises the full L7->L1 stack on
BOTH sides: config parse, vocab/tokenizer, annotation parsing, HDF5
reading, collate, model forward, span decode, post-processing, metrics.
Family-specific reference surfaces covered: multi-clip matching
(/root/reference/model/matcher.py:108-111), collate_qvh + saliency labels
(/root/reference/dataset/qvhighlights.py:67-199,214-284), multi-window
R1/mAP (/root/reference/eval.py:419-430), fractional indexing
(/root/reference/dataset/base.py:174-189), TACoS IoU thresholds + the
superlong length range (/root/reference/eval.py:233-262).

Writes REF_E2E_PARITY.json at the repo root. Run:  (CPU, ~10-15 min)

    python scripts/ref_e2e_parity.py [--workdir DIR] [--epochs N]
                                     [--families charades qvhighlights tacos]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def log(msg):
    print(f"[ref-e2e] {msg}", file=sys.stderr, flush=True)


def run_reference(mode: str, args: list[str]) -> None:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "_ref_cli.py"), mode] + args
    log(" ".join(cmd))
    env = dict(os.environ)
    # the reference is pure torch/numpy; keep JAX's TPU plugin out of its
    # subprocess entirely (the axon sitecustomize probes the backend)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-8000:] + "\n")
        raise RuntimeError(f"reference {mode} failed rc={r.returncode}")


def find_one(pattern: str) -> str:
    hits = sorted(glob.glob(pattern))
    assert len(hits) >= 1, f"no match for {pattern}"
    return hits[-1]


# family -> (root maker module:function, best-ckpt split)
FAMILIES = {
    "charades": ("synth_root", "make_charades_root", "test"),
    "qvhighlights": ("test_e2e_qvh", "make_qvh_root", "val"),
    "tacos": ("test_e2e_tacos", "make_tacos_root", "test"),
}


def run_family(family: str, workdir: str, epochs: int, n_videos: int) -> dict:
    t0 = time.time()
    root = os.path.join(workdir, family)
    os.makedirs(root, exist_ok=True)
    mod_name, fn_name, best_split = FAMILIES[family]
    import importlib

    maker = getattr(importlib.import_module(mod_name), fn_name)
    cfg_path = (
        maker(root, n_videos=n_videos) if family == "charades" else maker(root)
    )
    cfg = json.load(open(cfg_path))
    cfg["n_epoch"] = epochs
    cfg["device"] = "cpu"
    cfg["num_workers"] = 0  # 1-core host; in-process loading on both sides
    cfg["result_root"] = os.path.join(root, "ref_results")
    json.dump(cfg, open(cfg_path, "w"), indent=2)

    # ---- 1. reference train ------------------------------------------------
    log(f"[{family}] reference train.py: {epochs} epochs")
    run_reference("train", ["--config_file", cfg_path])
    ref_run_dir = find_one(os.path.join(cfg["result_root"], f"{family}-*"))
    ckpt = os.path.join(ref_run_dir, f"model_{best_split}_best.ckpt")
    if not os.path.exists(ckpt):
        # The reference writes the best ckpt only when the stop score
        # STRICTLY improves over its 0.0 init (train.py:138,181) — an
        # undertrained synthetic run can sit at mAP 0.0 throughout and
        # never produce one. Both eval sides resolve the best name, so
        # alias latest -> best: the parity statement only needs the SAME
        # checkpoint on both sides, not a meaningful "best".
        latest = os.path.join(ref_run_dir, "model_latest.ckpt")
        assert os.path.exists(latest), os.listdir(ref_run_dir)
        log(f"[{family}] no {best_split}_best ckpt (stop score never "
            "improved on the synth set); aliasing model_latest.ckpt")
        import shutil

        shutil.copyfile(latest, ckpt)
    log(f"[{family}] reference run dir: {ref_run_dir}")

    # ---- 2. reference eval on its own best checkpoint ----------------------
    eval_cfg = {
        "is_inference": True,
        "inference_id": "refe2e",
        "inference_result_dir": os.path.join(root, "ref_inference"),
        "trained_result_dir": ref_run_dir,
        "num_workers": 0,
        "nms_thd": -1,
        "device": "cpu",
        "resume_all": False,
        "sort_results": True,
        "max_ts_val": cfg["max_ts_val"],
        "ann_path": cfg["ann_path"],
        "feat_files": cfg["feat_files"],
        "text_model_path": cfg["text_model_path"],
    }
    eval_cfg_path = os.path.join(root, "ref_eval_cfg.json")
    json.dump(eval_cfg, open(eval_cfg_path, "w"), indent=2)
    run_reference("eval", ["--config_file", eval_cfg_path])
    ref_metrics_path = find_one(
        os.path.join(root, "ref_inference", "*", "*metrics.json")
    )
    ref_brief = json.load(open(ref_metrics_path))["brief"]
    log(f"[{family}] reference brief: {json.dumps(ref_brief, sort_keys=True)}")

    # ---- 3. mesm_tpu eval on the SAME torch checkpoint ---------------------
    # TestOptions reloads the REFERENCE run's opt.json (same whitelist
    # semantics as the reference utils/config.py:181-189); evaluate.py
    # byte-sniffs the torch pickle and converts (mesm_tpu/convert.py).
    #
    # Numerics protocol: TPU fp32 matmuls default to bf16-input MXU passes
    # (~5e-3 output noise), which flips near-tie window rankings on an
    # undertrained synthetic checkpoint even though real trained checkpoints
    # have clear margins. Parity here is a PIPELINE statement, so pin true
    # fp32 matmuls and the kernels off (bf16/kernel metric-parity is gated
    # separately: scripts/tpu_check.py, tests test_bf16_eval_metric_parity).
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    from mesm_tpu.evaluate import inference

    ours_cfg = dict(eval_cfg)
    ours_cfg["inference_result_dir"] = os.path.join(root, "tpu_inference")
    ours_cfg["compute_dtype"] = "float32"
    ours_cfg["pallas_attention"] = "off"
    ours_cfg_path = os.path.join(root, "tpu_eval_cfg.json")
    json.dump(ours_cfg, open(ours_cfg_path, "w"), indent=2)
    metrics, _ = inference(["--config_file", ours_cfg_path])
    our_brief = metrics["brief"]
    log(f"[{family}] mesm_tpu brief: {json.dumps(our_brief, sort_keys=True)}")

    # ---- 4. diff ------------------------------------------------------------
    # submission-level: per-query windows + saliency, the rawest artifact
    import numpy as np

    def load_jsonl(p):
        return {
            json.loads(l)["qid"]: json.loads(l) for l in open(p) if l.strip()
        }

    ref_sub = load_jsonl(
        find_one(os.path.join(root, "ref_inference", "*", "*submission.jsonl"))
    )
    our_sub = load_jsonl(
        find_one(os.path.join(root, "tpu_inference", "*", "*submission.jsonl"))
    )
    assert set(ref_sub) == set(our_sub)
    win_d = sal_d = 0.0
    for q in ref_sub:
        a = np.asarray(ref_sub[q]["pred_relevant_windows"], np.float64)
        b = np.asarray(our_sub[q]["pred_relevant_windows"], np.float64)
        if a.shape == b.shape:
            win_d = max(win_d, float(np.abs(a - b).max()))
        else:
            win_d = float("inf")
        sa = np.asarray(ref_sub[q]["pred_saliency_scores"], np.float64)
        sb = np.asarray(our_sub[q]["pred_saliency_scores"], np.float64)
        if sa.shape == sb.shape:
            sal_d = max(sal_d, float(np.abs(sa - sb).max()))
        else:  # count divergence is a parity break, not a crash
            sal_d = float("inf")
    log(f"[{family}] submission diffs: windows {win_d:.6f}, saliency {sal_d:.6f}")

    shared = sorted(set(ref_brief) & set(our_brief))
    assert shared, (sorted(ref_brief), sorted(our_brief))
    diffs, worst = {}, 0.0
    for k in shared:
        a, b = ref_brief[k], our_brief[k]
        if a is None or b is None:
            diffs[k] = {"ref": a, "tpu": b, "diff": None}
            continue
        d = abs(float(a) - float(b))
        diffs[k] = {"ref": a, "tpu": b, "diff": round(d, 4)}
        worst = max(worst, d)
    only_ref = sorted(set(ref_brief) - set(our_brief))
    only_tpu = sorted(set(our_brief) - set(ref_brief))

    return {
        "ok": worst <= 0.3 and not np.isinf(win_d) and not np.isinf(sal_d),
        "worst_abs_diff": round(worst, 4),
        "submission_max_abs_diff": {
            "pred_relevant_windows": (
                "shape-mismatch" if np.isinf(win_d) else round(win_d, 6)
            ),
            "pred_saliency_scores": (
                "shape-mismatch" if np.isinf(sal_d) else round(sal_d, 6)
            ),
        },
        "shared_keys": len(shared),
        "per_key": diffs,
        "only_in_reference": only_ref,
        "only_in_tpu": only_tpu,
        "checkpoint": ckpt,
        "train": f"reference train.py, {epochs} epochs, cpu, seed {cfg['seed']}",
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mesm_ref_e2e")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-videos", type=int, default=8)
    ap.add_argument(
        "--families", nargs="+", default=list(FAMILIES),
        choices=list(FAMILIES),
    )
    args = ap.parse_args()

    t0 = time.time()
    families = {}
    for family in args.families:
        families[family] = run_family(
            family, args.workdir, args.epochs, args.n_videos
        )

    out = {
        "ok": all(f["ok"] for f in families.values()),
        "tolerance": 0.3,
        "worst_abs_diff": max(f["worst_abs_diff"] for f in families.values()),
        "families": families,
        "protocol": {
            "dataset": "synthetic on-disk roots shared by both pipelines "
                       "(tests/synth_root.py, tests/test_e2e_qvh.py, "
                       "tests/test_e2e_tacos.py makers)",
            "reference_eval": "reference eval.py (TestOptions, mp metrics)",
            "tpu_eval": "mesm_tpu.evaluate on the converted torch ckpt",
            "pos_tagger": "both sides pinned to the closed-class heuristic "
                          "(scripts/_ref_cli.py; NLTK tagger data absent)",
        },
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, "REF_E2E_PARITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    log(
        f"wrote REF_E2E_PARITY.json: ok={out['ok']} "
        f"worst={out['worst_abs_diff']:.4f} across "
        f"{list(families)} ({out['wall_s']}s)"
    )
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

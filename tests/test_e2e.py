"""End-to-end: train CLI -> checkpoints + metrics; evaluate CLI from the run
dir (the reference workflow: python train.py --config_file ...; python
eval.py --config_file ... --trained_result_dir ...)."""
import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from synth_root import make_charades_root


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    cfg_path = make_charades_root(root)
    from mesm_tpu.train import train

    state, opt = train(["--config_file", cfg_path])
    return root, cfg_path, opt


def test_train_produces_artifacts(trained_run):
    root, cfg_path, opt = trained_run
    run_dir = opt.result_dir
    assert os.path.exists(os.path.join(run_dir, "opt.json"))
    assert os.path.exists(os.path.join(run_dir, "train.log.txt"))
    assert os.path.exists(os.path.join(run_dir, "model_test_best.ckpt"))
    assert os.path.exists(os.path.join(run_dir, "model_latest.ckpt"))
    # submissions + metrics written and renamed to best
    assert glob.glob(os.path.join(run_dir, "*best*preds*.jsonl"))
    metrics_files = glob.glob(os.path.join(run_dir, "*metrics.json"))
    assert metrics_files
    with open(metrics_files[0]) as f:
        metrics = json.load(f)
    brief = metrics["brief"]
    assert "MR-full-R1@0.5" in brief and brief["MR-full-mAP"] is not None


def test_training_loss_decreased(trained_run):
    root, cfg_path, opt = trained_run
    with open(os.path.join(opt.result_dir, "train.log.txt")) as f:
        lines = [l for l in f if "loss_overall" in l]
    assert len(lines) >= 2

    def overall(line):
        toks = line.split()
        return float(toks[toks.index("loss_overall") + 1])

    assert overall(lines[-1]) < overall(lines[0])


def test_eval_cli_from_run_dir(trained_run):
    root, cfg_path, opt = trained_run
    from mesm_tpu.evaluate import inference

    # dedicated eval config, mirroring the reference's *_eval.json layout
    with open(cfg_path) as f:
        base = json.load(f)
    eval_cfg = {
        "is_inference": True,
        "inference_id": "e2e",
        "inference_result_dir": os.path.join(root, "inference"),
        "trained_result_dir": opt.result_dir,
        "num_workers": 2,
        "nms_thd": 0.7,
        "resume_all": False,
        "sort_results": True,
        "max_ts_val": 150,
        "ann_path": base["ann_path"],
        "feat_files": base["feat_files"],
        "bpe_path": base.get("bpe_path", ""),
        "text_model_path": base["text_model_path"],
    }
    eval_cfg_path = os.path.join(root, "config_eval.json")
    with open(eval_cfg_path, "w") as f:
        json.dump(eval_cfg, f)

    metrics, metrics_nms = inference(["--config_file", eval_cfg_path])
    brief = metrics["brief"]
    assert brief["MR-full-R1@0.5"] is not None
    assert metrics_nms is not None and metrics_nms["brief"]["MR-full-mAP"] is not None
    # all test queries evaluated
    sub_files = glob.glob(os.path.join(root, "inference", "*", "*submission*.jsonl"))
    assert sub_files
    with open(sorted(sub_files)[0]) as f:
        n = sum(1 for _ in f if _.strip())
    from mesm_tpu.config import TestOptions  # count gt entries
    import mesm_tpu.runner as R

    assert n > 0


def test_bf16_eval_metric_parity(trained_run):
    """The bf16 eval compute mode (the TPU serving headline in bench.py) must
    not move the metrics: same trained checkpoint evaluated fp32 vs bf16,
    brief metrics within 1 sample (this synthetic test split quantizes R1 at
    2 pts/sample) and typically identical."""
    root, cfg_path, opt = trained_run
    import json as _json

    from mesm_tpu.evaluate import inference

    with open(cfg_path) as f:
        base = _json.load(f)
    briefs = {}
    for dt in ("float32", "bfloat16"):
        eval_cfg = {
            "is_inference": True,
            "inference_id": f"bf16par_{dt}",
            "inference_result_dir": os.path.join(root, f"inference_{dt}"),
            "trained_result_dir": opt.result_dir,
            "num_workers": 2,
            "resume_all": False,
            "max_ts_val": 150,
            "compute_dtype": dt,
            "ann_path": base["ann_path"],
            "feat_files": base["feat_files"],
            "bpe_path": base.get("bpe_path", ""),
            "text_model_path": base["text_model_path"],
        }
        p = os.path.join(root, f"config_eval_{dt}.json")
        with open(p, "w") as f:
            _json.dump(eval_cfg, f)
        metrics, _ = inference(["--config_file", p])
        briefs[dt] = metrics["brief"]
    for key in ("MR-full-R1@0.5", "MR-full-R1@0.7", "MR-full-miou"):
        a, b = briefs["float32"][key], briefs["bfloat16"][key]
        assert abs(a - b) <= 2.1, f"{key}: fp32 {a} vs bf16 {b}"


def test_torch_export_import_roundtrip(trained_run):
    """Export the trained params to reference naming and bring them back."""
    root, cfg_path, opt = trained_run
    import jax
    from mesm_tpu.convert import params_to_torch_state_dict, torch_state_dict_to_params
    from mesm_tpu.runner import build_model_config
    from mesm_tpu.utils import load_checkpoint

    payload = load_checkpoint(os.path.join(opt.result_dir, "model_test_best.ckpt"))
    cfg = build_model_config_from_opt(opt)
    sd = params_to_torch_state_dict(payload["model"], cfg)
    back = torch_state_dict_to_params(sd, cfg)
    flat_a = jax.tree.leaves(payload["model"])
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def build_model_config_from_opt(opt):
    from mesm_tpu.runner import build_model_config

    return build_model_config(opt)

"""Config system: JSON-over-CLI layering, TEF bump, TestOptions whitelist
reload (reference utils/config.py semantics)."""
import json
import os

import pytest

from mesm_tpu.config import BaseOptions, TestOptions

pytestmark = pytest.mark.smoke


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def _base_cfg(root):
    return {
        "exp_id": "t", "dataset_name": "charades", "ann_path": "a",
        "feat_files": ["f.h5"], "use_tef": True, "v_feat_dim": 100,
        "t_feat_dim": 300, "result_root": os.path.join(root, "res"),
        "batch_size": 4, "nms_thd": -1, "lr": 0.002,
    }


def test_json_overrides_cli_and_tef_bump(tmp_path):
    cfg_path = str(tmp_path / "c.json")
    _write(cfg_path, _base_cfg(str(tmp_path)))
    # CLI lr is clobbered by the JSON config (reference utils/config.py:162-163)
    opt = BaseOptions().parse(["--config_file", cfg_path, "--lr", "0.5"])
    assert opt.lr == 0.002
    assert opt.v_feat_dim == 102  # +2 TEF bump after opt.json is written
    saved = json.load(open(os.path.join(opt.result_dir, "opt.json")))
    assert saved["v_feat_dim"] == 100  # stored pre-bump, like the reference
    assert opt.eval_batch_size == opt.batch_size  # -1 default resolves
    # source snapshot side effect
    assert os.path.exists(os.path.join(opt.result_dir, "mesm.py"))


def test_exp_id_required(tmp_path):
    cfg = _base_cfg(str(tmp_path))
    del cfg["exp_id"]
    cfg_path = str(tmp_path / "c.json")
    _write(cfg_path, cfg)
    with pytest.raises(ValueError, match="exp_id"):
        BaseOptions().parse(["--config_file", cfg_path])


def test_testoptions_reload_with_whitelist(tmp_path):
    cfg_path = str(tmp_path / "c.json")
    _write(cfg_path, _base_cfg(str(tmp_path)))
    train_opt = BaseOptions().parse(["--config_file", cfg_path])

    eval_cfg = {
        "is_inference": True,
        "inference_id": "e",
        "inference_result_dir": os.path.join(str(tmp_path), "inf"),
        "trained_result_dir": train_opt.result_dir,
        "nms_thd": 0.6,            # whitelisted: survives the opt.json reload
        "ann_path": "other_ann",   # whitelisted
        "feat_files": ["g.h5"],    # whitelisted
        "num_workers": 3,
        "sort_results": True,
        "max_ts_val": 99,
        "resume_all": False,
        "bpe_path": "b",
        "text_model_path": "tm",
    }
    eval_path = str(tmp_path / "e.json")
    _write(eval_path, eval_cfg)
    opt = TestOptions().parse(["--config_file", eval_path])
    assert opt.nms_thd == 0.6 and opt.ann_path == "other_ann"
    assert opt.lr == 0.002  # non-whitelisted values come from the training run
    assert opt.dataset_name == "charades"
    # resume resolves to the split best checkpoint (charades -> test)
    assert opt.resume.endswith("model_test_best.ckpt")
    assert opt.v_feat_dim == 102  # re-bumped from the stored pre-bump value


def test_rng_impl_flag(tmp_path):
    """--rng_impl defaults to the TPU-native 'rbg' PRNG (measured 1.74x
    train-step win, BASELINE.md round 5) and both impls produce a key the
    train step's fold_in/split machinery accepts."""
    import jax

    cfg_path = str(tmp_path / "c.json")
    _write(cfg_path, _base_cfg(str(tmp_path)))
    opt = BaseOptions().parse(["--config_file", cfg_path])
    assert opt.rng_impl == "rbg"
    opt2 = BaseOptions().parse(["--config_file", cfg_path, "--rng_impl", "threefry"])
    assert opt2.rng_impl == "threefry"
    for impl_key in (jax.random.key(0, impl="rbg"), jax.random.PRNGKey(0)):
        k = jax.random.fold_in(impl_key, 3)
        jax.random.split(k, 3)  # must not raise

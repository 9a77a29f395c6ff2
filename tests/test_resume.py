"""Checkpoint/resume subsystem: --resume / --resume_all semantics
(reference train.py:117-125) and save/load identity."""
import glob
import json
import os

import numpy as np

from synth_root import make_charades_root

import pytest

pytestmark = pytest.mark.slow


def test_resume_all_continues_training(tmp_path):
    root = str(tmp_path)
    cfg_path = make_charades_root(root)
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["n_epoch"] = 1
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from mesm_tpu.train import train

    state1, opt1 = train(["--config_file", cfg_path])
    ckpt = os.path.join(opt1.result_dir, "model_latest.ckpt")
    assert os.path.exists(ckpt)

    # resume with optimizer state; start_epoch advances past epoch 0
    cfg["n_epoch"] = 2
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    state2, opt2 = train(
        ["--config_file", cfg_path, "--resume", ckpt, "--resume_all"]
    )
    log = open(os.path.join(opt2.result_dir, "train.log.txt")).read()
    # resumed run trains exactly one epoch: epoch index 002 (0-based 1 + 1)
    assert "[Epoch] 002" in log and "[Epoch] 001" not in log

    # weights moved on from the checkpoint
    from mesm_tpu.utils import load_checkpoint
    import jax

    p_old = load_checkpoint(ckpt)["model"]
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(p_old), jax.tree.leaves(state2.params))
    ]
    assert max(diffs) > 0


def test_checkpoint_identity(tmp_path):
    """save -> load -> identical tree."""
    from mesm_tpu.utils import load_checkpoint, save_checkpoint
    import jax

    tree = {
        "a": np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32),
        "b": {"c": np.arange(5, dtype=np.int32)},
    }
    path = os.path.join(str(tmp_path), "x.ckpt")
    save_checkpoint(path, tree, opt_state=None, epoch=7, opt={"lr": 1e-4})
    payload = load_checkpoint(path)
    assert payload["epoch"] == 7
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(payload["model"])):
        np.testing.assert_array_equal(a, b)

"""Reproducibility: two runs with the same seed produce identical training
losses (the reference's determinism stance, train.py:32-39, carried over to
explicit jax.random streams and visit-counted dataset RNG)."""
import json
import os

from synth_root import make_charades_root

import pytest

pytestmark = pytest.mark.slow


def _first_epoch_losses(root, tag):
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["n_epoch"] = 1
    cfg["num_workers"] = 3  # threaded loader must not break determinism
    cfg["result_root"] = os.path.join(root, f"results_{tag}")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    from mesm_tpu.train import train

    _, opt = train(["--config_file", cfg_path])
    with open(os.path.join(opt.result_dir, "train.log.txt")) as f:
        return [l.split("[Loss]")[1] for l in f if "[Loss]" in l]


def test_same_seed_same_losses(tmp_path):
    root = str(tmp_path)
    make_charades_root(root)
    a = _first_epoch_losses(root, "a")
    b = _first_epoch_losses(root, "b")
    assert a == b

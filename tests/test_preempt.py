"""Graceful preemption: SIGTERM during training finishes the in-flight step,
saves model_latest.ckpt with the last COMPLETED epoch, and returns cleanly;
--resume_all from that checkpoint continues training.

TPU VMs are preempted with SIGTERM + a grace window; the reference's recovery
story is manual --resume only (SURVEY §5 'Failure detection: None'). This
pins the TPU-native addition end-to-end on the real train() driver.
"""
from __future__ import annotations

import glob
import os
import signal
import threading
import time

import pytest

from synth_root import make_charades_root

pytestmark = pytest.mark.slow


def _sigterm_after_first_epoch(root: str, failsafe_s: float = 900.0):
    """Watcher: SIGTERM this process once the first epoch line lands in any
    train.log.txt under root (i.e. mid-run, after compiles), or after a
    failsafe timeout so a broken glob can't hang the test for 50 epochs."""

    def watch():
        deadline = time.time() + failsafe_s
        while time.time() < deadline:
            for path in glob.glob(
                os.path.join(root, "**", "train.log.txt"), recursive=True
            ):
                try:
                    with open(path) as f:
                        if "[Epoch]" in f.read():
                            os.kill(os.getpid(), signal.SIGTERM)
                            return
                except OSError:
                    pass
            time.sleep(1.0)
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    return t


def test_sigterm_saves_latest_and_resumes(tmp_path):
    root = str(tmp_path)
    cfg_path = make_charades_root(root)
    from mesm_tpu.train import train
    from mesm_tpu.utils import load_checkpoint

    before_handler = signal.getsignal(signal.SIGTERM)
    _sigterm_after_first_epoch(root)
    # n_epoch high enough that the run can only end via the preemption path
    state, opt = train(
        ["--config_file", cfg_path, "--n_epoch", "50", "--exp_id", "preempt"]
    )

    # the handler must be UNINSTALLED on return: a leaked handler makes the
    # process TERM-immune (it would absorb e.g. a `timeout` harness's kill)
    assert signal.getsignal(signal.SIGTERM) == before_handler, (
        "train() must restore the previous SIGTERM disposition"
    )

    latest = opt.ckpt_filepath.replace(".ckpt", "_latest.ckpt")
    assert os.path.exists(latest), "preemption must save model_latest.ckpt"
    with open(opt.train_log_filepath) as f:
        assert "Preempted during epoch" in f.read()

    payload = load_checkpoint(latest)
    assert payload["model"] is not None
    # last COMPLETED epoch: strictly before the interrupted one, >= -1
    assert -1 <= payload["epoch"] < 50

    # the handler must not leak into subsequent runs: resume finishes
    # normally with a small epoch budget
    resume_epochs = max(payload["epoch"] + 2, 1)
    state2, opt2 = train(
        [
            "--config_file", cfg_path,
            "--n_epoch", str(resume_epochs),
            "--exp_id", "resumed",
            "--resume", latest,
            "--resume_all",
        ]
    )
    assert os.path.exists(opt2.ckpt_filepath.replace(".ckpt", "_latest.ckpt"))

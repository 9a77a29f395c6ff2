"""Root-level train.py / eval.py wrappers: the reference's documented
commands (`python train.py --config_file ...`, reference README.md:131-154)
must parse args through the package CLIs."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", ["train.py", "eval.py"])
def test_wrapper_help_exits_zero(script):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--config_file" in r.stdout


def test_train_wrapper_requires_exp_id():
    # reference semantics: training without --exp_id is an error
    # (utils/config.py parse); the wrapper must surface it, not swallow it
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py")],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode != 0
    assert "exp_id" in (r.stderr + r.stdout)

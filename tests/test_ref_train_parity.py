"""Training-trajectory parity proxy, regenerated on CPU (VERDICT r4 item 3).

Both pipelines — the reference's own train.py and mesm_tpu.train — start
from the SAME initialization (reference seeded init, converted via
mesm_tpu.convert) on a shared synthetic charades root, and their per-epoch
weighted loss terms plus final eval brief must agree within the tolerances
of record (scripts/ref_train_parity.py docstring)."""
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_ref_train_parity(tmp_path):
    from ref_train_parity import run

    out = run(
        str(tmp_path), epochs=2, n_videos=6,
        out_path=str(tmp_path / "REF_TRAIN_PARITY.json"),
    )
    assert out["ok"], {
        "per_epoch": out["per_epoch"],
        "final_brief_worst": out["final_brief_worst_abs_diff"],
        "decreasing": out["trajectory_decreasing"],
    }

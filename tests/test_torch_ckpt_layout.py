"""Converter accepts the reference's EXACT on-disk checkpoint layout.

The reference saves torch pickles shaped
  {"model": state_dict (text encoder stripped), "optimizer": ...,
   "lr_scheduler": ..., "epoch": int, "opt": argparse.Namespace}
(reference train.py:185-223), where the text tower is removed by prefix
(utils/model_utils.py:20-27) and the `opt` entry is a pickled Namespace.
This constructs that layout with torch in-test and checks both
`load_torch_mesm_checkpoint` and `evaluate._is_torch_ckpt` handle it.
"""
from __future__ import annotations

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import build_ref_model, make_opt, ref  # noqa: F401

pytestmark = pytest.mark.slow


def _reference_layout_ckpt(tmp_path, ref, with_text_encoder=True):
    opt = make_opt()
    torch.manual_seed(0)
    model = build_ref_model(ref, opt)
    if with_text_encoder:
        # give the model a frozen text tower so the strip actually removes keys
        model.text_encoder = torch.nn.Embedding(8, opt.t_feat_dim)
    optimizer = torch.optim.AdamW(model.parameters(), lr=2e-4, weight_decay=1e-4)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 400, gamma=0.5)
    # reference utils/model_utils.py:20-27: drop keys prefixed by the module name
    state = {
        k: v for k, v in model.state_dict().items() if not k.startswith("text_encoder")
    }
    namespace = argparse.Namespace(**vars(opt))  # opt saved as a Namespace pickle
    payload = {
        "model": state,
        "optimizer": optimizer.state_dict(),
        "lr_scheduler": scheduler.state_dict(),
        "epoch": 5,
        "opt": namespace,
    }
    path = str(tmp_path / "model_val_best.ckpt")
    torch.save(payload, path)
    return path, opt, model, state


def test_load_reference_layout(tmp_path, ref):
    from mesm_tpu.convert import load_torch_mesm_checkpoint, torch_state_dict_to_params
    from mesm_tpu.runner import build_model_config

    path, opt, model, state = _reference_layout_ckpt(tmp_path, ref)
    cfg = build_model_config(opt)
    params, epoch = load_torch_mesm_checkpoint(path, cfg)
    assert epoch == 5
    expected = torch_state_dict_to_params(state, cfg)

    import jax

    leaves_a = jax.tree.leaves(params)
    leaves_b = jax.tree.leaves(expected)
    assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 50
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_checkpoint_without_scheduler(tmp_path, ref):
    """Periodic _e{NNNN} checkpoints omit lr_scheduler (reference train.py:216-223)."""
    from mesm_tpu.convert import load_torch_mesm_checkpoint
    from mesm_tpu.runner import build_model_config

    path, opt, model, state = _reference_layout_ckpt(tmp_path, ref)
    payload = torch.load(path, map_location="cpu", weights_only=False)
    del payload["lr_scheduler"]
    path2 = str(tmp_path / "model_e0042.ckpt")
    torch.save(payload, path2)
    params, epoch = load_torch_mesm_checkpoint(path2, build_model_config(opt))
    assert epoch == 5


def test_format_sniffing(tmp_path, ref):
    from mesm_tpu.evaluate import _is_torch_ckpt
    from mesm_tpu.utils.checkpoint import save_checkpoint

    torch_path, opt, model, state = _reference_layout_ckpt(tmp_path, ref)
    assert _is_torch_ckpt(torch_path)

    native = str(tmp_path / "native.ckpt")
    save_checkpoint(native, {"w": np.zeros(3, np.float32)}, epoch=1, opt=vars(opt))
    assert not _is_torch_ckpt(native)

    # legacy (non-zip) torch serialization
    legacy = str(tmp_path / "legacy.ckpt")
    torch.save({"model": state}, legacy, _use_new_zipfile_serialization=False)
    assert _is_torch_ckpt(legacy)

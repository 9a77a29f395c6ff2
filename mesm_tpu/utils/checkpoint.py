"""Checkpoint save/load.

Native format: a pickle of numpy-converted pytrees with keys
{model, optimizer, epoch, opt, lr} — mirroring the reference's torch.save
dict {model, optimizer, lr_scheduler, epoch, opt} (reference
train.py:185-223). The frozen text encoder never enters checkpoints (it
lives in a separate pytree), reproducing state_dict_without_module
(reference utils/model_utils.py:20-27) by construction.

Torch-format interchange (loading the reference's released .ckpt files and
exporting back) lives in mesm_tpu/convert.py.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), jax.device_get(tree))


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0, opt: Dict | None = None, lr: float | None = None):
    payload = {
        "format": "mesm_tpu.v1",
        "model": _to_numpy(params),
        "optimizer": _to_numpy(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "opt": opt,
        "lr": lr,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != "mesm_tpu.v1":
        raise ValueError(f"{path} is not a mesm_tpu checkpoint; use mesm_tpu.convert for torch checkpoints")
    return payload


def count_parameters(params, verbose: bool = True):
    n = sum(int(np.size(x)) for x in jax.tree.leaves(params))
    if verbose:
        print(f"Parameter Count: trainable {n:,d}")
    return n

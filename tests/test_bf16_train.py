"""Mixed-precision training (--compute_dtype bfloat16).

The TPU-native train mode the reference has no analog of: parameters and
optimizer state stay fp32 (flax param_dtype default), activations compute in
bf16. Validates at tiny shapes that (a) params/opt-state are fp32, (b) the
loss trajectory is finite and decreasing, and (c) step-0 loss agrees with the
fp32 model from the same init within bf16 tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth import make_batch
from mesm_tpu.losses import CriterionConfig
from mesm_tpu.models import MESM
from mesm_tpu.models.mesm import MESMConfig
from mesm_tpu.parallel import TrainState, build_optimizer, make_train_step

pytestmark = pytest.mark.slow  # two train-step compiles, ~6 min on this host

B, Lv, Dv, Lw, Dt, G = 8, 16, 24, 10, 20, 2
VOCAB = 64


def _setup(dtype):
    cfg = MESMConfig(
        hidden_dim=32, v_feat_dim=Dv, t_feat_dim=Dt, nheads=4,
        dim_feedforward=64, num_queries=5, max_words_l=Lw, max_video_l=Lv,
        num_classes=VOCAB + 1, dtype=dtype,
    )
    model = MESM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G, n_groups=4)
    batch["words_label"] = (batch["words_label"] % (VOCAB + 1)).astype(np.int32)
    batch["row_mask"] = np.ones((B,), bool)
    for k in ("video_feat_g", "video_mask_g", "video_slot"):
        batch.pop(k, None)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask_words": jax.random.PRNGKey(2)},
        jb["video_feat"], jb["video_mask"], jb["words_feat"], jb["words_mask"],
        jb["sentence_feat"], (jnp.arange(B, dtype=jnp.int32) + 1) % B,
        is_training=True, deterministic=True,
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    return model, variables["params"], jb


def _encode_text(frozen, b):
    return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]


def _run_steps(dtype, n_steps=6):
    model, params, jb = _setup(dtype)
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    tx = build_optimizer(lr=2e-3, weight_decay=1e-4, grad_clip=0.1)
    step = make_train_step(model, ccfg, _encode_text, tx)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(n_steps):
        state, metrics = step(state, {}, jb, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss_overall"]))
    return state, losses


def test_bf16_train_step_converges_and_keeps_fp32_params():
    state_bf, losses_bf = _run_steps(jnp.bfloat16)
    # params and optimizer state never leave fp32 (mixed precision, not pure bf16)
    leaf_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(state_bf.params)}
    assert leaf_dtypes == {jnp.dtype(jnp.float32)}, leaf_dtypes
    assert all(np.isfinite(l) for l in losses_bf), losses_bf
    assert losses_bf[-1] < losses_bf[0], losses_bf

    _, losses_f32 = _run_steps(jnp.float32)
    # step-0 forward agreement from identical fp32 init: bf16 activation
    # rounding only
    assert abs(losses_bf[0] - losses_f32[0]) / abs(losses_f32[0]) < 0.05, (
        losses_bf[0], losses_f32[0],
    )

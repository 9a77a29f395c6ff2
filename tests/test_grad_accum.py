"""Gradient accumulation (--grad_accum k): the microbatched lax.scan train
step must equal averaging k independent single-microbatch gradients from the
same parameters, followed by ONE optimizer update.

Oracle: parallel.make_micro_grads (the exact per-microbatch grad function the
scan path uses) evaluated eagerly per microbatch with the same rng derivation
(split3(fold_in(fold_in(rng, step), i))), grads averaged in fp32, one
tx.update. The accumulated step's new params / loss_overall / grad_norm must
match to fp32 tolerance. The reference has no grad-accumulation analog; this
pins OUR semantics of record (see make_train_step docstring).
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
from mesm_tpu.parallel import (
    TrainState,
    build_optimizer,
    make_micro_grads,
    make_train_step,
)

# slow (one train-step + one grad compile) but also in the close-out smoke
# gate: grad-accum is a dispatch arity the gate must cover
pytestmark = [pytest.mark.slow, pytest.mark.smoke]

B, Lv, Dv, Lw, Dt, G = 8, 16, 24, 10, 20, 2
VOCAB = 64
K = 2


def _setup():
    cfg = MESMConfig(
        hidden_dim=32, v_feat_dim=Dv, t_feat_dim=Dt, nheads=4,
        dim_feedforward=64, num_queries=5, max_words_l=Lw, max_video_l=Lv,
        num_classes=VOCAB + 1, dtype=jnp.float32,
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


def test_grad_accum_equals_mean_of_microbatch_grads():
    model, params, jb = _setup()
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    tx = build_optimizer(lr=2e-3, weight_decay=1e-4, grad_clip=0.1)
    opt_state = tx.init(params)
    # the train step donates its state argument (buffers are consumed) —
    # hand it deep copies and keep the originals for the eager oracle below
    copy = lambda t: jax.tree.map(lambda x: jnp.array(np.asarray(x)), t)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=copy(params),
        opt_state=copy(opt_state),
    )
    rng = jax.random.PRNGKey(42)

    step = make_train_step(model, ccfg, _encode_text, tx, grad_accum=K)
    state1, metrics = step(state0, {}, jb, rng)

    # oracle: eager per-microbatch grads with the same rng derivation
    micro_grads = jax.jit(make_micro_grads(model, ccfg, _encode_text))
    step_rng = jax.random.fold_in(rng, 0)
    acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    totals = []
    for i in range(K):
        mb = jax.tree.map(
            lambda x: x.reshape((K, x.shape[0] // K) + x.shape[1:])[i], jb
        )
        rng3 = jax.random.split(jax.random.fold_in(step_rng, i), 3)
        (total, _losses), g = micro_grads(params, {}, mb, rng3)
        acc = jax.tree.map(lambda a, gi: a + gi.astype(jnp.float32), acc, g)
        totals.append(float(total))
    grads = jax.tree.map(lambda a, p: (a / K).astype(p.dtype), acc, params)

    import optax

    updates, _ = tx.update(grads, opt_state, params)
    want_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        float(metrics["loss_overall"]), np.mean(totals), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(optax.global_norm(grads)), rtol=1e-5
    )
    flat_got = jax.tree_util.tree_leaves(state1.params)
    flat_want = jax.tree_util.tree_leaves(want_params)
    for a, b in zip(flat_got, flat_want):
        # fp32 reduction-order noise between the scanned and eager grad
        # accumulation paths (AdamW's rsqrt amplifies ~1e-7 grad deltas)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
    assert int(state1.step) == 1


def test_grad_accum_requires_divisible_batch():
    model, params, jb = _setup()
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    tx = build_optimizer(lr=2e-3)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = make_train_step(model, ccfg, _encode_text, tx, grad_accum=3)
    with pytest.raises(ValueError, match="divisible"):
        step(state0, {}, jb, jax.random.PRNGKey(0))

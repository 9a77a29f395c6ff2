"""Tensor parallelism over the `model` mesh axis (parallel/tp.py).

Validates on the 8-device virtual CPU mesh that the FFN-split TP layout is
(a) actually sharding parameters and (b) value-equivalent: the SAME jitted
train step produces the same loss with TP-sharded parameters (data=2 x
model=4) as with fully replicated ones (pure DP) — GSPMD inserts the
collectives, no model-code change.
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
    batch_sharding,
    build_optimizer,
    make_mesh,
    make_train_step,
    replicated_sharding,
)
from mesm_tpu.parallel.tp import count_tp_sharded, tp_shard_params

pytestmark = pytest.mark.slow

B, Lv, Dv, Lw, Dt, G = 8, 16, 24, 10, 20, 2
VOCAB = 64


def _setup():
    cfg = MESMConfig(
        hidden_dim=32, v_feat_dim=Dv, t_feat_dim=Dt, nheads=4,
        dim_feedforward=64, num_queries=5, max_words_l=Lw, max_video_l=Lv,
        num_classes=VOCAB + 1,
    )
    model = MESM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G, n_groups=4)
    batch["words_label"] = (batch["words_label"] % (VOCAB + 1)).astype(np.int32)
    batch["row_mask"] = np.ones((B,), bool)
    # group-stacked dedup keys have a non-row leading dim and the train path
    # never reads them — drop so every array row-shards over `data`
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


def encode_text(frozen, b):
    return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]


def test_tp_train_step_matches_replicated():
    model, params, jb = _setup()
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    train_step = make_train_step(model, ccfg, encode_text, tx)

    losses = {}
    for mode in ("dp", "tp"):
        mesh = make_mesh(8, model_parallel=4 if mode == "tp" else 1)
        with mesh:
            if mode == "tp":
                p = tp_shard_params(params, mesh)
                n_sharded = count_tp_sharded(p)
                assert n_sharded >= 10, f"TP layout sharded only {n_sharded} leaves"
                # spot-check an actual FFN kernel is split over `model`
                ffn_kernel = jax.tree_util.tree_leaves(
                    [v for k, v in jax.tree_util.tree_flatten_with_path(p)[0]
                     if any(getattr(x, "key", "") == "linear1" for x in k)
                     and getattr(k[-1], "key", "") == "kernel"][:1]
                )[0]
                shard_shape = ffn_kernel.addressable_shards[0].data.shape
                assert shard_shape[1] * 4 == ffn_kernel.shape[1], (
                    f"FFN hidden not split: {shard_shape} vs {ffn_kernel.shape}"
                )
            else:
                p = jax.device_put(params, replicated_sharding(mesh))
            state = TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), replicated_sharding(mesh)),
                params=p,
                opt_state=jax.device_put(tx.init(p), replicated_sharding(mesh))
                if mode == "dp" else tx.init(p),
            )
            sharded = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in jb.items()}
            # train_step donates the state; deep-copy so donation can't
            # delete buffers aliased by device_put (incl. jnp's global
            # small-constant cache) that the second mode still needs
            state = jax.tree.map(jnp.copy, state)
            state, metrics = train_step(state, {}, sharded, jax.random.PRNGKey(5))
            losses[mode] = float(metrics["loss_overall"])

    assert np.isfinite(losses["tp"])
    np.testing.assert_allclose(losses["tp"], losses["dp"], rtol=2e-5)

"""Sequence-axis sharding: shard the video-length axis over the `model` mesh
axis (long-video stretch goal, SURVEY.md section 7). TACoS-length inputs gain
intra-sample parallelism where pure DP is limited by its tiny batch (3).

Validated on the 8-device virtual CPU mesh as a (2 data x 4 seq) layout: the
sharded train step must produce the same loss/grad-norm as the same batch on
a (8 data x 1) layout (XLA inserts the collectives; math is unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth import make_batch

pytestmark = pytest.mark.slow


def _setup(mesh):
    from mesm_tpu.losses import CriterionConfig
    from mesm_tpu.models import MESM
    from mesm_tpu.models.mesm import MESMConfig
    from mesm_tpu.parallel import (
        TrainState, build_optimizer, make_train_step, replicated_sharding,
    )

    B, Lv, Dv, Lw, Dt = 8, 32, 24, 10, 20  # Lv divisible by the 4-way seq axis
    cfg = MESMConfig(
        hidden_dim=32, v_feat_dim=Dv, t_feat_dim=Dt, nheads=4,
        dim_feedforward=64, num_queries=5, max_words_l=Lw, max_video_l=Lv,
        num_classes=50,
    )
    model = MESM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=2, n_groups=4)
    batch = {k: v for k, v in batch.items()
             if k not in ("video_feat_g", "video_mask_g", "video_slot")}
    batch["row_mask"] = np.ones((B,), bool)

    def encode_text(frozen, b):
        return b["words_feat"], b["words_mask"].astype(bool), b["sentence_feat"]

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
    ccfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1)
    tx = build_optimizer(lr=2e-4, weight_decay=1e-4, grad_clip=0.1)
    repl = replicated_sharding(mesh)
    params = jax.device_put(variables["params"], repl)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), repl),
        params=params,
        opt_state=jax.device_put(tx.init(params), repl),
    )
    step = make_train_step(model, ccfg, encode_text, tx)
    return state, step, jb


def _run(model_parallel: int):
    from mesm_tpu.parallel import make_mesh, shard_batch, shard_batch_seq

    mesh = make_mesh(8, model_parallel=model_parallel)
    with mesh:
        state, step, jb = _setup(mesh)
        sharded = (
            shard_batch_seq(jb, mesh) if model_parallel > 1 else shard_batch(jb, mesh)
        )
        state, metrics = step(state, {}, sharded, jax.random.PRNGKey(5))
        return float(metrics["loss_overall"]), float(metrics["grad_norm"])


def test_seq_sharded_step_matches_data_parallel():
    loss_dp, gn_dp = _run(model_parallel=1)
    loss_seq, gn_seq = _run(model_parallel=4)
    assert np.isfinite(loss_seq)
    np.testing.assert_allclose(loss_seq, loss_dp, rtol=2e-5)
    np.testing.assert_allclose(gn_seq, gn_dp, rtol=2e-4)

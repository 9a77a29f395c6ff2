"""Multi-chip sharding: full train step over an 8-device virtual mesh, and
row-padding equivalence (padded rows must not change any loss)."""
import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from mesm_tpu.losses import CriterionConfig, compute_losses

import pytest

from synth import make_batch


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


def test_entry_compiles():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


@pytest.mark.slow
def test_row_padding_does_not_change_losses():
    """Criterion with row_mask over a padded batch == criterion on the real rows."""
    rng = np.random.default_rng(0)
    B, Lv, nq = 5, 12, 4
    batch = make_batch(rng, B=B, Lv=Lv, Dv=8, Lw=6, Dt=8, G=3)
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    outputs = {
        "pred_logits": jax.random.normal(k[0], (B, nq, 2)),
        "pred_spans": jax.nn.sigmoid(jax.random.normal(k[1], (B, nq, 2))),
        "saliency_scores": jax.random.normal(k[2], (B, Lv)),
        "neg_saliency_scores": jax.random.normal(k[3], (B, Lv)),
        "projed_video_feat": jax.random.normal(k[4], (B, Lv, 8)),
        "expanded_words_feat": jax.random.normal(k[5], (B, 7, 8)),
        "expanded_words_mask": jnp.ones((B, 7), bool),
        "recfw_words_logit": jax.random.normal(k[6], (B, 6, 50)),
        "words_mask": jnp.asarray(batch["words_mask"]),
    }
    cfg = CriterionConfig(recfw_coef=0.1, recss_coef=0.1, use_triplet=True, aux_loss=False)
    jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
    base_losses, base_total = compute_losses(outputs, jb, cfg, is_training=True)

    # pad with 3 duplicate rows of row 0, masked out
    P = 3
    def pad(x):
        x = np.asarray(x)
        return jnp.asarray(np.concatenate([x, np.repeat(x[:1], P, axis=0)], axis=0))

    padded_out = {kk: pad(v) for kk, v in outputs.items()}
    padded_batch = {kk: pad(v) for kk, v in jb.items()}
    padded_batch["row_mask"] = jnp.asarray(np.array([True] * B + [False] * P))
    pad_losses, pad_total = compute_losses(padded_out, padded_batch, cfg, is_training=True)

    for kk in base_losses:
        np.testing.assert_allclose(
            float(base_losses[kk]), float(pad_losses[kk]), rtol=2e-4, atol=1e-5,
            err_msg=kk,
        )
    np.testing.assert_allclose(float(base_total), float(pad_total), rtol=2e-4)

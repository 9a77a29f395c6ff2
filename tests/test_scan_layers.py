"""scan_layers: nn.scan-folded layer stacks equal the unrolled model.

The scanned layout stacks each homogeneous stack's per-layer params along a
leading axis (smaller traced graph -> faster compiles); convert.py
stack_scanned/unstack_scanned translate between the layouts, so a checkpoint
trained either way round-trips through the reference torch naming.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth import make_batch, sample_neg_rows
from test_model import B, Dt, Dv, G, Lv, Lw, init_and_apply, small_cfg


@pytest.fixture(scope="module")
def both_runs():
    batch = make_batch(np.random.default_rng(3), B=B, Lv=Lv, Dv=Dv, Lw=Lw, Dt=Dt, G=G)
    cfg = small_cfg(t2v_layers=2, num_recfw_layers=2, enc_layers=2, num_recss_layers=2)
    model_u, vars_u, out_u = init_and_apply(cfg, batch)

    from mesm_tpu.convert import params_to_torch_state_dict, torch_state_dict_to_params

    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    sd = params_to_torch_state_dict(vars_u["params"], cfg)
    params_s = torch_state_dict_to_params(sd, cfg_s)

    from mesm_tpu.models.mesm import MESM

    model_s = MESM(cfg_s)
    neg_rows = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    kwargs = dict(
        is_training=False,
        deterministic=True,
        clip_mask=jnp.asarray(batch["clip_mask"]),
        words_weight=jnp.asarray(batch["words_weight"]),
        unknown_mask=jnp.asarray(batch["unknown_mask"]),
        ss_sent_idx=jnp.asarray(batch["ss_sent_idx"]),
        ss_sent_mask=jnp.asarray(batch["ss_sent_mask"]),
        ss_own_pos=jnp.asarray(batch["ss_own_pos"]),
    )
    args = (
        jnp.asarray(batch["video_feat"]),
        jnp.asarray(batch["video_mask"]),
        jnp.asarray(batch["words_feat"]),
        jnp.asarray(batch["words_mask"]),
        jnp.asarray(batch["sentence_feat"]),
        neg_rows,
    )
    out_u2 = model_u.apply(vars_u, *args, **kwargs)
    out_s = model_s.apply({"params": params_s}, *args, **kwargs)
    return cfg, cfg_s, vars_u["params"], params_s, out_u2, out_s


def test_scanned_forward_matches_unrolled(both_runs):
    cfg, cfg_s, params_u, params_s, out_u, out_s = both_runs
    for k in out_u:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_u[k]), atol=2e-5, err_msg=k
        )


def test_scanned_roundtrip_through_torch_naming(both_runs):
    """scanned params -> torch state dict -> scanned params is identity, and
    the torch dict equals the unrolled export (same reference naming)."""
    from mesm_tpu.convert import params_to_torch_state_dict, torch_state_dict_to_params

    cfg, cfg_s, params_u, params_s, _, _ = both_runs
    sd_s = params_to_torch_state_dict(params_s, cfg_s)
    sd_u = params_to_torch_state_dict(params_u, cfg)
    assert set(sd_s) == set(sd_u)
    for k in sd_u:
        np.testing.assert_array_equal(sd_s[k], sd_u[k], err_msg=k)
    back = torch_state_dict_to_params(sd_s, cfg_s)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

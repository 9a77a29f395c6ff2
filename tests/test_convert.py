"""Checkpoint conversion: the torch<->flax mapping must cover the full param
tree and round-trip losslessly."""
import jax
import jax.numpy as jnp
import numpy as np

from mesm_tpu.convert import (
    build_mapping,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from mesm_tpu.models.mesm import MESM, MESMConfig

from synth import make_batch, sample_neg_rows


def _init_params(cfg):
    batch = make_batch(np.random.default_rng(0), B=4, Lv=12, Dv=cfg.v_feat_dim,
                       Lw=cfg.max_words_l, Dt=cfg.t_feat_dim, G=2)
    model = MESM(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    neg = jnp.asarray(sample_neg_rows(np.random.default_rng(1), batch["group_id"]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask_words": jax.random.PRNGKey(2)},
        jb["video_feat"], jb["video_mask"], jb["words_feat"], jb["words_mask"],
        jb["sentence_feat"], neg,
        is_training=True, deterministic=True,
        clip_mask=jb["clip_mask"], words_weight=jb["words_weight"],
        unknown_mask=jb["unknown_mask"], ss_sent_idx=jb["ss_sent_idx"],
        ss_sent_mask=jb["ss_sent_mask"], ss_own_pos=jb["ss_own_pos"],
    )
    return variables["params"]


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _check_roundtrip(cfg):
    params = _init_params(cfg)
    sd = params_to_torch_state_dict(params, cfg)
    # full coverage: every flax leaf appears in the mapping
    flat = _flatten(jax.device_get(params))
    mapped_paths = {fpath for _, fpath, _ in build_mapping(cfg)}
    missing = [p for p in flat if p not in mapped_paths]
    assert not missing, f"unmapped flax params: {missing[:8]}"

    back = torch_state_dict_to_params(sd, cfg, strict=True)
    flat_back = _flatten(back)
    assert set(flat_back) == set(flat)
    for p in flat:
        np.testing.assert_array_equal(flat[p], flat_back[p], err_msg=str(p))


def test_roundtrip_share_mlp():
    _check_roundtrip(MESMConfig(
        hidden_dim=32, v_feat_dim=16, t_feat_dim=12, nheads=4, dim_feedforward=48,
        num_queries=5, max_words_l=8, max_video_l=12, num_classes=20,
        share_mlp=True,
    ))


def test_roundtrip_two_mlp_and_txt_pos():
    _check_roundtrip(MESMConfig(
        hidden_dim=32, v_feat_dim=16, t_feat_dim=12, nheads=4, dim_feedforward=48,
        num_queries=5, max_words_l=8, max_video_l=12, num_classes=20,
        share_mlp=False, use_txt_pos=True,
    ))


def test_roundtrip_no_rec():
    _check_roundtrip(MESMConfig(
        hidden_dim=32, v_feat_dim=16, t_feat_dim=12, nheads=4, dim_feedforward=48,
        num_queries=5, max_words_l=8, max_video_l=12, num_classes=20,
        rec_fw=False, rec_ss=False,
    ))

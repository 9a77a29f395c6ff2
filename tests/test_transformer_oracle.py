"""Numeric parity of the transformer pieces vs independent torch oracles.

The oracles re-state the reference semantics with stock torch modules
(nn.MultiheadAttention etc.), weights are transferred FROM the flax params,
and outputs compared in eval mode. Notably the T2V oracle includes the
reference's outer-product pair attn_mask (transformer.py:528-533) — our flax
layer intentionally applies key-padding only (documented no-op claim in
models/t2v.py); if that claim were wrong, this test would fail.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mesm_tpu.models.detr import (
    TransformerDecoder,
    TransformerEncoderLayer,
    gen_sine_embed,
    inverse_sigmoid,
)
from mesm_tpu.models.t2v import T2VLayer

D, H, FF = 32, 4, 64
torch.set_grad_enabled(False)


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def linear_from(params, name):
    """flax Dense params {kernel,bias} -> torch Linear."""
    k = np.asarray(params[name]["kernel"])
    lin = nn.Linear(k.shape[0], k.shape[1])
    lin.weight.data = t(k.T)
    lin.bias.data = t(params[name]["bias"])
    return lin


def norm_from(params, name):
    p = params[name]
    ln = nn.LayerNorm(len(np.asarray(p["scale"])))
    ln.weight.data = t(p["scale"])
    ln.bias.data = t(p["bias"])
    return ln


def mha_from(params, name, embed_dim):
    p = params[name]
    mha = nn.MultiheadAttention(embed_dim, H, batch_first=True)
    mha.in_proj_weight.data = t(np.asarray(p["in_proj_kernel"]).T)
    mha.in_proj_bias.data = t(p["in_proj_bias"])
    mha.out_proj.weight.data = t(np.asarray(p["out_proj"]["kernel"]).T)
    mha.out_proj.bias.data = t(p["out_proj"]["bias"])
    return mha


def prelu_from(params, ffn_name):
    w = float(np.asarray(params[ffn_name]["PReLU_0"]["alpha"])[0])
    act = nn.PReLU()
    act.weight.data = torch.tensor([w])
    return act


def ffn_apply(params, ffn_name, x):
    lin1 = linear_from(params[ffn_name], "linear1")
    lin2 = linear_from(params[ffn_name], "linear2")
    act = prelu_from(params, ffn_name)
    return lin2(act(lin1(x)))


# ---------------------------------------------------------------------------
# T2V layer (with the reference's pair attn_mask included in the oracle)
# ---------------------------------------------------------------------------


def test_t2v_layer_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B, Lt, Lv = 3, 9, 14
    txt = rng.normal(size=(B, Lt, D)).astype(np.float32)
    vid = rng.normal(size=(B, Lv, D)).astype(np.float32)
    t_len = rng.integers(3, Lt + 1, B)
    v_len = rng.integers(5, Lv + 1, B)
    t_mask = np.arange(Lt)[None] < t_len[:, None]
    v_mask = np.arange(Lv)[None] < v_len[:, None]
    pos_t = rng.normal(size=(B, Lt, D)).astype(np.float32)
    pos_v = rng.normal(size=(B, Lv, D)).astype(np.float32)

    layer = T2VLayer(D, H, FF, dropout=0.0, activation="prelu")
    variables = layer.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(txt), jnp.asarray(vid), jnp.asarray(t_mask),
        jnp.asarray(pos_t), jnp.asarray(pos_v), deterministic=True,
    )
    ours = np.asarray(
        layer.apply(
            variables, jnp.asarray(txt), jnp.asarray(vid), jnp.asarray(t_mask),
            jnp.asarray(pos_t), jnp.asarray(pos_v), deterministic=True,
        )
    )

    p = variables["params"]
    mha = mha_from(p, "cross_attn", D)
    norm1, norm2 = norm_from(p, "norm1"), norm_from(p, "norm2")

    q = t(vid) + t(pos_v)
    k = t(txt) + t(pos_t)
    v = t(txt)
    key_pad = torch.from_numpy(~t_mask)  # torch: True = ignore
    # reference pair mask: qpad x kpad^T, repeated per head (True = blocked)
    qpad = torch.from_numpy(~v_mask).float().unsqueeze(2)
    kpad = torch.from_numpy(~t_mask).float().unsqueeze(1)
    pair = torch.matmul(qpad, kpad).bool().repeat_interleave(H, dim=0)
    attn, _ = mha(q, k, v, key_padding_mask=key_pad, attn_mask=pair)
    x = t(vid) + attn
    y = norm1(x)
    y = ffn_apply(p, "ffn", y)
    theirs = norm2(x + y).numpy()

    # only valid query rows are meaningful (fully-masked padding rows may
    # differ: torch emits NaN for them, we emit finite garbage)
    for b in range(B):
        np.testing.assert_allclose(
            ours[b, : v_len[b]], theirs[b, : v_len[b]], atol=2e-5
        )


# ---------------------------------------------------------------------------
# DETR encoder layer
# ---------------------------------------------------------------------------


def test_encoder_layer_matches_torch_oracle():
    rng = np.random.default_rng(1)
    B, L = 3, 12
    src = rng.normal(size=(B, L, D)).astype(np.float32)
    lens = rng.integers(6, L + 1, B)
    mask = np.arange(L)[None] < lens[:, None]
    pos = rng.normal(size=(B, L, D)).astype(np.float32)

    layer = TransformerEncoderLayer(D, H, FF, dropout=0.0, activation="prelu")
    variables = layer.init(
        {"params": jax.random.PRNGKey(2)},
        jnp.asarray(src), jnp.asarray(mask), jnp.asarray(pos), deterministic=True,
    )
    ours = np.asarray(
        layer.apply(variables, jnp.asarray(src), jnp.asarray(mask), jnp.asarray(pos),
                    deterministic=True)
    )
    p = variables["params"]
    mha = mha_from(p, "self_attn", D)
    q = t(src) + t(pos)
    attn, _ = mha(q, q, t(src), key_padding_mask=torch.from_numpy(~mask))
    x = norm_from(p, "norm1")(t(src) + attn)
    y = ffn_apply(p, "ffn", x)
    theirs = norm_from(p, "norm2")(x + y).numpy()
    for b in range(B):
        np.testing.assert_allclose(ours[b, : lens[b]], theirs[b, : lens[b]], atol=2e-5)


# ---------------------------------------------------------------------------
# DAB decoder: full anchor-refinement loop
# ---------------------------------------------------------------------------


def np_sine_embed(pos, dim):
    import math

    scale = 2 * math.pi
    each = dim // 2
    i = np.arange(each, dtype=np.float64)
    dim_t = 10000.0 ** (2 * np.floor(i / 2) / each)

    def emb(c):
        x = c[..., None] * scale / dim_t
        out = np.stack([np.sin(x[..., 0::2]), np.cos(x[..., 1::2])], -1)
        return out.reshape(*x.shape[:-1], -1)

    return np.concatenate([emb(pos[..., 0]), emb(pos[..., 1])], -1).astype(np.float32)


def test_gen_sine_embed_matches_numpy():
    rng = np.random.default_rng(3)
    pos = rng.uniform(0.05, 0.95, (2, 5, 2)).astype(np.float32)
    ours = np.asarray(gen_sine_embed(jnp.asarray(pos), D))
    np.testing.assert_allclose(ours, np_sine_embed(pos, D), atol=1e-5)


def _mlp_apply(params, name, x, relu_between=True):
    layers = sorted(params[name].keys())
    out = x
    for i, lname in enumerate(layers):
        out = linear_from(params[name], lname)(out)
        if i < len(layers) - 1:
            out = torch.relu(out)
    return out


def test_decoder_matches_torch_oracle():
    rng = np.random.default_rng(4)
    B, L, NQ, LAYERS = 2, 10, 4, 2
    memory = rng.normal(size=(B, L, D)).astype(np.float32)
    lens = rng.integers(5, L + 1, B)
    mask = np.arange(L)[None] < lens[:, None]
    pos = rng.normal(size=(B, L, D)).astype(np.float32)
    refpoints = rng.normal(size=(B, NQ, 2)).astype(np.float32)
    tgt0 = np.zeros((B, NQ, D), np.float32)

    dec = TransformerDecoder(D, H, LAYERS, FF, dropout=0.0, activation="prelu")
    variables = dec.init(
        {"params": jax.random.PRNGKey(5)},
        jnp.asarray(tgt0), jnp.asarray(memory), jnp.asarray(mask),
        jnp.asarray(pos), jnp.asarray(refpoints), deterministic=True,
    )
    hs, refs = dec.apply(
        variables, jnp.asarray(tgt0), jnp.asarray(memory), jnp.asarray(mask),
        jnp.asarray(pos), jnp.asarray(refpoints), deterministic=True,
    )
    hs, refs = np.asarray(hs), np.asarray(refs)
    p = variables["params"]

    # --- torch oracle of the DAB loop -----------------------------------
    def core_attn(pp, name, q, k, v, key_pad=None):
        """projection-free attention with out_proj; scaling by q-dim head."""
        E = q.shape[-1]
        Ev = v.shape[-1]
        hd, hdv = E // H, Ev // H
        Bq, Lq, Lk = q.shape[0], q.shape[1], k.shape[1]
        qh = q.reshape(Bq, Lq, H, hd).permute(0, 2, 1, 3) * hd**-0.5
        kh = k.reshape(Bq, Lk, H, hd).permute(0, 2, 1, 3)
        vh = v.reshape(Bq, Lk, H, hdv).permute(0, 2, 1, 3)
        logits = qh @ kh.transpose(-1, -2)
        if key_pad is not None:
            logits = logits.masked_fill(key_pad[:, None, None, :], -1e9)
        w = torch.softmax(logits, -1)
        out = (w @ vh).permute(0, 2, 1, 3).reshape(Bq, Lq, Ev)
        return linear_from(pp[name], "out_proj")(out)

    output = t(tgt0)
    reference_points = torch.sigmoid(t(refpoints))
    expected_refs = [reference_points.numpy()]
    expected_hs = []
    for lid in range(LAYERS):
        lp = p[f"layer{lid}"]
        obj_center = reference_points
        qse = t(np_sine_embed(obj_center.numpy(), D))
        query_pos = _mlp_apply(p, "ref_point_head", qse)
        if lid != 0:
            qse = qse * _mlp_apply(p, "query_scale", output)
        reft = torch.sigmoid(_mlp_apply(p, "ref_anchor_head", output))
        qse = qse * (reft[..., 0] / obj_center[..., 1]).unsqueeze(-1)

        # self attention with content/pos projections
        q = linear_from(lp, "sa_qcontent_proj")(output) + linear_from(lp, "sa_qpos_proj")(query_pos)
        k = linear_from(lp, "sa_kcontent_proj")(output) + linear_from(lp, "sa_kpos_proj")(query_pos)
        v = linear_from(lp, "sa_v_proj")(output)
        sa = core_attn(lp, "self_attn", q, k, v)
        x = norm_from(lp, "norm1")(output + sa)

        # cross attention with per-head concat of content|positional halves
        qc = linear_from(lp, "ca_qcontent_proj")(x)
        kc = linear_from(lp, "ca_kcontent_proj")(t(memory))
        vv = linear_from(lp, "ca_v_proj")(t(memory))
        kp = linear_from(lp, "ca_kpos_proj")(t(pos))
        if lid == 0:
            qc = qc + linear_from(lp, "ca_qpos_proj")(query_pos)
            kc = kc + kp
        qs = linear_from(lp, "ca_qpos_sine_proj")(qse)
        Bq = qc.shape[0]
        q2 = torch.cat(
            [qc.reshape(Bq, NQ, H, D // H), qs.reshape(Bq, NQ, H, D // H)], -1
        ).reshape(Bq, NQ, 2 * D)
        k2 = torch.cat(
            [kc.reshape(Bq, L, H, D // H), kp.reshape(Bq, L, H, D // H)], -1
        ).reshape(Bq, L, 2 * D)
        ca = core_attn(lp, "cross_attn", q2, k2, vv, key_pad=torch.from_numpy(~mask))
        x = norm_from(lp, "norm2")(x + ca)
        y = ffn_apply(lp, "ffn", x)
        output = norm_from(lp, "norm3")(x + y)

        delta = _mlp_apply(p, "bbox_embed", output)
        ref_np = reference_points.numpy()
        new_ref = torch.sigmoid(delta + t(np.asarray(
            inverse_sigmoid(jnp.asarray(ref_np)))))
        if lid != LAYERS - 1:
            expected_refs.append(new_ref.numpy())
        reference_points = new_ref.detach()
        expected_hs.append(norm_from(p, "norm")(output).numpy())

    for lid in range(LAYERS):
        np.testing.assert_allclose(hs[lid], expected_hs[lid], atol=3e-5, err_msg=f"hs layer {lid}")
        np.testing.assert_allclose(refs[lid], expected_refs[lid], atol=3e-5, err_msg=f"refs layer {lid}")

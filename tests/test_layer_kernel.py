"""Fused stream-layer Pallas kernel (ops/layer_pallas.py) vs the flax layers.

The kernel consumes the SAME parameters as the flax modules (mapped from
their param trees), so equality here proves the eval-path dispatch can swap
the module math for the kernel without touching checkpoints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mesm_tpu.models.detr import TransformerEncoderLayer
from mesm_tpu.models.t2v import T2VLayer, scrambled_pair_factors
from mesm_tpu.ops.layer_pallas import fused_stream_layer

D, H, F = 64, 4, 128


def map_params(p, attn_name):
    a = p[attn_name]
    wq, wk, wv = jnp.split(a["in_proj_kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(a["in_proj_bias"], 3)
    return dict(
        wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv,
        wo=a["out_proj"]["kernel"], bo=a["out_proj"]["bias"],
        ln1s=p["norm1"]["scale"], ln1b=p["norm1"]["bias"],
        w1=p["ffn"]["linear1"]["kernel"], b1=p["ffn"]["linear1"]["bias"],
        alpha=p["ffn"]["PReLU_0"]["alpha"],
        w2=p["ffn"]["linear2"]["kernel"], b2=p["ffn"]["linear2"]["bias"],
        ln2s=p["norm2"]["scale"], ln2b=p["norm2"]["bias"],
    )


def test_fused_encoder_layer_matches_flax():
    rng = np.random.default_rng(0)
    B, L = 4, 48
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lens = rng.integers(L // 2, L + 1, B)
    mask = jnp.asarray(np.arange(L)[None] < lens[:, None])

    layer = TransformerEncoderLayer(D, H, F, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), x, mask, pos)["params"]
    ref = layer.apply({"params": params}, x, mask, pos, deterministic=True)

    out = fused_stream_layer(
        x, pos, None, None, mask.astype(jnp.float32), None, None,
        map_params(params, "self_attn"), heads=H, self_attn=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_t2v_layer_matches_flax():
    rng = np.random.default_rng(1)
    B, Lv, Lt = 4, 40, 9
    vid = jnp.asarray(rng.normal(size=(B, Lv, D)).astype(np.float32))
    pos_v = jnp.asarray(rng.normal(size=(B, Lv, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(B, Lt, D)).astype(np.float32))
    pos_t = jnp.asarray(rng.normal(size=(B, Lt, D)).astype(np.float32))
    tlens = rng.integers(3, Lt + 1, B)
    tmask = jnp.asarray(np.arange(Lt)[None] < tlens[:, None])
    vlens = rng.integers(Lv // 2, Lv + 1, B)
    vmask = jnp.asarray(np.arange(Lv)[None] < vlens[:, None])

    layer = T2VLayer(D, H, F, dropout=0.0)
    params = layer.init(
        jax.random.PRNGKey(2), txt, vid, tmask, pos_t, pos_v, vmask
    )["params"]
    ref = layer.apply(
        {"params": params}, txt, vid, tmask, pos_t, pos_v, vmask,
        deterministic=True,
    )

    qf, kf = scrambled_pair_factors(vmask, tmask, H)  # (B, H, L)
    out = fused_stream_layer(
        vid, pos_v, txt + pos_t, txt, tmask.astype(jnp.float32),
        jnp.asarray(qf, jnp.float32).transpose(1, 0, 2),
        jnp.asarray(kf, jnp.float32).transpose(1, 0, 2),
        map_params(params, "cross_attn"), heads=H, self_attn=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_ln_dense_matches_linear_block():
    """LinearBlock's fused LN->Dense->ReLU path (forced via kernels mode
    'on'; interpret on CPU) matches the standard module math, through BOTH
    init and apply — proving the bound-variables param plumbing."""
    from mesm_tpu import kernels
    from mesm_tpu.models.layers import LinearBlock

    rng = np.random.default_rng(3)
    for relu, (B, L, Din) in ((True, (3, 7, 96)), (False, (2, 11, 40))):
        x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
        block = LinearBlock(32, layer_norm=True, dropout=0.3, relu=relu)
        try:
            kernels.set_pallas_attention("off")
            params = block.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                x, deterministic=True,
            )["params"]
            ref = block.apply({"params": params}, x, deterministic=True)
            kernels.set_pallas_attention("on")
            # init under the fused path must produce the same param tree
            params_f = block.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                x, deterministic=True,
            )["params"]
            assert jax.tree.structure(params_f) == jax.tree.structure(params)
            for a, b in zip(jax.tree.leaves(params_f), jax.tree.leaves(params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            out = block.apply({"params": params}, x, deterministic=True)
        finally:
            kernels.set_pallas_attention(None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=f"relu={relu}"
        )

"""Attention core vs numpy oracle, and the fused Pallas kernel (interpret mode
on CPU) vs the XLA core."""
import jax
import jax.numpy as jnp
import numpy as np

from mesm_tpu.models.attention import attention_core
from mesm_tpu.ops.attention_pallas import fused_attention


def np_attention(q, k, v, num_heads, key_valid=None):
    B, Lq, E = q.shape
    Lk, Ev = k.shape[1], v.shape[-1]
    hd, hdv = E // num_heads, Ev // num_heads
    out = np.zeros((B, Lq, Ev), np.float32)
    for b in range(B):
        for h in range(num_heads):
            qh = q[b, :, h * hd : (h + 1) * hd] * hd**-0.5
            kh = k[b, :, h * hd : (h + 1) * hd]
            vh = v[b, :, h * hdv : (h + 1) * hdv]
            logits = qh @ kh.T
            if key_valid is not None:
                logits = np.where(key_valid[b][None, :], logits, -1e9)
            logits = logits - logits.max(-1, keepdims=True)
            p = np.exp(logits)
            p = p / p.sum(-1, keepdims=True)
            out[b, :, h * hdv : (h + 1) * hdv] = p @ vh
    return out


def _rand_qkv(rng, B=3, Lq=10, Lk=17, E=32, Ev=16, H=4):
    q = rng.normal(size=(B, Lq, E)).astype(np.float32)
    k = rng.normal(size=(B, Lk, E)).astype(np.float32)
    v = rng.normal(size=(B, Lk, Ev)).astype(np.float32)
    lens = rng.integers(3, Lk + 1, B)
    mask = np.arange(Lk)[None] < lens[:, None]
    return q, k, v, mask


def test_core_matches_oracle():
    rng = np.random.default_rng(0)
    q, k, v, mask = _rand_qkv(rng)
    out = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(out), np_attention(q, k, v, 4, mask), atol=1e-5)


def test_core_different_vdim():
    """decoder cross-attn: 2*d queries/keys, d values."""
    rng = np.random.default_rng(1)
    q, k, v, mask = _rand_qkv(rng, E=64, Ev=32)
    out = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(out), np_attention(q, k, v, 4, mask), atol=1e-5)


def test_fused_pallas_matches_core():
    """Kernel itself (bypassing the size-threshold dispatch) vs the XLA core."""
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    rng = np.random.default_rng(2)
    for shape in [
        dict(B=2, Lq=64, Lk=64, E=32, Ev=32),
        dict(B=2, Lq=96, Lk=64, E=64, Ev=32),
        dict(B=3, Lq=10, Lk=17),  # small shapes still correct in the kernel
    ]:
        q, k, v, mask = _rand_qkv(rng, **shape)
        ours = _fused_attention_impl(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask, jnp.float32) if mask is not None else None,
            4, True,
        )
        ref = attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_fused_pallas_all_variants_match():
    """All three kernel layouts agree with the XLA core (incl. odd batch
    sizes that force uneven sample-tile divisors in the batched variant)."""
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    rng = np.random.default_rng(7)
    for B in (2, 3, 8):
        q, k, v, mask = _rand_qkv(rng, B=B, Lq=96, Lk=64, E=64, Ev=64)
        ref = attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
        )
        for variant in ("per_head", "all_heads", "batched", "packed"):
            ours = _fused_attention_impl(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(mask, jnp.float32), 4, True, variant,
            )
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-5,
                err_msg=f"variant={variant} B={B}",
            )


def test_fused_dispatch_large_shapes():
    """Above the threshold the dispatcher takes the kernel path and matches."""
    rng = np.random.default_rng(3)
    q, k, v, mask = _rand_qkv(rng, B=2, Lq=80, Lk=80, E=32, Ev=32)
    ours = fused_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
    )
    ref = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_fused_falls_back_for_dropout_and_bias():
    rng = np.random.default_rng(4)
    q, k, v, mask = _rand_qkv(rng)
    bias = np.zeros((1, 1, 10, 17), np.float32)
    out = fused_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask),
        logit_bias=jnp.asarray(bias),
    )
    ref = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    out2 = fused_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 4, jnp.asarray(mask),
        dropout_rate=0.5, deterministic=False, dropout_rng=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_fused_packed_pair_factors_match_core():
    """The packed variant's in-kernel pair mask (t2v scrambled factors)
    matches the XLA core's fused outer-product masking, incl. short keys."""
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    rng = np.random.default_rng(11)
    for B, Lq, Lk, E in ((4, 96, 17, 64), (6, 80, 72, 128)):
        H = 4
        q, k, v, mask = _rand_qkv(rng, B=B, Lq=Lq, Lk=Lk, E=E, Ev=E, H=H)
        qf = (rng.random((B, H, Lq)) < 0.3)
        kf = (rng.random((B, H, Lk)) < 0.3)
        # keep at least one attendable key per (b, h, q): clear kf where the
        # key-padding mask already removes most keys
        kf &= mask[:, None, :]
        ref = attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, jnp.asarray(mask),
            pair_factors=(jnp.asarray(qf), jnp.asarray(kf)),
        )
        ours = _fused_attention_impl(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask, jnp.float32), H, True, "packed",
            # the impl takes the factors head-major (H, B, L)
            jnp.asarray(qf, jnp.float32).transpose(1, 0, 2),
            jnp.asarray(kf, jnp.float32).transpose(1, 0, 2),
        )
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5,
            err_msg=f"B={B} Lq={Lq} Lk={Lk}",
        )


def test_fused_packed_shortkey_matches_core():
    """Transposed-logits short-key variant (t2v geometry: long queries, few
    keys) vs the XLA core, with and without the factored pair mask. The
    variant engages inside the packed branch whenever Lk < MIN_FUSED_LK."""
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    rng = np.random.default_rng(13)
    H = 4
    for with_pair in (False, True):
        q, k, v, mask = _rand_qkv(rng, B=4, Lq=96, Lk=17, E=64, Ev=64, H=H)
        pf = None
        qfkf = (None, None)
        if with_pair:
            qf = rng.random((4, H, 96)) < 0.3
            kf = (rng.random((4, H, 17)) < 0.3) & mask[:, None, :]
            pf = (jnp.asarray(qf), jnp.asarray(kf))
            qfkf = (
                jnp.asarray(qf, jnp.float32).transpose(1, 0, 2),
                jnp.asarray(kf, jnp.float32).transpose(1, 0, 2),
            )
        ref = attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, jnp.asarray(mask),
            pair_factors=pf,
        )
        ours = _fused_attention_impl(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask, jnp.float32), H, True, "packed", *qfkf,
        )
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5,
            err_msg=f"with_pair={with_pair}",
        )


import pytest


@pytest.mark.parametrize("variant", ["reshape", "segmm"])
def test_shortkey_packed_xla_matches_core(variant, monkeypatch):
    """attention_core_shortkey (one-matmul all-heads block-diagonal packing,
    pure XLA) vs attention_core, incl. pair factors, different vdim, and the
    degenerate fully-masked (b,h,q) row the scrambled pair mask can create
    (both must give the reference's uniform-over-keys weights there).
    Covers both softmax variants (kernels.SHORTKEY_VARIANT)."""
    from mesm_tpu import kernels
    from mesm_tpu.models.attention import attention_core_shortkey

    monkeypatch.setattr(kernels, "SHORTKEY_VARIANT", variant)
    rng = np.random.default_rng(17)
    for B, Lq, Lk, E, Ev, H in (
        (4, 96, 17, 64, 64, 4),
        (3, 80, 9, 48, 24, 8),  # vdim != embed dim
        (5, 64, 33, 128, 128, 4),
    ):
        q, k, v, mask = _rand_qkv(rng, B=B, Lq=Lq, Lk=Lk, E=E, Ev=Ev, H=H)
        for with_pair in (False, True):
            pf = None
            if with_pair:
                qf = rng.random((B, H, Lq)) < 0.3
                kf = rng.random((B, H, Lk)) < 0.3
                # force one (b, h) to flag EVERY key and some queries: those
                # rows are fully masked and must fall back to uniform
                kf[0, 0, :] = True
                qf[0, 0, :8] = True
                pf = (jnp.asarray(qf), jnp.asarray(kf))
            ref = attention_core(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                jnp.asarray(mask), pair_factors=pf,
            )
            ours = attention_core_shortkey(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                jnp.asarray(mask), pair_factors=pf,
            )
            assert np.isfinite(np.asarray(ours)).all()
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-5,
                err_msg=f"B={B} Lq={Lq} Lk={Lk} pair={with_pair}",
            )


def test_shortquery_packed_xla_matches_core():
    """attention_core_shortquery (block-diagonal QUERY packing for the
    SS-recon / decoder-cross geometry: few queries, long keys) vs
    attention_core, incl. pair factors, different vdim (decoder: 2d q/k,
    d v), and fully-masked rows (uniform fallback). Also gradient parity
    (the path is pure XLA and engages in training)."""
    from mesm_tpu.models.attention import attention_core_shortquery

    rng = np.random.default_rng(31)
    for B, Lq, Lk, E, Ev, H in (
        (4, 3, 96, 64, 64, 4),    # ss-recon-like
        (3, 10, 128, 64, 32, 8),  # decoder-like (vdim != embed dim)
        (5, 1, 80, 48, 48, 4),
    ):
        q, k, v, mask = _rand_qkv(rng, B=B, Lq=Lq, Lk=Lk, E=E, Ev=Ev, H=H)
        for with_pair in (False, True):
            pf = None
            if with_pair:
                qf = rng.random((B, H, Lq)) < 0.3
                kf = rng.random((B, H, Lk)) < 0.3
                kf[0, 0, :] = True
                qf[0, 0, :1] = True  # fully-masked (b,h,q) row
                pf = (jnp.asarray(qf), jnp.asarray(kf))
            ref = attention_core(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                jnp.asarray(mask), pair_factors=pf,
            )
            ours = attention_core_shortquery(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                jnp.asarray(mask), pair_factors=pf,
            )
            assert np.isfinite(np.asarray(ours)).all()
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-5,
                err_msg=f"B={B} Lq={Lq} Lk={Lk} pair={with_pair}",
            )

    q, k, v, mask = _rand_qkv(rng, B=2, Lq=4, Lk=72, E=32, Ev=32, H=4)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, 4, jnp.asarray(mask)) ** 2)

    g_ref = jax.grad(loss(attention_core), argnums=(0, 1, 2))(*args)
    g_new = jax.grad(loss(attention_core_shortquery), argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_ref, g_new, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"grad d{name}"
        )


def test_split_qk_matches_concat():
    """split_qk (DAB decoder cross-attn: logits = <qc,kc> + <qpos,kpos>)
    must equal the per-head concat form, in the plain core AND the
    shortquery formulation (which the decoder geometry dispatches to)."""
    from mesm_tpu.models.attention import attention_core_shortquery

    rng = np.random.default_rng(37)
    B, Lq, Lk, d, H = 3, 10, 97, 64, 4
    qc = rng.normal(size=(B, Lq, d)).astype(np.float32)
    kc = rng.normal(size=(B, Lk, d)).astype(np.float32)
    qp = rng.normal(size=(B, Lq, d)).astype(np.float32)
    kp = rng.normal(size=(B, Lk, d)).astype(np.float32)
    v = rng.normal(size=(B, Lk, d)).astype(np.float32)
    mask = np.arange(Lk)[None] < rng.integers(10, Lk + 1, B)[:, None]

    hd = d // H
    q_cat = np.concatenate(
        [qc.reshape(B, Lq, H, hd), qp.reshape(B, Lq, H, hd)], axis=-1
    ).reshape(B, Lq, 2 * d)
    k_cat = np.concatenate(
        [kc.reshape(B, Lk, H, hd), kp.reshape(B, Lk, H, hd)], axis=-1
    ).reshape(B, Lk, 2 * d)
    ref = attention_core(
        jnp.asarray(q_cat), jnp.asarray(k_cat), jnp.asarray(v), H, jnp.asarray(mask)
    )
    for fn in (attention_core, attention_core_shortquery):
        got = fn(
            jnp.asarray(qc), jnp.asarray(kc), jnp.asarray(v), H,
            jnp.asarray(mask), split_qk=(jnp.asarray(qp), jnp.asarray(kp)),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, err_msg=fn.__name__
        )


def test_shortkey_onematmul_kernel_matches_core():
    """v5 one-matmul short-key Pallas kernel (interpret mode on CPU) vs the
    XLA core, with/without pair factors, incl. a fully-masked (b,h,q) row
    (uniform fallback)."""
    from mesm_tpu.ops.attention_pallas import fused_attention_shortkey

    rng = np.random.default_rng(23)
    for B, Lq, Lk, E, Ev, H in (
        (4, 96, 17, 64, 64, 4),
        (2, 80, 9, 48, 24, 8),
    ):
        q, k, v, mask = _rand_qkv(rng, B=B, Lq=Lq, Lk=Lk, E=E, Ev=Ev, H=H)
        for with_pair in (False, True):
            pf = None
            if with_pair:
                qf = rng.random((B, H, Lq)) < 0.3
                kf = rng.random((B, H, Lk)) < 0.3
                kf[0, 0, :] = True
                qf[0, 0, :8] = True
                pf = (jnp.asarray(qf), jnp.asarray(kf))
            ref = attention_core(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                jnp.asarray(mask), pair_factors=pf,
            )
            ours = fused_attention_shortkey(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                key_valid_mask=jnp.asarray(mask), pair_factors=pf,
                interpret=True,
            )
            assert np.isfinite(np.asarray(ours)).all()
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-5,
                err_msg=f"B={B} Lq={Lq} Lk={Lk} pair={with_pair}",
            )


def test_shortkey_packed_xla_grad_matches_core():
    """The shortkey formulation is differentiable (training path): gradients
    w.r.t. q/k/v match the core's."""
    from mesm_tpu.models.attention import attention_core_shortkey

    rng = np.random.default_rng(19)
    q, k, v, mask = _rand_qkv(rng, B=2, Lq=24, Lk=9, E=32, Ev=32, H=4)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    def loss(fn):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v, 4, jnp.asarray(mask)) ** 2
        )

    g_ref = jax.grad(loss(attention_core), argnums=(0, 1, 2))(*args)
    g_new = jax.grad(loss(attention_core_shortkey), argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_ref, g_new, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"grad d{name}"
        )


def test_fused_attention_trainable_grad_matches_core():
    """custom_vjp wrapper: kernel forward (interpret on CPU), XLA-recompute
    backward — gradients must match the plain XLA core's exactly (same vjp),
    and the forward must match the fused kernel's. Also with pair factors."""
    from mesm_tpu.ops.attention_pallas import fused_attention_trainable

    rng = np.random.default_rng(29)
    H = 4
    q, k, v, mask = _rand_qkv(rng, B=2, Lq=96, Lk=96, E=64, Ev=64, H=H)
    qf = jnp.asarray(rng.random((2, H, 96)) < 0.2)
    kf = jnp.asarray((rng.random((2, H, 96)) < 0.2) & mask[:, None, :])
    for pf in (None, (qf, kf)):
        args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

        def loss(fn):
            return lambda q, k, v: jnp.sum(
                fn(q, k, v, H, jnp.asarray(mask), pf) ** 2
            )

        def core(q, k, v, nh, m, pf):
            return attention_core(q, k, v, num_heads=nh, key_valid_mask=m, pair_factors=pf)

        vr, g_ref = jax.value_and_grad(loss(core), argnums=(0, 1, 2))(*args)
        vn, g_new = jax.value_and_grad(loss(fused_attention_trainable), argnums=(0, 1, 2))(*args)
        np.testing.assert_allclose(float(vn), float(vr), rtol=1e-5)
        for a, b, name in zip(g_ref, g_new, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"grad d{name} pair={pf is not None}",
            )


def test_fused_packed_bf16_close_to_core():
    """bf16 packed kernel (bf16-stored logits + bf16 softmax stages, f32
    denominator) vs the bf16 XLA core — same storage precision, so outputs
    agree to bf16 rounding."""
    from mesm_tpu.ops.attention_pallas import _fused_attention_impl

    rng = np.random.default_rng(17)
    q, k, v, mask = _rand_qkv(rng, B=4, Lq=96, Lk=96, E=64, Ev=64)
    qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))
    ref = attention_core(qb, kb, vb, 4, jnp.asarray(mask)).astype(jnp.float32)
    ours = _fused_attention_impl(
        qb, kb, vb, jnp.asarray(mask, jnp.float32), 4, True, "packed"
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=0.03, rtol=0.03)


def test_attn_remat_matches_plain(monkeypatch):
    """kernels.ATTN_REMAT wraps the training attention core in
    jax.checkpoint (recompute-in-backward, see models/attention.py
    _attention_core_remat): values AND grads must match the plain core —
    same ops, and the dropout rng key is replayed so the recomputed mask is
    identical."""
    from mesm_tpu import kernels
    from mesm_tpu.models.attention import dispatch_attention_core

    rng = np.random.default_rng(31)
    q, k, v, mask = _rand_qkv(rng, B=2, Lq=128, Lk=128, E=32, Ev=32, H=4)
    key = jax.random.PRNGKey(3)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    def loss(q, k, v):
        out = dispatch_attention_core(
            q, k, v, num_heads=4, key_valid_mask=jnp.asarray(mask),
            dropout_rate=0.1, deterministic=False, dropout_rng=key)
        return jnp.sum(out ** 2)

    monkeypatch.setattr(kernels, "ATTN_REMAT", False)
    vr, g_ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(*args)
    monkeypatch.setattr(kernels, "ATTN_REMAT", True)
    assert kernels.use_attn_remat(128, 128, deterministic=False)
    assert not kernels.use_attn_remat(128, 128, deterministic=True)
    assert not kernels.use_attn_remat(10, 195, deterministic=False)
    vn, g_new = jax.value_and_grad(loss, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(vn), float(vr), rtol=1e-6)
    for a, b, name in zip(g_ref, g_new, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=f"grad d{name}"
        )

"""Sine position embedding: the half-frequency interleave (round-4 perf
reformulation, models/position.py) must be BIT-identical in f32 to the
reference-shaped strided even/odd formulation (reference
model/position_encoding.py:35-72), and the torch reference itself."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from mesm_tpu.models.position import sine_position_embedding

pytestmark = pytest.mark.smoke


def strided_reference_form(mask, num_pos_feats, temperature=10000.0,
                           scale=2 * math.pi):
    """The original formulation: full-F quotient, even/odd strided slices
    (what the round-4 rewrite replaced)."""
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    x_embed = x_embed / (x_embed[:, -1:] + 1e-6) * scale
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(i / 2) / num_pos_feats)
    pos = x_embed[:, :, None] / dim_t
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


@pytest.mark.parametrize("F", [32, 256])
def test_half_freq_interleave_bit_identical(F):
    rng = np.random.default_rng(0)
    lens = rng.integers(3, 20, size=6)
    mask = np.arange(20)[None, :] < lens[:, None]
    new = sine_position_embedding(jnp.asarray(mask), F)
    old = strided_reference_form(jnp.asarray(mask), F)
    np.testing.assert_array_equal(np.asarray(new), np.asarray(old))


def test_bf16_output_equals_late_cast():
    """dtype=bf16 output must equal computing in f32 and casting after —
    the cast lands on the same f32 sin/cos values either way."""
    mask = jnp.asarray(np.arange(16)[None, :] < 11)
    f32 = sine_position_embedding(mask, 64, dtype=jnp.float32)
    bf16 = sine_position_embedding(mask, 64, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(bf16), np.asarray(f32.astype(jnp.bfloat16))
    )


def test_torch_reference_parity():
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.position_encoding import PositionEmbeddingSine

    rng = np.random.default_rng(1)
    lens = rng.integers(4, 24, size=5)
    mask = np.arange(24)[None, :] < lens[:, None]
    ref = PositionEmbeddingSine(128, normalize=True)  # -> 128-d embedding
    with torch.no_grad():
        theirs = ref(torch.zeros(5, 24, 1), torch.from_numpy(mask)).numpy()
    ours = np.asarray(sine_position_embedding(jnp.asarray(mask), 128))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

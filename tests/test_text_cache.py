"""Frozen-text caching must be value-identical to per-step encoding."""
import types

import jax.numpy as jnp
import numpy as np

from mesm_tpu import runner as R
from mesm_tpu.data.collate import BatchSpec, make_collate

from test_data import charades_root, make_charades  # fixtures/helpers  # noqa: F401


def test_cached_equals_fresh(charades_root):  # noqa: F811
    ds = make_charades(charades_root)
    opt = types.SimpleNamespace(
        tokenizer_type="GloVeSimple",
        load_vocab_pkl=False,
        normalize_txt=True,
        max_words_l=8,
        text_model_path=str(charades_root["feat"]),  # unused by this path
        seed=0,
    )
    # GloVe encoder over the fixture vocab (random table, frozen)
    vocab = charades_root["vocab"]
    from mesm_tpu.models import GloVeTextEncoder

    table = np.random.default_rng(0).normal(size=(len(vocab), 300)).astype(np.float32)
    glove = GloVeTextEncoder(num_embeddings=len(vocab), features=300)
    frozen = {"embedding": jnp.asarray(table)}
    from mesm_tpu.models.text_encoder import glove_encode_text

    def encode(frozen_p, batch):
        if "cached_words_feat" in batch:
            return (
                batch["cached_words_feat"],
                batch["cached_words_mask"],
                batch["cached_sentence_feat"],
            )
        ids = batch["words_id"]
        mask = ids != 0
        wf, sf = glove_encode_text(glove, frozen_p, ids, mask, True)
        return wf, mask, sf

    spec = BatchSpec(row_capacity=8, max_video_l=20, group_capacity=3)
    collate = make_collate(spec)
    batch_fresh, meta = collate([ds[0], ds[1]])
    wf0, m0, sf0 = encode(frozen, {k: jnp.asarray(v) for k, v in batch_fresh.items()})

    R.cache_text_features(ds, encode, frozen, chunk=4)
    batch_cached, meta2 = collate([ds[0], ds[1]])
    assert "cached_words_feat" in batch_cached
    assert meta["qid"] == meta2["qid"]
    wf1, m1, sf1 = encode(frozen, {k: jnp.asarray(v) for k, v in batch_cached.items()})

    n = meta["n_rows"]
    np.testing.assert_allclose(np.asarray(wf0)[:n], np.asarray(wf1)[:n], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m0)[:n], np.asarray(m1)[:n])
    np.testing.assert_allclose(np.asarray(sf0)[:n], np.asarray(sf1)[:n], atol=1e-6)

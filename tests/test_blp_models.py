"""Model-assembly tests: init/encode/train_loss for each family member, and
end-to-end loss parity for the transductive model vs hand-built torch math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from blp_tpu.data import sample_negative_indices
from blp_tpu.models import bert, blp

B, K, L = 4, 6, 16


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    vocab = cfg.encoder.vocab_size if cfg.model == "blp" else cfg.vocab_size
    tok = rng.integers(1, vocab, size=(B, 2, L))
    lengths = rng.integers(4, L + 1, size=(B, 2))
    mask = (np.arange(L)[None, None, :] < lengths[..., None]).astype(np.float32)
    tok = tok * mask.astype(np.int64)
    return {
        "text_tok": jnp.asarray(tok),
        "text_mask": jnp.asarray(mask),
        "rels": jnp.asarray(rng.integers(0, cfg.num_relations, size=(B,))),
        "neg_idx": sample_negative_indices(jax.random.key(seed), B, K),
    }


@pytest.mark.parametrize("model,rel_model", [
    ("blp", "transe"),
    ("bert-bow", "distmult"),
    ("bert-dkrl", "complex"),
    ("glove-bow", "simple"),
    ("glove-dkrl", "transe"),
])
def test_text_models_init_encode_loss(model, rel_model):
    enc = bert.BertConfig.tiny() if model == "blp" else None
    cfg = blp.ModelConfig(model=model, rel_model=rel_model, loss_fn="margin",
                          dim=16, num_relations=3, emb_dim=12, vocab_size=60,
                          encoder=enc)
    params = blp.init_params(jax.random.key(0), cfg)
    batch = _batch(cfg)

    flat_tok = batch["text_tok"].reshape(2 * B, L)
    flat_mask = batch["text_mask"].reshape(2 * B, L)
    embs = blp.encode(params, cfg, flat_tok, flat_mask)
    assert embs.shape == (2 * B, cfg.entity_dim)
    if cfg.normalize_embs:
        np.testing.assert_allclose(np.linalg.norm(np.asarray(embs), axis=-1),
                                   1.0, rtol=1e-5)

    loss = blp.train_loss(params, cfg, batch, deterministic=True)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: blp.train_loss(p, cfg, batch, deterministic=True))(params)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_transductive_loss_parity():
    cfg = blp.ModelConfig(model="transductive", rel_model="distmult",
                          loss_fn="nll", dim=8, num_relations=2, num_entities=20)
    params = blp.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    pairs = rng.integers(0, 20, size=(B, 2))
    rels = rng.integers(0, 2, size=(B,))
    neg_idx = np.asarray(sample_negative_indices(jax.random.key(1), B, K))
    batch = {"pos_pairs": jnp.asarray(pairs), "rels": jnp.asarray(rels),
             "neg_idx": jnp.asarray(neg_idx)}
    got = blp.train_loss(params, cfg, batch)

    ent = torch.from_numpy(np.asarray(params["ent_emb"]))[torch.from_numpy(pairs)]
    rel = torch.from_numpy(np.asarray(params["rel_emb"]))[torch.from_numpy(rels)]
    pos = (ent[:, 0] * rel * ent[:, 1]).sum(-1, keepdim=True)
    flat = ent.reshape(2 * B, -1)
    neg = (flat[neg_idx[..., 0]] * rel.unsqueeze(1) * flat[neg_idx[..., 1]]).sum(-1)
    want = ((F.softplus(-pos).mean() + F.softplus(neg).mean()) / 2).item()
    assert np.isclose(float(got), want, rtol=1e-5)


def test_blp_projection_semantics():
    """BLP embedding == CLS hidden state @ proj (reference models.py:107-111)."""
    cfg = blp.ModelConfig(model="blp", rel_model="distmult", dim=16,
                          num_relations=2, encoder=bert.BertConfig.tiny())
    params = blp.init_params(jax.random.key(0), cfg)
    tok = jnp.asarray(np.random.default_rng(0).integers(1, 128, size=(3, 10)))
    hidden = bert.bert_encode(params["bert"], tok, None, cfg.encoder)
    want = hidden[:, 0] @ params["proj"]
    got = blp.encode_raw(params, cfg, tok, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_word_embedding_injection():
    we = np.random.default_rng(0).standard_normal((40, 12)).astype(np.float32)
    cfg = blp.ModelConfig(model="glove-bow", rel_model="transe", dim=0,
                          num_relations=2, emb_dim=12)
    params = blp.init_params(jax.random.key(0), cfg, word_embeddings=we)
    np.testing.assert_array_equal(np.asarray(params["word_emb"]), we)
    assert params["rel_emb"].shape == (2, 12)  # BOW entity dim == emb_dim

    with pytest.raises(ValueError):
        blp.init_params(jax.random.key(0), cfg,
                        word_embeddings=we[:, :5])


def test_config_validation():
    with pytest.raises(ValueError):
        blp.ModelConfig(model="gpt")
    with pytest.raises(ValueError):
        blp.ModelConfig(rel_model="rotate")
    with pytest.raises(ValueError):
        blp.ModelConfig(loss_fn="mse")

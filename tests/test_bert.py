"""BERT parity: our pure-JAX stacked-scan encoder vs transformers.BertModel
with identical (randomly initialized) weights — no network needed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from blp_tpu.models import bert

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    hf_cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_activation_parity(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    B, S = 4, 12
    ids = rng.integers(1, hf_cfg.vocab_size, size=(B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    ids = ids * mask  # pad ids to 0 where masked

    with torch.no_grad():
        out = model(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    want_hidden = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    got = bert.bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got), want_hidden, rtol=2e-4, atol=2e-5)

    pooled = bert.bert_pooler(params, got, cfg)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, rtol=2e-4, atol=2e-5)


def test_no_mask_equals_all_ones(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 99, size=(2, 7)))
    a = bert.bert_encode(params, ids, None, cfg)
    b = bert.bert_encode(params, ids, jnp.ones_like(ids), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_remat_matches(torch_model_and_cfg):
    model, hf_cfg = torch_model_and_cfg
    cfg = bert.config_from_hf(hf_cfg)
    cfg_r = bert.BertConfig(**{**cfg.__dict__, "remat": True})
    params = bert.params_from_hf_state_dict(model.state_dict(), cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 99, size=(2, 9)))
    a = bert.bert_encode(params, ids, None, cfg)
    b = bert.bert_encode(params, ids, None, cfg_r)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_init_shapes_and_grads():
    cfg = bert.BertConfig.tiny()
    params = bert.init_bert_params(jax.random.key(0), cfg)
    assert params["layers"]["q_w"].shape == (cfg.num_layers, 32, 32)
    ids = jnp.ones((2, 8), jnp.int32)

    def loss(p):
        return jnp.sum(bert.bert_encode(p, ids, None, cfg) ** 2)

    g = jax.grad(loss)(params)
    leaf_norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(leaf_norms))
    assert max(leaf_norms) > 0


def test_dropout_determinism_flags():
    cfg = bert.BertConfig.tiny()
    params = bert.init_bert_params(jax.random.key(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(ValueError):
        bert.bert_encode(params, ids, None, cfg, deterministic=False)
    a = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    b = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(1))
    c = bert.bert_encode(params, ids, None, cfg, deterministic=False,
                         dropout_rng=jax.random.key(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))

"""Reference-checkpoint converter: build reference-shaped torch state dicts
(same key layout as dfdazac/blp's model.state_dict()), convert, and verify
the converted parameters drive this framework's encoders to the same outputs
as an independent torch computation."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_reference_checkpoint import convert_state_dict  # noqa: E402

from blp_tpu import checkpoint as ckpt  # noqa: E402
from blp_tpu.models import bert, blp, encoders  # noqa: E402

transformers = pytest.importorskip("transformers")


def test_convert_blp(tmp_path):
    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40)
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_cfg).eval()
    enc_linear = torch.nn.Linear(32, 16, bias=False)
    rel = torch.randn(5, 16)

    sd = {"module.rel_emb.weight": rel,
          "module.enc_linear.weight": enc_linear.weight.detach()}
    for k, v in hf_model.state_dict().items():
        sd[f"module.encoder.{k}"] = v

    params = convert_state_dict(sd, "blp")
    np.testing.assert_allclose(params["rel_emb"], rel.numpy())
    assert params["proj"].shape == (32, 16)

    # Round-trip through the npz checkpoint format.
    path = tmp_path / "model.npz"
    ckpt.save_pytree(str(path), params, metadata={"model": "blp"})
    loaded, meta = ckpt.load_pytree(str(path))
    assert meta["model"] == "blp"

    # distmult: no TransE entity normalization, so encode() is the raw
    # [CLS]-projection and comparable to the torch computation directly.
    cfg = blp.ModelConfig(
        model="blp", rel_model="distmult", loss_fn="margin", dim=16,
        num_relations=5,
        encoder=bert.BertConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=48, max_position_embeddings=40))
    rng = np.random.default_rng(0)
    tok = rng.integers(1, 64, (4, 10))
    mask = np.ones((4, 10), np.float32)
    got = blp.encode(loaded, cfg, jnp.asarray(tok), jnp.asarray(mask),
                     deterministic=True)
    with torch.no_grad():
        cls = hf_model(torch.from_numpy(tok),
                       torch.from_numpy(mask)).last_hidden_state[:, 0]
        want = enc_linear(cls)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_convert_dkrl():
    V, E, D = 20, 8, 6
    torch.manual_seed(1)
    sd = {
        "rel_emb.weight": torch.randn(3, D),
        "embeddings.weight": torch.randn(V, E),
        "conv1.weight": torch.randn(D, E, 2),
        "conv1.bias": torch.randn(D),
        "conv2.weight": torch.randn(D, D, 2),
        "conv2.bias": torch.randn(D),
    }
    params = convert_state_dict(sd, "glove-dkrl")

    rng = np.random.default_rng(3)
    B, L = 4, 8  # multiple of 4: fixed pool kernel branch
    tok = rng.integers(1, V, (B, L))
    mask = np.ones((B, L), np.float32)
    got = encoders.dkrl_encode(
        jax.tree.map(jnp.asarray, params["dkrl"]),
        jnp.asarray(params["word_emb"]), jnp.asarray(tok), jnp.asarray(mask))

    from test_encoders import torch_dkrl
    want = torch_dkrl(params["word_emb"], tok, mask,
                      sd["conv1.weight"], sd["conv1.bias"],
                      sd["conv2.weight"], sd["conv2.bias"])
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_convert_bow_and_transductive():
    sd = {"rel_emb.weight": torch.randn(3, 8),
          "embeddings.weight": torch.randn(20, 8)}
    p = convert_state_dict(sd, "bert-bow")
    assert set(p) == {"rel_emb", "word_emb"}

    sd = {"rel_emb.weight": torch.randn(3, 8),
          "ent_emb.weight": torch.randn(11, 8)}
    p = convert_state_dict(sd, "transductive")
    assert p["ent_emb"].shape == (11, 8)

    with pytest.raises(ValueError):
        convert_state_dict(sd, "nope")

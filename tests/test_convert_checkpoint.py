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


def test_converted_checkpoints_score_parity_all_families():
    """End-to-end TRIPLE-SCORE parity for every model family: a reference-
    style state dict (DataParallel 'module.' prefixed) converted by the tool
    must produce the same TransE scores as an independent torch computation
    (encoder -> L2 normalize -> -||h + r - t||), not just matching leaves."""
    import torch.nn.functional as F

    from test_scoring import torch_scores
    from blp_tpu.models import scoring

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    B, L, V, E, D = 5, 8, 24, 12, 8
    tok_h = rng.integers(1, V, (B, L))
    tok_t = rng.integers(1, V, (B, L))
    mask = np.ones((B, L), np.float32)
    rels = rng.integers(0, 3, B)
    rel_w = torch.randn(3, D)

    def jax_scores(params, cfg):
        h = blp.encode(params, cfg, jnp.asarray(tok_h), jnp.asarray(mask),
                       deterministic=True)
        t = blp.encode(params, cfg, jnp.asarray(tok_t), jnp.asarray(mask),
                       deterministic=True)
        r = jnp.asarray(params["rel_emb"])[jnp.asarray(rels)]
        return np.asarray(scoring.get_score_fn("transe")(h, t, r))

    def torch_transe(h_emb, t_emb):
        h = F.normalize(h_emb, dim=-1).numpy()
        t = F.normalize(t_emb, dim=-1).numpy()
        return torch_scores("transe", h, t, rel_w.numpy()[rels]).numpy()

    # ---- bow (word-table masked mean; dim == emb width) -------------------
    emb = torch.randn(V, E)
    rel_w_bow = torch.randn(3, E)
    sd = {"module.rel_emb.weight": rel_w_bow,
          "module.embeddings.weight": emb}
    p = jax.tree.map(jnp.asarray, convert_state_dict(sd, "bert-bow"))
    cfg = blp.ModelConfig(model="bert-bow", rel_model="transe", dim=0,
                          num_relations=3, emb_dim=E, vocab_size=V)
    with torch.no_grad():
        th = emb[torch.from_numpy(tok_h)].mean(1)
        tt = emb[torch.from_numpy(tok_t)].mean(1)
        want = torch_scores(
            "transe", F.normalize(th, dim=-1).numpy(),
            F.normalize(tt, dim=-1).numpy(),
            rel_w_bow.numpy()[rels]).numpy()
    np.testing.assert_allclose(jax_scores(p, cfg), want, rtol=1e-4, atol=1e-5)

    # ---- dkrl (CNN encoder) ----------------------------------------------
    sd = {"module.rel_emb.weight": rel_w,
          "module.embeddings.weight": emb,
          "module.conv1.weight": torch.randn(D, E, 2),
          "module.conv1.bias": torch.randn(D),
          "module.conv2.weight": torch.randn(D, D, 2),
          "module.conv2.bias": torch.randn(D)}
    p = jax.tree.map(jnp.asarray, convert_state_dict(sd, "glove-dkrl"))
    cfg = blp.ModelConfig(model="glove-dkrl", rel_model="transe", dim=D,
                          num_relations=3, emb_dim=E, vocab_size=V)
    from test_encoders import torch_dkrl
    with torch.no_grad():
        th = torch_dkrl(emb.numpy(), tok_h, mask, sd["module.conv1.weight"],
                        sd["module.conv1.bias"], sd["module.conv2.weight"],
                        sd["module.conv2.bias"])
        tt = torch_dkrl(emb.numpy(), tok_t, mask, sd["module.conv1.weight"],
                        sd["module.conv1.bias"], sd["module.conv2.weight"],
                        sd["module.conv2.bias"])
    np.testing.assert_allclose(jax_scores(p, cfg), torch_transe(th, tt),
                               rtol=1e-4, atol=1e-5)

    # ---- blp (BERT + bias-free projection) -------------------------------
    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=24,
        max_position_embeddings=16)
    hf_model = transformers.BertModel(hf_cfg).eval()
    lin = torch.nn.Linear(16, D, bias=False)
    sd = {"module.rel_emb.weight": rel_w,
          "module.enc_linear.weight": lin.weight.detach()}
    for k, v in hf_model.state_dict().items():
        sd[f"module.encoder.{k}"] = v
    p = jax.tree.map(jnp.asarray, convert_state_dict(sd, "blp"))
    cfg = blp.ModelConfig(
        model="blp", rel_model="transe", dim=D, num_relations=3,
        encoder=bert.BertConfig(vocab_size=V, hidden_size=16, num_layers=2,
                                num_heads=4, intermediate_size=24,
                                max_position_embeddings=16))
    with torch.no_grad():
        th = lin(hf_model(torch.from_numpy(tok_h),
                          torch.from_numpy(mask)).last_hidden_state[:, 0])
        tt = lin(hf_model(torch.from_numpy(tok_t),
                          torch.from_numpy(mask)).last_hidden_state[:, 0])
    np.testing.assert_allclose(jax_scores(p, cfg), torch_transe(th, tt),
                               rtol=1e-4, atol=1e-4)

    # ---- transductive (entity-table lookup) ------------------------------
    ent_w = torch.randn(10, D)
    sd = {"module.rel_emb.weight": rel_w, "module.ent_emb.weight": ent_w}
    p = jax.tree.map(jnp.asarray, convert_state_dict(sd, "transductive"))
    cfg = blp.ModelConfig(model="transductive", rel_model="transe", dim=D,
                          num_relations=3, num_entities=10)
    pairs = rng.integers(0, 10, (B, 2))
    h = blp.encode_entity_ids(p, cfg, jnp.asarray(pairs[:, 0]))
    t = blp.encode_entity_ids(p, cfg, jnp.asarray(pairs[:, 1]))
    r = jnp.asarray(p["rel_emb"])[jnp.asarray(rels)]
    got = np.asarray(scoring.get_score_fn("transe")(h, t, r))
    with torch.no_grad():
        want = torch_transe(ent_w[torch.from_numpy(pairs[:, 0])],
                            ent_w[torch.from_numpy(pairs[:, 1])])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


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


def test_load_embedding_export_torch_pair(tmp_path):
    """A REFERENCE run's embedding export (ent_emb-{id}.pt + ents-{id}.pt,
    reference train.py:403-405) must feed node_classification / serving via
    load_embedding_export — including the squeeze + tuple-unwrap its own
    loader applies (train.py:410-419)."""
    from blp_tpu.utils import load_embedding_export

    emb = torch.randn(7, 1, 16)          # extra dim: exercised by .squeeze()
    ents = torch.arange(3, 10, dtype=torch.long)
    torch.save((emb, None), tmp_path / "ent_emb-ref42.pt")  # tuple-wrapped
    torch.save(ents, tmp_path / "ents-ref42.pt")

    got_emb, got_ids = load_embedding_export(str(tmp_path), "ref42")
    assert got_emb.shape == (7, 16) and got_emb.dtype == np.float32
    np.testing.assert_allclose(got_emb, emb.squeeze().numpy(), rtol=1e-6)
    np.testing.assert_array_equal(got_ids, np.arange(3, 10))

    # .npz takes precedence when both exist (this framework's own export).
    np.savez(tmp_path / "ent_emb-ref42.npz",
             ent_emb=np.ones((4, 16), np.float32), entities=np.arange(4))
    got_emb, got_ids = load_embedding_export(str(tmp_path), "ref42")
    assert got_emb.shape == (4, 16)

    # A single-entity export must stay 2-D — .squeeze() alone would
    # collapse (1, d) to (d,) and crash shape-indexing consumers.
    torch.save(torch.randn(1, 16), tmp_path / "ent_emb-one.pt")
    torch.save(torch.tensor([5]), tmp_path / "ents-one.pt")
    one_emb, one_ids = load_embedding_export(str(tmp_path), "one")
    assert one_emb.shape == (1, 16) and one_ids.tolist() == [5]

    with pytest.raises(FileNotFoundError):
        load_embedding_export(str(tmp_path), "missing-run")
    # A lone ent_emb .pt without its ents pair is an error, not a guess.
    torch.save(emb, tmp_path / "ent_emb-lonely.pt")
    with pytest.raises(FileNotFoundError):
        load_embedding_export(str(tmp_path), "lonely")


def test_serve_set_candidates_from_export(tmp_path):
    """serve.LinkPredictor accepts a reference torch export directly."""
    from blp_tpu import serve

    emb = torch.randn(9, 8)
    ents = torch.arange(9, dtype=torch.long) * 2
    torch.save(emb, tmp_path / "ent_emb-s1.pt")
    torch.save(ents, tmp_path / "ents-s1.pt")

    cfg = blp.ModelConfig(model="transductive", rel_model="transe", dim=8,
                          num_relations=2, num_entities=9)
    params = blp.init_params(jax.random.key(0), cfg)
    srv = serve.LinkPredictor(params=params, cfg=cfg, tile=16)
    srv.set_candidates_from_export(str(tmp_path), "s1")
    assert srv._num_valid == 9
    scores, pred = srv.predict_tails(head_emb=emb.numpy()[:2],
                                     rels=[0, 1], k=3)
    assert pred.shape == (2, 3)
    assert set(pred.ravel()) <= set((np.arange(9) * 2).tolist())

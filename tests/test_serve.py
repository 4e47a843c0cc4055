"""Serving path: streaming tiled top-k parity vs brute force, and the
LinkPredictor query API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blp_tpu import serve
from blp_tpu.models import blp, scoring
from blp_tpu.ops import ranking


@pytest.mark.parametrize("rel_model", ["transe", "distmult", "complex", "simple"])
@pytest.mark.parametrize("corrupt", ["head", "tail"])
def test_tiled_top_k_matches_bruteforce(rel_model, corrupt):
    rng = np.random.default_rng(0)
    N, d, B, k, tile = 50, 8, 6, 5, 16
    n_pad = 64
    table = np.zeros((n_pad, d), np.float32)
    table[:N] = rng.standard_normal((N, d)).astype(np.float32)
    fixed = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

    scores, ids = ranking.tiled_top_k(
        jnp.asarray(table), fixed, rel, jnp.asarray(N, jnp.int32),
        k=k, rel_model=rel_model, corrupt=corrupt, tile=tile)
    scores, ids = np.asarray(scores), np.asarray(ids)

    # Brute force with the same scorer.
    score = scoring.get_score_fn(rel_model)
    cand = jnp.asarray(table[:N])
    if corrupt == "head":
        full = score(cand[None, :, :], fixed[:, None, :], rel[:, None, :])
    else:
        full = score(fixed[:, None, :], cand[None, :, :], rel[:, None, :])
    full = np.asarray(full)  # (B, N)
    want_ids = np.argsort(-full, axis=1)[:, :k]
    want_scores = np.take_along_axis(full, want_ids, axis=1)

    np.testing.assert_allclose(scores, want_scores, rtol=1e-5, atol=1e-5)
    # ids may differ on exact float ties; continuous random scores don't tie.
    np.testing.assert_array_equal(ids, want_ids)
    # sorted descending, all within the valid range
    assert (np.diff(scores, axis=1) <= 1e-7).all()
    assert (ids >= 0).all() and (ids < N).all()


def test_link_predictor_end_to_end():
    cfg = blp.ModelConfig(model="transductive", rel_model="distmult",
                          loss_fn="margin", dim=16, num_relations=4,
                          num_entities=30)
    params = blp.init_params(jax.random.key(0), cfg)
    srv = serve.LinkPredictor(params=params, cfg=cfg, tile=16)

    ids = np.arange(100, 130)  # external ids distinct from columns
    table = np.asarray(params["ent_emb"])
    srv.set_candidates(table, ids)

    q_emb = table[[3, 7]]
    scores, ents = srv.predict_tails(head_emb=q_emb, rels=[1, 2], k=4)
    assert scores.shape == (2, 4) and ents.shape == (2, 4)
    assert set(ents.ravel()) <= set(ids.tolist())

    # Parity with direct scoring for the first query.
    rel = np.asarray(params["rel_emb"])[1]
    full = np.asarray(scoring.get_score_fn("distmult")(
        jnp.asarray(q_emb[0])[None, :], jnp.asarray(table),
        jnp.asarray(rel)[None, :]))
    best = ids[np.argsort(-full)[:4]]
    np.testing.assert_array_equal(ents[0], best)

    scores_h, ents_h = srv.predict_heads(tail_emb=q_emb, rels=[0, 3], k=4)
    assert ents_h.shape == (2, 4)


def test_link_predictor_requires_table():
    cfg = blp.ModelConfig(model="transductive", rel_model="transe",
                          loss_fn="margin", dim=8, num_relations=2,
                          num_entities=5)
    params = blp.init_params(jax.random.key(0), cfg)
    srv = serve.LinkPredictor(params=params, cfg=cfg)
    with pytest.raises(ValueError):
        srv.predict_tails(head_emb=np.zeros((1, 8), np.float32), rels=[0])
    with pytest.raises(ValueError):
        srv.embed_texts(["no tokenizer installed"])


def test_serve_cli_main(tmp_path, capsys):
    """End-to-end CLI: train-free — random-init bert-bow checkpoint over a
    synthetic dataset, query the test split."""
    import os

    from blp_tpu import checkpoint as ckpt
    from blp_tpu import train as train_mod
    from blp_tpu.config import ExperimentConfig
    from blp_tpu.data.synth import write_synth_dataset

    data_dir = tmp_path / "data"
    write_synth_dataset(str(data_dir / "srv"), num_entities=40,
                        num_relations=4, num_triples=200, seed=3)
    cfg = ExperimentConfig(dataset="srv", data_dir=str(data_dir),
                           model="bert-bow", encoder_name="tiny",
                           rel_model="distmult", dim=16, max_len=16,
                           emb_batch_size=16, tile=16)
    tokenizer = train_mod.make_tokenizer(cfg)
    mcfg = train_mod.make_model_config(cfg, tokenizer, 4, 40)
    params = blp.init_params(jax.random.key(0), mcfg)
    ck = tmp_path / "model.npz"
    ckpt.save_pytree(str(ck), params, metadata={})

    os.chdir(tmp_path)  # maps.json written next to dataset
    serve.main([f"dataset=srv", f"data_dir={data_dir}", "model=bert-bow",
                "encoder_name=tiny", "rel_model=distmult", "dim=16",
                "max_len=16", "emb_batch_size=16", "tile=16",
                f"checkpoint={ck}"])
    out = capsys.readouterr().out
    assert "-> [" in out and "true=" in out


def test_tiled_top_k_approx_mode_small_table():
    """approx=True must return the same result on a single small tile (the
    CPU backend's approx_max_k is exact; on TPU recall is ~0.95 per tile)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from blp_tpu.ops import ranking

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
    fixed = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    nv = jnp.asarray(200, jnp.int32)
    se, ie = ranking.tiled_top_k(table, fixed, rel, nv, k=5,
                                 rel_model="transe", corrupt="tail", tile=128)
    sa, ia = ranking.tiled_top_k(table, fixed, rel, nv, k=5,
                                 rel_model="transe", corrupt="tail", tile=128,
                                 approx=True)
    np.testing.assert_allclose(np.asarray(se), np.asarray(sa), rtol=1e-6)
    assert (np.asarray(ie) == np.asarray(ia)).all()


@pytest.mark.parametrize("rel_model", ["transe", "distmult"])
@pytest.mark.parametrize("corrupt", ["head", "tail"])
def test_dense_top_k_matches_tiled(rel_model, corrupt):
    """The small-batch dense top-k fast path (one score pass + one
    selection) must return exactly the tiled scan's results."""
    rng = np.random.default_rng(3)
    N, d, B, k = 50, 8, 6, 5
    n_pad = 64
    table = np.zeros((n_pad, d), np.float32)
    table[:N] = rng.standard_normal((N, d)).astype(np.float32)
    fixed = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    nv = jnp.asarray(N, jnp.int32)

    ts, ti = ranking.tiled_top_k(jnp.asarray(table), fixed, rel, nv, k=k,
                                 rel_model=rel_model, corrupt=corrupt, tile=16)
    ds, di = ranking.dense_top_k(jnp.asarray(table), fixed, rel, nv, k=k,
                                 rel_model=rel_model, corrupt=corrupt)
    np.testing.assert_array_equal(np.asarray(di), np.asarray(ti))
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ts), rtol=1e-6)


def test_serve_loop_daemon_batching_and_errors():
    """The stdin-JSONL daemon: batched mixed requests (entity-name lookups,
    ad-hoc text encodes, head/tail ops, bad requests) produce per-request
    responses matching direct predict calls; malformed requests fail in
    isolation."""
    import json
    import queue

    from blp_tpu.models import bert

    ents = [f"E{i}" for i in range(20)]
    rels = {"likes": 0, "knows": 1}
    ent_ids = {e: i for i, e in enumerate(ents)}
    cfg = blp.ModelConfig(model="blp", rel_model="transe", loss_fn="margin",
                          dim=8, num_relations=2,
                          encoder=bert.BertConfig.tiny(num_heads=4))
    params = blp.init_params(jax.random.key(0), cfg)

    class Tok:
        def batch_encode(self, texts, max_len):
            rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**31)
            tok = rng.integers(1, 100, (len(texts), max_len))
            return tok, np.ones((len(texts), max_len), np.float32)

    srv = serve.LinkPredictor(params=params, cfg=cfg, tokenizer=Tok(),
                              max_len=8, tile=16)
    rng = np.random.default_rng(3)
    table = rng.standard_normal((20, 8)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    srv.set_candidates(table, np.arange(20))

    reqs = [
        {"id": 1, "op": "tails", "rel": "likes", "head": "E3", "k": 4},
        {"id": 2, "op": "tails", "rel": 1, "head": "E7", "k": 4},
        {"id": 3, "op": "heads", "rel": "knows", "tail": "E0", "k": 3},
        {"id": 4, "op": "tails", "rel": "likes", "head_text": "a thing", "k": 4},
        {"id": 5, "op": "tails", "rel": "nope", "head": "E1"},       # bad rel
        {"id": 6, "op": "tails", "rel": 0, "head": "Zed"},           # bad ent
        {"id": 7, "op": "sideways", "rel": 0, "head": "E1"},         # bad op
        {"id": 8, "rel": 0},                                         # no input
        {"id": 9, "op": "tails", "rel": 999, "head": "E1"},          # rel OOR
    ]
    q: "queue.Queue" = queue.Queue()
    for r in reqs:
        q.put(json.dumps(r))
    q.put("not json at all")
    q.put(None)

    out = []
    stats = serve.serve_loop(srv, q, out.append, ent_ids=ent_ids,
                             rel_ids=rels, max_batch=64, linger_s=0.01)
    resp = {json.loads(o).get("id"): json.loads(o) for o in out}

    assert stats["served"] == 4 and stats["errors"] == 6
    # Requests 1+2 share (op, k, kind) -> one batch group; check vs direct.
    want_s, want_e = srv.predict_tails(head_emb=table[[3, 7]], rels=[0, 1], k=4)
    for rid, row in ((1, 0), (2, 1)):
        assert resp[rid]["entities"] == [f"E{int(e)}" for e in want_e[row]]
        np.testing.assert_allclose(resp[rid]["scores"], want_s[row], atol=1e-4)
    want_s, want_e = srv.predict_heads(tail_emb=table[[0]], rels=[1], k=3)
    assert resp[3]["entities"] == [f"E{int(e)}" for e in want_e[0]]
    assert len(resp[4]["entities"]) == 4 and "error" not in resp[4]
    for rid in (5, 6, 7, 8, 9, None):
        assert "error" in resp[rid], rid
    # Out-of-range int relation must ERROR, not be gather-clamped to the
    # last relation row.
    assert "out of range" in resp[9]["error"]
    # Batching actually grouped: 4 served requests in <=3 top-k passes.
    assert stats["batches"] <= 3

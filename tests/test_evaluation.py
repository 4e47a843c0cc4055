"""End-to-end evaluator parity: streamed tiled rank counts + sparse filtered
corrections vs a dense reference-style evaluator (materialize (B, N) scores,
dense filter masks, score=min-1 trick) built independently in numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blp_tpu import evaluation
from blp_tpu.data.datasets import GraphData, TextGraphData
from blp_tpu.data.filtering import FilterIndex, build_filters
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.data.tokenizers import WordPieceTokenizer
from blp_tpu.models import blp, scoring
from blp_tpu.utils import make_ent2idx


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = write_synth_dataset(str(tmp_path_factory.mktemp("synth")),
                            num_entities=48, num_relations=4,
                            num_triples=220, seed=3)
    tok = WordPieceTokenizer(f"{d}/vocab.txt")
    train = TextGraphData.load(f"{d}/ind-train.tsv", tokenizer=tok,
                               max_len=16, write_maps=True)
    dev = GraphData.load(f"{d}/ind-dev.tsv")
    cfg = blp.ModelConfig(model="glove-bow", rel_model="transe", dim=0,
                          num_relations=len(train.rel_ids), emb_dim=16,
                          vocab_size=len(tok.vocab))
    params = blp.init_params(jax.random.key(0), cfg)
    return d, train, dev, cfg, params


def dense_reference_eval(params, cfg, triples, text_data, entities, all_triples):
    """Independent dense implementation of the reference evaluator."""
    ent2idx = make_ent2idx(entities, int(max(entities.max(), triples[:, :2].max())))
    tok, mask = text_data.get_entity_descriptions(entities)
    table = np.asarray(blp.encode(params, cfg, jnp.asarray(tok), jnp.asarray(mask)))
    score = scoring.get_score_fn(cfg.rel_model)

    n = len(entities)
    head_pos = ent2idx[triples[:, 0]]
    tail_pos = ent2idx[triples[:, 1]]
    rel_emb = np.asarray(params["rel_emb"])[triples[:, 2]]

    s_head = np.asarray(score(jnp.asarray(table)[None], jnp.asarray(table[tail_pos])[:, None],
                              jnp.asarray(rel_emb)[:, None]))  # (B, N) candidates as head
    s_tail = np.asarray(score(jnp.asarray(table[head_pos])[:, None], jnp.asarray(table)[None],
                              jnp.asarray(rel_emb)[:, None]))

    pred = np.concatenate([s_head, s_tail])          # (2B, N)
    true_idx = np.concatenate([head_pos, tail_pos])

    # Dense filter masks, reference-style.
    known_t = {}
    known_h = {}
    for h, t, r in all_triples:
        known_t.setdefault((h, r), set()).add(t)
        known_h.setdefault((t, r), set()).add(h)
    filt = np.zeros_like(pred, dtype=bool)
    B = len(triples)
    for i, (h, t, r) in enumerate(triples):
        for h2 in known_h.get((t, r), ()):  # other true heads
            if h2 != h and ent2idx[h2] >= 0:
                filt[i, ent2idx[h2]] = True
        for t2 in known_t.get((h, r), ()):  # other true tails
            if t2 != t and ent2idx[t2] >= 0:
                filt[B + i, ent2idx[t2]] = True

    def metrics_of(scores):
        ts = np.take_along_axis(scores, true_idx[:, None], axis=1)
        best = (scores > ts).sum(1) + 1
        worst = (scores >= ts).sum(1)
        ranks = (best + worst) / 2.0
        return ranks

    raw_ranks = metrics_of(pred)
    pred_f = pred.copy()
    pred_f[filt] = pred.min() - 1.0
    filt_ranks = metrics_of(pred_f)
    return raw_ranks, filt_ranks


@pytest.mark.parametrize("rel_model", ["transe", "distmult", "complex", "simple"])
def test_eval_parity_with_dense_reference(setup, rel_model):
    d, train, dev, cfg0, _ = setup
    emb_dim = 16
    cfg = blp.ModelConfig(model="glove-bow", rel_model=rel_model, dim=0,
                          num_relations=len(train.rel_ids), emb_dim=emb_dim,
                          vocab_size=cfg0.vocab_size)
    params = blp.init_params(jax.random.key(1), cfg)

    test_g = GraphData.load(f"{d}/ind-test.tsv")
    all_triples = np.concatenate([train.triples, dev.triples, test_g.triples])
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    fidx = FilterIndex(all_triples)

    res = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        batch_size=7,  # deliberately not dividing T: exercises padding
        emb_batch_size=16, tile=16,
        filter_index=fidx, rel_categories=train.rel_categories)

    raw_ranks, filt_ranks = dense_reference_eval(
        params, cfg, dev.triples, train, entities, all_triples)

    assert np.isclose(res.mrr, (1.0 / raw_ranks).mean(), atol=1e-6)
    assert np.isclose(res.mrr_filt, (1.0 / filt_ranks).mean(), atol=1e-6)
    for k in (1, 3, 10):
        assert np.isclose(res.hits[k], (raw_ranks <= k).mean(), atol=1e-6)
        assert np.isclose(res.hits_filt[k], (filt_ranks <= k).mean(), atol=1e-6)


def test_new_entity_breakdown(setup):
    d, train, dev, cfg, params = setup
    test_g = GraphData.load(f"{d}/ind-test.tsv")
    all_triples = np.concatenate([train.triples, dev.triples, test_g.triples])
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    new_ents = np.setdiff1d(entities, train.entities)
    fidx = FilterIndex(all_triples)

    res = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        batch_size=8, emb_batch_size=16, tile=16,
        filter_index=fidx, new_entities=new_ents,
        rel_categories=train.rel_categories)

    assert res.mrr_by_position is not None and res.mrr_by_position.shape == (3,)
    assert res.mrr_by_category is not None and res.mrr_by_category.shape == (2, 4)
    assert np.isfinite(res.mrr_by_position).all()

    # The per-category breakdown must surface as scalars (the reference
    # prints pred_head/pred_tail x 4 categories after filtered eval,
    # train.py:228-236) so the driver logs them to the metrics stream.
    scalars = res.scalars("test")
    from blp_tpu.data.datasets import CATEGORY_IDS
    for case_i, case in enumerate(("pred_head", "pred_tail")):
        for cat, cat_id in CATEGORY_IDS.items():
            key = f"test_{case}_{cat}_mrr"
            assert key in scalars
            assert scalars[key] == pytest.approx(
                float(res.mrr_by_category[case_i, cat_id]))

    # Every dev triple touches at least one new entity, so the three position
    # buckets must cover all triples with nonzero MRR somewhere.
    assert res.mrr_by_position.max() > 0


def test_max_num_batches_and_embeddings(setup):
    d, train, dev, cfg, params = setup
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    res = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        batch_size=4, emb_batch_size=16, tile=16,
        max_num_batches=2, return_embeddings=True)
    assert res.ent_emb.shape == (len(entities), cfg.entity_dim)
    # TransE: table rows are unit-norm.
    np.testing.assert_allclose(np.linalg.norm(res.ent_emb, axis=1), 1.0, rtol=1e-5)


def test_build_filters_padding(setup):
    d, train, dev, cfg, params = setup
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    ent2idx = make_ent2idx(entities, int(entities.max()))
    fidx = FilterIndex(train.triples)
    hf, tf = build_filters(dev.triples[:5], fidx, ent2idx)
    assert hf.shape[0] == 5 and tf.shape[0] == 5
    assert hf.shape[1] == tf.shape[1]
    assert ((hf == -1) | (hf >= 0)).all()
    # Fixed pad width is honored.
    hf2, _ = build_filters(dev.triples[:5], fidx, ent2idx, pad_width=32)
    assert hf2.shape[1] == 32


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_eval_fuzz_matches_dense_reference(seed):
    """Fuzz: random (N, B, tile, rel_model) configurations — the streamed
    evaluator must match a dense (B, N) reference computation exactly on raw
    and filtered metrics (transductive table; padding/tie paths exercised by
    non-dividing batch sizes and random filter graphs)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 90))
    d = int(rng.choice([8, 16]))
    b = int(rng.integers(3, 9))
    tile = int(rng.choice([8, 16, 32]))
    rel_model = str(rng.choice(["transe", "distmult", "complex", "simple"]))

    entities = np.sort(rng.choice(200, size=n, replace=False)).astype(np.int32)
    rels = rng.integers(0, 5, size=3 * b).astype(np.int32)
    heads = entities[rng.integers(0, n, 3 * b)]
    tails = entities[rng.integers(0, n, 3 * b)]
    eval_triples = np.stack([heads, tails, rels], axis=1)
    extra = np.stack([entities[rng.integers(0, n, 40)],
                      entities[rng.integers(0, n, 40)],
                      rng.integers(0, 5, 40).astype(np.int32)], axis=1)
    all_triples = np.concatenate([eval_triples, extra])
    fidx = FilterIndex(all_triples)

    cfg = blp.ModelConfig(model="transductive", rel_model=rel_model,
                          loss_fn="margin", dim=d, num_relations=5,
                          num_entities=int(entities.max()) + 1)
    params = blp.init_params(jax.random.key(seed), cfg)

    res = evaluation.eval_link_prediction(
        params, cfg, eval_triples, None, entities,
        batch_size=b, emb_batch_size=16, tile=tile, filter_index=fidx)

    # Dense reference computation.
    ent2idx = make_ent2idx(entities, int(max(entities.max(),
                                             eval_triples[:, :2].max())))
    table = np.asarray(blp.encode_entity_ids(params, cfg, jnp.asarray(entities)))
    score = scoring.get_score_fn(rel_model)
    head_pos = ent2idx[eval_triples[:, 0]]
    tail_pos = ent2idx[eval_triples[:, 1]]
    rel_emb = np.asarray(params["rel_emb"])[eval_triples[:, 2]]
    s_head = np.asarray(score(jnp.asarray(table)[None],
                              jnp.asarray(table[tail_pos])[:, None],
                              jnp.asarray(rel_emb)[:, None]))
    s_tail = np.asarray(score(jnp.asarray(table[head_pos])[:, None],
                              jnp.asarray(table)[None],
                              jnp.asarray(rel_emb)[:, None]))
    pred = np.concatenate([s_head, s_tail])
    true_idx = np.concatenate([head_pos, tail_pos])

    filt = np.zeros_like(pred, dtype=bool)
    B = len(eval_triples)
    for i, (h, t, r) in enumerate(eval_triples):
        for h2 in fidx.true_heads(int(t), int(r)):
            if h2 != h and ent2idx[h2] >= 0:
                filt[i, ent2idx[h2]] = True
        for t2 in fidx.true_tails(int(h), int(r)):
            if t2 != t and ent2idx[t2] >= 0:
                filt[B + i, ent2idx[t2]] = True

    def ranks_of(scores):
        ts = np.take_along_axis(scores, true_idx[:, None], axis=1)
        return ((scores > ts).sum(1) + 1 + (scores >= ts).sum(1)) / 2.0

    raw_ranks = ranks_of(pred)
    pred_f = pred.copy()
    pred_f[filt] = pred.min() - 1.0
    filt_ranks = ranks_of(pred_f)

    assert np.isclose(res.mrr, (1.0 / raw_ranks).mean(), atol=1e-6)
    assert np.isclose(res.mrr_filt, (1.0 / filt_ranks).mean(), atol=1e-6)
    for k in (1, 3, 10):
        assert np.isclose(res.hits[k], (raw_ranks <= k).mean(), atol=1e-6)
        assert np.isclose(res.hits_filt[k], (filt_ranks <= k).mean(), atol=1e-6)


def test_precomputed_table_padded_for_larger_tile(setup):
    """A caller table padded for a LARGER tile than the clamped one must be
    accepted (pad up to a pad_unit multiple, never a negative pad) and give
    identical metrics to the self-built path."""
    d, train, dev, cfg, params = setup
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    base = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        batch_size=4, emb_batch_size=16, tile=16, return_embeddings=True)
    # Pad the exported table far beyond the clamped tile's n_pad.
    big = np.pad(base.ent_emb, ((0, 1024 - len(entities) % 1024), (0, 0)))
    res = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities,
        batch_size=4, emb_batch_size=16, tile=16, ent_emb=jnp.asarray(big))
    assert res.mrr == pytest.approx(base.mrr, rel=1e-6)
    assert res.hits == base.hits


@pytest.mark.parametrize("rel_model", ["transe", "distmult", "complex", "simple"])
def test_bidir_counts_match_unidirectional(rel_model):
    """tiled_rank_counts_bidir (one table stream, both directions) must give
    the exact counts of two independent tiled_rank_counts passes."""
    from blp_tpu.ops import ranking

    rng = np.random.default_rng(3)
    n, d, b, tile = 64, 8, 5, 16
    table = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    num_valid = jnp.int32(n - 7)
    head_pos = jnp.asarray(rng.integers(0, n - 7, b), jnp.int32)
    tail_pos = jnp.asarray(rng.integers(0, n - 7, b), jnp.int32)
    rel_emb = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    hf = jnp.asarray(rng.integers(-1, n - 7, (b, 3)), jnp.int32)
    tf = jnp.asarray(rng.integers(-1, n - 7, (b, 3)), jnp.int32)
    head_emb, tail_emb = table[head_pos], table[tail_pos]

    h_true = ranking.score_pairs(head_emb, tail_emb, rel_emb,
                                 rel_model=rel_model, corrupt="head")[:, None]
    t_true = ranking.score_pairs(tail_emb, head_emb, rel_emb,
                                 rel_model=rel_model, corrupt="tail")[:, None]
    fused = ranking.tiled_rank_counts_bidir(
        table, head_emb, tail_emb, rel_emb, h_true, t_true,
        head_pos, tail_pos, hf, tf, num_valid, rel_model=rel_model, tile=tile)
    h = ranking.tiled_rank_counts(table, tail_emb, rel_emb, h_true, head_pos,
                                  hf, num_valid, rel_model=rel_model,
                                  corrupt="head", tile=tile)
    t = ranking.tiled_rank_counts(table, head_emb, rel_emb, t_true, tail_pos,
                                  tf, num_valid, rel_model=rel_model,
                                  corrupt="tail", tile=tile)
    for k in ("gt", "geq", "fgt", "fgeq"):
        np.testing.assert_array_equal(fused[f"h_{k}"], h[k])
        np.testing.assert_array_equal(fused[f"t_{k}"], t[k])


def test_pallas_eval_matches_xla_eval(setup):
    """The full evaluator with the Pallas TransE path (use_pallas=True,
    gate-eligible tile) must agree with the XLA stream — regression for the
    zero-d-grid bug where an unpadded table_t silently skipped the kernel
    and returned uninitialized counts (caught on hardware, round 3)."""
    d, train, dev, cfg0, _ = setup
    cfg = blp.ModelConfig(model="glove-bow", rel_model="transe", dim=0,
                          num_relations=len(train.rel_ids), emb_dim=16,
                          vocab_size=cfg0.vocab_size)
    params = blp.init_params(jax.random.key(1), cfg)
    test_g = GraphData.load(f"{d}/ind-test.tsv")
    all_triples = np.concatenate([train.triples, dev.triples, test_g.triples])
    entities = np.unique(np.concatenate([train.entities, dev.entities]))
    fidx = FilterIndex(all_triples)

    # tile=256 > n rounds the pad unit to a 128-multiple: the gate accepts.
    kw = dict(batch_size=7, emb_batch_size=16, tile=256, filter_index=fidx)
    xla = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities, use_pallas=False, **kw)
    pal = evaluation.eval_link_prediction(
        params, cfg, dev.triples, train, entities, use_pallas=True, **kw)
    assert np.isclose(pal.mrr, xla.mrr, atol=1e-6)
    assert np.isclose(pal.mrr_filt, xla.mrr_filt, atol=1e-6)
    assert pal.hits == xla.hits

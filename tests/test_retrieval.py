"""IR reranking pipeline: NDCG correctness and the end-to-end fold sweep on a
synthetic DBpedia-Entity-style dataset."""

import json

import numpy as np
import pytest

from blp_tpu.retrieval import (RetrievalConfig, dcg, mean_ndcg, ndcg_at_k,
                               rerank)


def test_ndcg_hand_computed():
    qrel = {"a": 3, "b": 2, "c": 0, "d": 1}
    # Ranking by score: a > c > b  (d missing from run)
    run = {"a": 0.9, "c": 0.5, "b": 0.4}
    got = ndcg_at_k(run, qrel, 10)
    num = 3 / np.log2(2) + 0 / np.log2(3) + 2 / np.log2(4)
    ideal = 3 / np.log2(2) + 2 / np.log2(3) + 1 / np.log2(4)
    assert np.isclose(got, num / ideal)


def test_ndcg_perfect_and_empty():
    qrel = {"a": 2, "b": 1}
    assert np.isclose(ndcg_at_k({"a": 1.0, "b": 0.5}, qrel, 10), 1.0)
    assert ndcg_at_k({"a": 1.0}, {}, 10) == 0.0  # no relevant docs
    assert np.isclose(mean_ndcg({"q": {"a": 1.0, "b": 0.5}}, {"q": qrel}, 10), 1.0)


def test_ndcg_cutoff():
    qrel = {"a": 1, "b": 1}
    run = {"x": 0.9, "y": 0.8, "a": 0.7, "b": 0.6}
    assert ndcg_at_k(run, qrel, 2) == 0.0  # both relevant below the cutoff


@pytest.fixture(scope="module")
def ir_data(tmp_path_factory):
    """Synthetic retrieval setup: 20 entities with descriptions, 6 queries,
    2 folds, a noisy baseline run."""
    root = tmp_path_factory.mktemp("ir")
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (root / "vocab.txt").write_text("\n".join(vocab) + "\n")

    ents = [f"<dbpedia:E{i}>" for i in range(20)]
    with open(root / "descriptions.txt", "w") as f:
        for i, e in enumerate(ents):
            desc = " ".join(rng.choice(words, size=6))
            f.write(f"{e}\t{desc}\n")

    qids = [f"Q{i}" for i in range(6)]
    with open(root / "queries.txt", "w") as f:
        for q in qids:
            f.write(f"{q}\t{' '.join(rng.choice(words, size=3))}\n")

    with open(root / "baseline.run", "w") as f:
        for q in qids:
            order = rng.permutation(20)[:10]
            for rank, ei in enumerate(order):
                f.write(f"{q} Q0 {ents[ei]} {rank + 1} {20 - rank:.1f} bm25\n")

    with open(root / "qrels.txt", "w") as f:
        for q in qids:
            rel = rng.permutation(20)[:3]
            for ei in rel:
                f.write(f"{q} 0 {ents[ei]} {int(rng.integers(1, 3))}\n")

    folds = {"0": {"training": qids[:3], "testing": qids[3:]},
             "1": {"training": qids[3:], "testing": qids[:3]}}
    (root / "folds.json").write_text(json.dumps(folds))
    return root


def test_rerank_end_to_end(ir_data):
    cfg = RetrievalConfig(
        model="blp", rel_model="transe", dim=16, max_len=8, emb_batch_size=8,
        encoder_name="tiny", checkpoint=str(ir_data / "nonexistent.npz"),
        run_file=str(ir_data / "baseline.run"),
        queries_file=str(ir_data / "queries.txt"),
        descriptions_file=str(ir_data / "descriptions.txt"),
        qrels_file=str(ir_data / "qrels.txt"),
        folds_file=str(ir_data / "folds.json"),
        vocab_file=str(ir_data / "vocab.txt"),
        out_dir=str(ir_data / "out"), run_id="t", num_alphas=5)
    out = rerank(cfg)
    assert 0.0 <= out["ndcg@10"] <= 1.0
    assert 0.0 <= out["ndcg@100"] <= 1.0
    assert "ndcg@10_pvalue" in out
    # TREC run file format.
    lines = open(out["run_file"]).read().strip().splitlines()
    assert lines and len(lines[0].split()) == 6
    # Alpha=0 must reproduce the baseline exactly, so the swept result can
    # never be (materially) worse than the baseline on the training folds.
    assert out["ndcg@100"] >= 0.0


def test_rerank_alpha_zero_is_baseline(ir_data):
    from blp_tpu.retrieval import rerank_queries
    baseline_run = {"Q0": {"a": 3.0, "b": 2.0, "c": 1.0}}
    out = rerank_queries(["Q0"], baseline_run, {"Q0": np.zeros(4)},
                         {}, np.zeros((1, 4)), alpha=0.0)
    assert out["Q0"] == {"a": 3.0, "b": 2.0, "c": 1.0}


def test_ndcg_cross_check_vs_sklearn():
    """Independent cross-check of the home-grown trec_eval-style NDCG
    against sklearn.metrics.ndcg_score (same convention: linear gains,
    1/log2(rank+1) discount, IDCG over all judged docs). pytrec_eval is
    unavailable offline; sklearn is an independently-authored oracle."""
    from sklearn.metrics import ndcg_score

    rng = np.random.default_rng(0)
    docs = [f"d{i}" for i in range(30)]
    for trial in range(20):
        k = int(rng.integers(1, 15))
        rel = rng.integers(0, 4, len(docs))
        if rel.sum() == 0:
            rel[0] = 1
        scores = rng.standard_normal(len(docs))
        run = {d: float(s) for d, s in zip(docs, scores)}
        qrel = {d: int(r) for d, r in zip(docs, rel) if r > 0}
        got = ndcg_at_k(run, qrel, k)
        want = ndcg_score(rel[None, :], scores[None, :], k=k)
        assert np.isclose(got, want, atol=1e-9), (trial, k, got, want)

"""Split-generator / tooling tests: invariants of drop_entities, relation
categorization, GloVe conversion, description harvesting."""

import numpy as np
import pytest

from blp_tpu.data.splits import (MultiGraph, categorize_relations,
                                 drop_entities, get_ranking_descriptions,
                                 get_safely_removed_edges, load_embeddings,
                                 parse_triples)


@pytest.fixture
def graph_file(tmp_path):
    """Dense-ish random graph where entity dropping is feasible."""
    rng = np.random.default_rng(0)
    n, rels = 60, 3
    lines = []
    for i in range(n):  # ring backbone keeps connectivity
        lines.append(f"e{i}\tr{i % rels}\te{(i + 1) % n}")
    for _ in range(500):
        h, t = rng.integers(n, size=2)
        if h != t:
            lines.append(f"e{h}\tr{rng.integers(rels)}\te{t}")
    p = tmp_path / "all-triples.tsv"
    p.write_text("\n".join(lines) + "\n")
    return p


def test_drop_entities_invariants(graph_file):
    train, val, test = drop_entities(str(graph_file), train_size=0.8, seed=1,
                                     min_edges_left=10)
    assert train and val and test
    assert not (train & val) and not (train & test) and not (val & test)

    d = graph_file.parent
    train_triples, _ = parse_triples(d / "ind-train.tsv")
    dev_triples, _ = parse_triples(d / "ind-dev.tsv")
    test_triples, _ = parse_triples(d / "ind-test.tsv")

    train_nodes = {x for h, t, _ in train_triples for x in (h, t)}
    assert train_nodes == train  # no orphaned training entities
    # Dev triples never touch test entities (first-slice rule).
    dev_nodes = {x for h, t, _ in dev_triples for x in (h, t)}
    assert not (dev_nodes & test)
    # Every dev/test triple touches its split's entity set.
    for h, t, _ in dev_triples:
        assert h in val or t in val
    for h, t, _ in test_triples:
        assert h in test or t in test
    # Edge conservation.
    all_triples, _ = parse_triples(graph_file)
    assert len(train_triples) + len(dev_triples) + len(test_triples) == len(all_triples)


def test_drop_entities_min_edges_respected(graph_file):
    drop_entities(str(graph_file), train_size=0.8, seed=2, min_edges_left=50)
    train_triples, rel_counts = parse_triples(graph_file.parent / "ind-train.tsv")
    assert min(rel_counts.values()) >= 49  # can dip at most 1 below on last removal


def test_safely_removed_edges_none_when_orphaning(tmp_path):
    # e1 - e2 - e3 chain: removing e2 orphans both neighbors.
    triples = [("e1", "e2", "r0"), ("e2", "e3", "r0")]
    g = MultiGraph(triples)
    from collections import Counter
    assert get_safely_removed_edges(g, "e2", Counter(r0=2), 1) is None


def test_categorize_relations(tmp_path):
    lines = []
    # r0: each head has many tails -> 1-to-many; r1: strictly 1-to-1 pairs.
    for i in range(10):
        for j in range(3):
            lines.append(f"h{i}\tr0\tt{i}_{j}")
        lines.append(f"a{i}\tr1\tb{i}")
    p = tmp_path / "train.tsv"
    p.write_text("\n".join(lines) + "\n")
    cats = categorize_relations(str(p))
    assert cats["r0"] == "1-to-many"
    assert cats["r1"] == "1-to-1"
    assert (tmp_path / "relations-cat.txt").exists()


def test_load_embeddings_roundtrip(tmp_path):
    import torch
    p = tmp_path / "glove.txt"
    p.write_text("cat 1.0 2.0 3.0\ndog 4.0 5.0 6.0\n")
    load_embeddings(str(p))
    mat = torch.load(tmp_path / "glove.pt", weights_only=False)
    maps = torch.load(tmp_path / "glove-maps.pt", weights_only=False)
    assert mat.shape == (3, 3)  # +[UNK] mean row
    np.testing.assert_allclose(mat[2].numpy(), [2.5, 3.5, 4.5])
    assert maps == {"cat": 0, "dog": 1, "[UNK]": 2}


def test_get_ranking_descriptions(tmp_path):
    run = tmp_path / "test.run"
    run.write_text("Q1 Q0 <dbpedia:Cat> 1 1.0 x\nQ1 Q0 <dbpedia:Dog> 2 0.9 x\n")
    dump = tmp_path / "dump.nt"
    dump.write_text(
        '<http://dbpedia.org/resource/Cat> '
        '<http://www.w3.org/2000/01/rdf-schema#comment> '
        '"The cat is a small animal."@en .\n'
        '<http://dbpedia.org/resource/Bird> '
        '<http://www.w3.org/2000/01/rdf-schema#comment> "A bird."@en .\n')
    get_ranking_descriptions(str(run), str(dump))
    desc = (tmp_path / "test-descriptions.txt").read_text()
    assert "<dbpedia:Cat>\tThe cat is a small animal." in desc
    missing = (tmp_path / "test-missing.txt").read_text()
    assert "<dbpedia:Dog>" in missing

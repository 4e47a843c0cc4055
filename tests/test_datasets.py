"""Data layer: synthetic dataset round-trip, id-map stability, text packing,
and fixed-shape batch iteration."""

import numpy as np
import pytest

from blp_tpu.data.datasets import CATEGORY_IDS, GraphData, TextGraphData, load_maps
from blp_tpu.data.loader import epoch_batches, num_batches, text_train_batch
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.data.tokenizers import WordPieceTokenizer


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return write_synth_dataset(str(d), num_entities=40, num_relations=4,
                               num_triples=150, seed=7)


def test_maps_follow_line_order(dataset_dir):
    ent_ids, rel_ids = load_maps(dataset_dir, write=True)
    with open(f"{dataset_dir}/entities.txt") as f:
        for i, line in enumerate(f):
            assert ent_ids[line.strip()] == i
    assert len(rel_ids) == 4


def test_graph_data_load(dataset_dir):
    g = GraphData.load(f"{dataset_dir}/train.tsv", write_maps=True)
    assert g.triples.shape[1] == 3
    assert g.triples.dtype == np.int32
    # [head, tail, rel] ordering: column 2 must hold relation ids < num rels.
    assert g.triples[:, 2].max() < len(g.rel_ids)
    assert g.num_ents == len(g.entities)
    assert g.has_rel_categories
    assert set(np.unique(g.rel_categories)) <= set(CATEGORY_IDS.values())


def test_four_column_negative_rows_skipped(tmp_path, dataset_dir):
    import shutil
    d = tmp_path / "fb13ish"
    shutil.copytree(dataset_dir, d)
    with open(f"{dataset_dir}/train.tsv") as f:
        lines = f.readlines()
    h, r, t = lines[0].split()
    with open(d / "train.tsv", "w") as f:
        f.writelines(lines)
        f.write(f"{h}\t{r}\t{t}\t-1\n")
        f.write(f"{h}\t{r}\t{t}\t1\n")
    g_orig = GraphData.load(f"{dataset_dir}/train.tsv", write_maps=True)
    g = GraphData.load(str(d / "train.tsv"), write_maps=True)
    assert g.num_triples == g_orig.num_triples + 1  # only the '1' row kept


def test_text_graph_data(dataset_dir):
    tok = WordPieceTokenizer(f"{dataset_dir}/vocab.txt")
    t = TextGraphData.load(f"{dataset_dir}/ind-train.tsv", tokenizer=tok,
                           max_len=16, write_maps=True)
    assert t.text_data.shape == (40, 17)
    lengths = t.text_data[:, -1]
    assert lengths.min() >= 1 and lengths.max() <= 16
    # Every row starts with [CLS].
    assert (t.text_data[:, 0] == tok.cls_id).all()

    tok_b, mask = t.get_entity_descriptions(np.array([0, 5, 7]))
    assert tok_b.shape == (3, 16) and mask.shape == (3, 16)
    assert (mask.sum(-1) == np.minimum(lengths[[0, 5, 7]], 16)).all()


def test_text_cache_roundtrip(dataset_dir):
    tok = WordPieceTokenizer(f"{dataset_dir}/vocab.txt")
    a = TextGraphData.load(f"{dataset_dir}/ind-train.tsv", tokenizer=tok,
                           max_len=16, write_maps=True)
    b = TextGraphData.load(f"{dataset_dir}/ind-train.tsv", tokenizer=tok,
                           max_len=16, write_maps=True)  # hits .npz cache
    np.testing.assert_array_equal(a.text_data, b.text_data)


def test_missing_description_raises(tmp_path, dataset_dir):
    import shutil
    d = tmp_path / "broken"
    shutil.copytree(dataset_dir, d)
    for cache in d.glob("text_*.npz"):  # drop caches copied from the fixture
        cache.unlink()
    with open(d / "entity2text.txt") as f:
        lines = f.readlines()
    (d / "entity2text.txt").write_text("".join(lines[:-1]))  # drop one entity
    tok = WordPieceTokenizer(str(d / "vocab.txt"))
    with pytest.raises(ValueError, match="expected"):
        TextGraphData.load(str(d / "ind-train.tsv"), tokenizer=tok,
                           max_len=16, write_maps=True)


def test_epoch_batches_fixed_shapes(dataset_dir):
    tok = WordPieceTokenizer(f"{dataset_dir}/vocab.txt")
    t = TextGraphData.load(f"{dataset_dir}/ind-train.tsv", tokenizer=tok,
                           max_len=16, write_maps=True)
    bs = 16
    batches = list(epoch_batches(t, bs, rng=np.random.default_rng(0)))
    assert len(batches) == num_batches(t, bs)
    assert all(b.shape == (bs, 3) for b in batches)

    batch = text_train_batch(t, batches[0])
    assert batch["text_tok"].shape == (bs, 2, 16)
    assert batch["text_mask"].shape == (bs, 2, 16)
    assert batch["rels"].shape == (bs,)

    # Shuffling is seeded/deterministic.
    again = list(epoch_batches(t, bs, rng=np.random.default_rng(0)))
    np.testing.assert_array_equal(batches[0], again[0])


def test_inductive_split_disjointness(dataset_dir):
    train = GraphData.load(f"{dataset_dir}/ind-train.tsv", write_maps=True)
    test = GraphData.load(f"{dataset_dir}/ind-test.tsv")
    with open(f"{dataset_dir}/test-ents.txt") as f:
        test_ents = {train.ent_ids[l.strip()] for l in f}
    # No test entity appears in the inductive training graph.
    assert not (set(train.entities.tolist()) & test_ents)
    # Every test triple touches at least one test entity.
    touched = (np.isin(test.triples[:, 0], list(test_ents))
               | np.isin(test.triples[:, 1], list(test_ents)))
    assert touched.all()

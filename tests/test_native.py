"""Native C++ packer: parity with the Python data layer on the synthetic
dataset, plus edge cases (4-column rows, non-ASCII fallback)."""

import numpy as np
import pytest

from blp_tpu import native
from blp_tpu.data.datasets import GraphData, TextGraphData
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.data.tokenizers import WordPieceTokenizer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native packer unavailable (no g++)")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    return write_synth_dataset(str(tmp_path_factory.mktemp("native")),
                               num_entities=50, num_relations=4,
                               num_triples=200, seed=5)


def test_pack_triples_parity(dataset_dir):
    got = native.pack_triples(f"{dataset_dir}/train.tsv",
                              f"{dataset_dir}/entities.txt",
                              f"{dataset_dir}/relations.txt")
    want = GraphData.load(f"{dataset_dir}/train.tsv", write_maps=True).triples
    np.testing.assert_array_equal(got, want)


def test_pack_triples_skips_neg_rows(tmp_path, dataset_dir):
    import shutil
    d = tmp_path / "neg"
    shutil.copytree(dataset_dir, d)
    with open(f"{dataset_dir}/train.tsv") as f:
        lines = f.readlines()
    h, r, t = lines[0].split()
    with open(d / "train.tsv", "a") as f:
        f.write(f"{h}\t{r}\t{t}\t-1\n{h}\t{r}\t{t}\t1\n")
    got = native.pack_triples(str(d / "train.tsv"), str(d / "entities.txt"),
                              str(d / "relations.txt"))
    want = native.pack_triples(f"{dataset_dir}/train.tsv",
                               f"{dataset_dir}/entities.txt",
                               f"{dataset_dir}/relations.txt")
    assert len(got) == len(want) + 1  # only the '1' row added


def test_wordpiece_encode_parity(dataset_dir):
    tok = WordPieceTokenizer(f"{dataset_dir}/vocab.txt")
    # Python ground truth.
    py = TextGraphData.load(f"{dataset_dir}/ind-train.tsv", tokenizer=tok,
                            max_len=16, write_maps=True)
    # Native.
    text_data = np.zeros_like(py.text_data)
    needs_py = native.wordpiece_encode_file(
        f"{dataset_dir}/entity2text.txt", f"{dataset_dir}/entities.txt",
        f"{dataset_dir}/vocab.txt", max_len=16, do_lower=False,
        text_data=text_data)
    assert needs_py is not None
    assert not needs_py.any()  # synth data is pure ASCII
    np.testing.assert_array_equal(text_data, py.text_data)


def test_wordpiece_nonascii_defers_to_python(tmp_path, dataset_dir):
    import shutil
    d = tmp_path / "uni"
    shutil.copytree(dataset_dir, d)
    with open(d / "entity2text.txt") as f:
        lines = f.readlines()
    ent0 = lines[0].split("\t")[0]
    lines[0] = f"{ent0}\tcafé déjà vu\n"
    (d / "entity2text.txt").write_text("".join(lines))
    text_data = np.zeros((50, 17), np.int32)
    needs_py = native.wordpiece_encode_file(
        str(d / "entity2text.txt"), str(d / "entities.txt"),
        str(d / "vocab.txt"), max_len=16, do_lower=False, text_data=text_data)
    assert needs_py.sum() == 1
    assert text_data[needs_py][0, -1] == 0  # row left for Python
    assert (text_data[~needs_py][:, -1] > 0).all()

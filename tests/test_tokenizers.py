"""WordPiece tokenizer parity against transformers.BertTokenizer built from
the same local vocab (no network)."""

import numpy as np
import pytest

from blp_tpu.data import text as text_mod
from blp_tpu.data.tokenizers import GloVeTokenizer, WordPieceTokenizer

transformers = pytest.importorskip("transformers")

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "cat", "sat", "on", "mat", "dog", "run", "##ning", "##s",
    "un", "##believ", "##able", "hello", "world", ",", ".", "!", "?", "-",
    "7", "##7", "a", "b", "C", "##at",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tokenizers(vocab_file):
    ours = WordPieceTokenizer(vocab_file, do_lower_case=False)
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=False)
    return ours, hf


TEXTS = [
    "the cat sat on the mat.",
    "dog running, runs!",
    "unbelievable hello world",
    "hello-world? C Cat 77",
    "the the the the the the the the the the the the",
    "unknownword hello",
    "",
]


@pytest.mark.parametrize("text", TEXTS)
def test_tokenize_parity(tokenizers, text):
    ours, hf = tokenizers
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("max_length", [4, 8, 64])
def test_encode_parity(tokenizers, text, max_length):
    ours, hf = tokenizers
    want = hf.encode(text, max_length=max_length, truncation=True)
    assert ours.encode(text, max_length=max_length) == want


def test_batch_encode_shapes(tokenizers):
    ours, _ = tokenizers
    ids, mask = ours.batch_encode(["the cat", "hello world dog"], max_length=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == ours.cls_id
    assert mask.dtype == np.float32
    assert (mask == (ids != ours.pad_id)).all()


def test_lowercase_mode(vocab_file):
    ours = WordPieceTokenizer(vocab_file, do_lower_case=True)
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    for t in ["The CAT", "Héllo WORLD", "DOG RunninG"]:
        assert ours.tokenize(t) == hf.tokenize(t)


def test_glove_tokenizer():
    w2i = {"[UNK]": 0, "the": 1, "cat": 2, "sat": 3, ".": 4}
    tok = GloVeTokenizer(w2i)
    assert tok.encode("The cat sat.") == [1, 2, 3, 4]
    assert tok.encode("zebra cat") == [0, 2]
    assert tok.encode("the cat sat.", max_length=2) == [1, 2]
    ids, mask = tok.batch_encode(["the cat", "sat"], max_length=4)
    assert ids.tolist() == [[1, 2, 0, 0], [3, 0, 0, 0]]
    assert mask.tolist() == [[1, 1, 0, 0], [1, 0, 0, 0]]


def test_word_tokenize_basics():
    wt = text_mod.word_tokenize
    assert wt("The cat sat on the mat.") == ["The", "cat", "sat", "on", "the", "mat", "."]
    assert wt("don't stop") == ["do", "n't", "stop"]
    assert wt("it's a test, really!") == ["it", "'s", "a", "test", ",", "really", "!"]
    assert wt("3.14 is pi") == ["3.14", "is", "pi"]
    assert wt("state-of-the-art (really)") == ["state-of-the-art", "(", "really", ")"]


def test_remove_stopwords():
    out = text_mod.remove_stopwords("The cat is on a mat, really.")
    assert out == "cat mat really"

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


# ---------------------------------------------------------------------------
# Fuzz / differential hardening (round 4): the C++ fast path silently feeds
# training — a parser divergence would corrupt data without failing. Generate
# adversarial files and assert native == pure-Python byte-for-byte.
# ---------------------------------------------------------------------------

def _python_parse_triples(monkeypatch, triples_file, directory, ent_ids, rel_ids):
    """The pure-Python parser (native path force-disabled)."""
    monkeypatch.setattr(native, "available", lambda: False)
    try:
        return GraphData._parse_triples(str(triples_file), str(directory),
                                        ent_ids, rel_ids)
    finally:
        monkeypatch.undo()


def test_pack_triples_fuzz_adversarial_files(tmp_path, monkeypatch):
    """CRLF endings, blank lines, missing trailing newline, 4-column rows
    with -1/0/1, >100-char names, empty files: native == Python exactly
    (reference semantics: data.py:117-124)."""
    rng = np.random.default_rng(11)
    long_name = "e" + "x" * 150
    ents = [f"e{i}" for i in range(30)] + [long_name]
    rels = [f"r{i}" for i in range(5)] + ["r" + "y" * 120]
    ent_ids = {e: i for i, e in enumerate(ents)}
    rel_ids = {r: i for i, r in enumerate(rels)}

    for trial in range(25):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        (d / "entities.txt").write_text("\n".join(ents) + "\n")
        (d / "relations.txt").write_text("\n".join(rels) + "\n")
        lines = []
        for _ in range(int(rng.integers(0, 40))):
            kind = rng.integers(0, 10)
            if kind == 0:
                lines.append("")  # blank line
                continue
            h, t = rng.choice(ents, 2)
            r = rels[int(rng.integers(0, len(rels)))]
            row = f"{h}\t{r}\t{t}"
            if kind == 1:
                row += "\t-1"  # skipped negative (FB13/WN11)
            elif kind == 2:
                row += f"\t{int(rng.integers(0, 2))}"  # kept 4th column
            lines.append(row)
        body = "\n".join(lines)
        if rng.integers(0, 2):
            body = body.replace("\n", "\r\n")  # CRLF
        if rng.integers(0, 2) and body:
            body += "\r\n" if "\r\n" in body else "\n"  # trailing newline or not
        (d / "train.tsv").write_text(body)

        got = native.pack_triples(str(d / "train.tsv"),
                                  str(d / "entities.txt"),
                                  str(d / "relations.txt"))
        want = _python_parse_triples(monkeypatch, d / "train.tsv", d,
                                     ent_ids, rel_ids)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_wordpiece_fuzz_adversarial_descriptions(tmp_path, monkeypatch):
    """Random description files — >100-char words (UNK rule), punctuation
    runs, tab-embedded text (joined with spaces like the reference's
    values[1:]), CRLF, empty descriptions, mixed unicode rows — native rows
    must equal the Python tokenizer's rows exactly, and every unicode row
    must be deferred, never half-filled."""
    from blp_tpu.data.synth import write_synth_dataset

    base = write_synth_dataset(str(tmp_path / "base"), num_entities=40,
                               num_relations=3, num_triples=150, seed=7)
    tok = WordPieceTokenizer(f"{base}/vocab.txt")
    with open(f"{base}/vocab.txt") as f:
        vocab_words = [w.strip() for w in f if w.strip() and
                       not w.startswith("[")]
    rng = np.random.default_rng(13)
    with open(f"{base}/entities.txt") as f:
        ents = [l.strip() for l in f if l.strip()]

    max_len = 12
    for trial in range(15):
        d = tmp_path / f"w{trial}"
        d.mkdir()
        import shutil
        shutil.copy(f"{base}/entities.txt", d / "entities.txt")
        shutil.copy(f"{base}/vocab.txt", d / "vocab.txt")
        lines, texts = [], {}
        for e in ents:
            kind = int(rng.integers(0, 8))
            words = list(rng.choice(vocab_words,
                                    size=int(rng.integers(1, 6))))
            if kind == 0:
                words.append("w" * 150)  # >100 chars -> [UNK]
            elif kind == 1:
                words.append("!!,,..??")  # punctuation run
            elif kind == 2:
                words.append("naïve")  # unicode -> python deferral
            elif kind == 3:
                words = words + ["", ""]  # double spaces
            text = " ".join(words)
            if kind == 4:
                # Tabs inside the description: the loader joins values[1:]
                # with a space (reference data.py:231-232 analogue).
                text = text.replace(" ", "\t", 1) if " " in text else text
            texts[e] = text.replace("\t", " ")
            lines.append(f"{e}\t{text}")
        body = "\n".join(lines) + "\n"
        if rng.integers(0, 2):
            body = body.replace("\n", "\r\n")
        (d / "entity2text.txt").write_text(body, encoding="utf-8")

        text_data = np.zeros((len(ents), max_len + 1), np.int32)
        needs_py = native.wordpiece_encode_file(
            str(d / "entity2text.txt"), str(d / "entities.txt"),
            str(d / "vocab.txt"), max_len=max_len, do_lower=False,
            text_data=text_data)
        assert needs_py is not None
        for i, e in enumerate(ents):
            if needs_py[i]:
                assert text_data[i, -1] == 0, f"deferred row {i} half-filled"
                assert "naïve" in texts[e] or any(ord(c) > 127
                                                  for c in texts[e])
                continue
            ids = tok.encode(texts[e], max_length=max_len)
            n = min(len(ids), max_len)
            want = np.zeros(max_len + 1, np.int32)
            want[:n] = ids[:n]
            want[-1] = n
            np.testing.assert_array_equal(
                text_data[i], want, err_msg=f"trial {trial} row {i} ({e!r})")

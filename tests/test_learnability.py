"""Learnability: training must beat the random-ranking baseline by a wide
margin on a structured task, not merely produce MRR > 0.

The typed synthetic task (data/synth.py, num_types>0): descriptions lead
with a type word and relation r only links (head_type_r -> tail_type_r).
An inductive text encoder that reads the type word can rank the ~N/T
type-consistent candidates above the rest; a transductive model can learn
the same structure from the graph alone. Random ranking over N candidates
gives E[MRR] = H(N)/N (~0.05 at N=90), while type-aware ranking yields
roughly H(N/T)/(N/T) (several times larger)."""

import numpy as np
import pytest

from blp_tpu import train as train_mod
from blp_tpu.config import ExperimentConfig
from blp_tpu.data import synth


def _random_mrr(n: int) -> float:
    return float(np.mean(1.0 / np.arange(1, n + 1)))


@pytest.fixture(scope="module")
def typed_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("typed") / "typed-synth"
    synth.write_synth_dataset(
        str(d), num_entities=90, num_relations=6, num_triples=700,
        num_types=5, inductive_frac=0.2, seed=7)
    return d


def test_inductive_text_model_learns(typed_dataset, tmp_path):
    cfg = ExperimentConfig(
        dataset=typed_dataset.name, data_dir=str(typed_dataset.parent),
        out_dir=str(tmp_path / "out"), inductive=True, model="bert-bow",
        encoder_name="tiny", rel_model="distmult", loss_fn="nll", dim=32,
        max_len=16, num_negatives=16, lr=5e-2, use_scheduler=False,
        batch_size=32, emb_batch_size=64, eval_batch_size=32, max_epochs=30,
        tile=64, run_id="learn-ind", seed=0)
    result = train_mod.link_prediction(cfg)

    n_candidates = 90
    baseline = _random_mrr(n_candidates)
    # Ceiling: perfect type-aware ranking leaves ~N/T=18 indistinguishable
    # candidates -> MRR ~ H(18)/18 ~ 0.19; require half the gap to it.
    assert result["test_mrr"] > 2.5 * baseline, (
        f"inductive MRR {result['test_mrr']:.3f} vs random {baseline:.3f}")


@pytest.fixture(scope="module")
def strict_dataset(tmp_path_factory):
    """High-signal task for ABSOLUTE quality thresholds: 2-member types,
    one relation per ordered type pair (distinct head/tail types, so TransE
    has a cycle-free centroid solution), descriptions that are EXACTLY the
    type word. Same-type entities are then bit-identical to a text encoder
    — exact ties, 0.5 rank credit each — so perfect type knowledge yields
    filtered MRR ~1/1.5 = 0.667 and the measured values are stable under
    accumulation-order changes (random baseline ~0.08). Catches
    sign/ordering bugs that 'above random' misses."""
    root = tmp_path_factory.mktemp("strict")
    d = synth.write_synth_dataset(
        str(root / "strict"), num_entities=64, num_relations=64,
        num_triples=220, num_types=32, distinct_type_pairs=True,
        inductive_frac=0.2, desc_words=(0, 0), seed=11)
    glove = synth.write_tiny_glove(str(root / "tiny-glove"),
                                   f"{d}/vocab.txt")
    return root, glove


def test_strict_inductive_glove_bow_transe(strict_dataset, tmp_path):
    root, glove = strict_dataset
    cfg = ExperimentConfig(
        dataset="strict", data_dir=str(root), out_dir=str(tmp_path / "o1"),
        inductive=True, model="glove-bow", rel_model="transe",
        loss_fn="margin", dim=0, glove_file=glove, max_len=8,
        num_negatives=16, lr=5e-2, use_scheduler=False, batch_size=32,
        emb_batch_size=64, eval_batch_size=32, max_epochs=60,
        eval_every=1000, tile=64, run_id="strict-ind", seed=0)
    r = train_mod.link_prediction(cfg)
    # eval_every > max_epochs: the assertion targets the CONVERGED last
    # epoch, not a cherry-picked best epoch (best-epoch selection amplifies
    # ulp-level eval noise into large swings). Measured 0.518 at 60 AND 80
    # epochs, lr 2e-2 AND 5e-2 — a stable fixed point; floor 0.5.
    assert r["test_mrr_filt"] > 0.5, (
        f"strict inductive filtered MRR {r['test_mrr_filt']:.3f} <= 0.5")


def test_strict_transductive_transe(strict_dataset, tmp_path):
    root, _ = strict_dataset
    cfg = ExperimentConfig(
        dataset="strict", data_dir=str(root), out_dir=str(tmp_path / "o2"),
        inductive=False, model="transductive", rel_model="transe",
        loss_fn="margin", dim=32, num_negatives=16, lr=5e-2,
        use_scheduler=False, batch_size=32, emb_batch_size=64,
        eval_batch_size=32, max_epochs=60, eval_every=1000, tile=64,
        run_id="strict-trans", seed=0)
    r = train_mod.link_prediction(cfg)
    # Last-epoch (no best-epoch selection); measured 0.776; floor 0.6.
    assert r["test_mrr_filt"] > 0.6, (
        f"strict transductive filtered MRR {r['test_mrr_filt']:.3f} <= 0.6")


def test_transductive_model_learns(typed_dataset, tmp_path):
    cfg = ExperimentConfig(
        dataset=typed_dataset.name, data_dir=str(typed_dataset.parent),
        out_dir=str(tmp_path / "out"), inductive=False, model="transductive",
        rel_model="distmult", loss_fn="nll", dim=32, num_negatives=16,
        lr=5e-2, use_scheduler=False, batch_size=32, emb_batch_size=64,
        eval_batch_size=32, max_epochs=40, tile=64, run_id="learn-trans",
        seed=0)
    result = train_mod.link_prediction(cfg)

    baseline = _random_mrr(90)
    # Transductive sees only graph structure (no type words), so it learns
    # the type clusters more slowly than the text model; 2x random is still
    # an unambiguous learning signal (untrained models sit at ~1x).
    assert result["test_mrr"] > 2.0 * baseline, (
        f"transductive MRR {result['test_mrr']:.3f} vs random {baseline:.3f}")

"""Driver-level multi-device training: link_prediction under a (data, model)
mesh must match the single-device run's quality trajectory (same seed)."""

import numpy as np
import pytest

from blp_tpu.config import ExperimentConfig
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pe2e")
    write_synth_dataset(str(root / "data" / "synth"), num_entities=36,
                        num_relations=3, num_triples=140, seed=13)
    return root


def _cfg(workdir, **kw):
    base = dict(
        dataset="synth", data_dir=str(workdir / "data"),
        out_dir=str(workdir / "output"), model="blp", rel_model="transe",
        encoder_name="tiny", dim=16, max_len=16, num_negatives=8,
        batch_size=16, emb_batch_size=16, eval_batch_size=8, max_epochs=1,
        lr=1e-3, tile=8, seed=5)
    base.update(kw)
    return ExperimentConfig(**base)


def test_dp_tp_driver_matches_single(workdir):
    r1 = link_prediction(_cfg(workdir, run_id="single"))
    r2 = link_prediction(_cfg(workdir, run_id="dp-tp", num_data_shards=4,
                              num_model_shards=2))
    # Same seed + global-batch semantics: same trajectory up to the float-
    # epsilon layout differences TP introduces in matmul partitioning.
    assert np.isclose(r2["test_mrr"], r1["test_mrr"], rtol=5e-2)
    assert np.isclose(r2["test_mrr_filt"], r1["test_mrr_filt"], rtol=5e-2)


def test_dp_only_driver(workdir):
    r = link_prediction(_cfg(workdir, run_id="dp", model="bert-bow",
                             num_data_shards=8))
    assert r["test_mrr"] > 0

"""End-to-end training driver tests on the synthetic dataset (the analogue of
the reference's scripts/test-umls.sh smoke test)."""

import json
import os

import numpy as np
import pytest

from blp_tpu.checkpoint import load_pytree, save_pytree
from blp_tpu.config import ExperimentConfig, parse_overrides
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction, node_classification


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    write_synth_dataset(str(root / "data" / "synth"), num_entities=40,
                        num_relations=4, num_triples=160, seed=11)
    return root


def _cfg(workdir, **kw):
    base = dict(
        dataset="synth", data_dir=str(workdir / "data"),
        out_dir=str(workdir / "output"), model="bert-bow", rel_model="transe",
        encoder_name="tiny", dim=16, max_len=16, num_negatives=8,
        batch_size=16, emb_batch_size=16, eval_batch_size=8, max_epochs=2,
        lr=1e-3, tile=16, run_id="test", seed=0)
    base.update(kw)
    return ExperimentConfig(**base)


def test_link_prediction_e2e(workdir):
    result = link_prediction(_cfg(workdir))
    assert result["test_mrr"] > 0
    assert result["test_mrr_filt"] >= result["test_mrr"] - 1e-9
    assert os.path.exists(result["checkpoint"])
    assert os.path.exists(workdir / "output" / "ent_emb-test.npz")
    # Metrics stream exists and has scalars.
    lines = [json.loads(l) for l in
             open(workdir / "output" / "metrics-test.jsonl")]
    keys = set().union(*(l.keys() for l in lines))
    assert {"batch_loss", "train_loss", "valid_mrr", "test_mrr_filt"} <= keys


def test_node_classification_after_training(workdir):
    out = node_classification(_cfg(workdir, checkpoint="test"))
    assert 0.0 <= out["test_accuracy"] <= 1.0
    assert 0.0 <= out["test_balanced_accuracy"] <= 1.0
    assert os.path.exists(workdir / "output" / "classifier-test.joblib")


def test_resume_from_checkpoint(workdir):
    result = link_prediction(
        _cfg(workdir, run_id="resumed", max_epochs=1,
             checkpoint=str(workdir / "output" / "model-test.npz")))
    assert result["test_mrr"] > 0


def test_blp_model_e2e(workdir):
    result = link_prediction(
        _cfg(workdir, model="blp", run_id="blp-test", max_epochs=1,
             rel_model="distmult", loss_fn="nll"))
    assert result["test_mrr"] > 0


def test_transductive_e2e(workdir):
    result = link_prediction(
        _cfg(workdir, model="transductive", run_id="trans-test",
             inductive=False, max_epochs=1))
    assert result["test_mrr"] > 0


def test_parse_overrides_roundtrip():
    cfg = parse_overrides(["with", "dataset=fb15k237", "dim=256", "bf16=true",
                           "checkpoint=none", "lr=3e-5", "max_epochs=0"])
    assert cfg.dataset == "fb15k237"
    assert cfg.dim == 256
    assert cfg.bf16 is True
    assert cfg.checkpoint is None
    assert cfg.lr == 3e-5
    assert cfg.max_epochs == 0
    # remat accepts bools AND the partial-remat layer count (remat=8 in the
    # Wikidata5M launchers — BertConfig.remat=<int k>); small counts must
    # NOT collapse to booleans (review r05: remat=1 used to coerce to True).
    assert parse_overrides(["remat=true"]).remat is True
    assert parse_overrides(["remat=8"]).remat == 8
    assert parse_overrides(["remat=1"]).remat == 1
    assert parse_overrides(["remat=0"]).remat == 0
    assert parse_overrides(["fast_train=true"]).fast_train is True
    with pytest.raises(ValueError, match="Unknown config key"):
        parse_overrides(["nope=1"])


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import optax
    tree = {"a": np.arange(6).reshape(2, 3).astype(np.float32),
            "b": {"c": np.ones(4), "d": np.int32(7)}}
    path = str(tmp_path / "ck.npz")
    save_pytree(path, tree, {"epoch": 3})
    loaded, meta = load_pytree(path)
    assert meta == {"epoch": 3}
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], tree["b"]["c"])

    # Optax state (namedtuples) via template restore.
    opt = optax.adam(1e-3)
    params = {"w": np.ones((2, 2), np.float32)}
    state = opt.init(params)
    path2 = str(tmp_path / "opt.npz")
    save_pytree(path2, state)
    restored, _ = load_pytree(path2, template=state)
    assert jax.tree.structure(restored) == jax.tree.structure(state)


def test_summarize_hlo_stats_tolerates_cpu(tmp_path):
    """The xprof summarizer must degrade gracefully: on CPU traces (or with
    the converter missing) it returns None or a well-formed dict."""
    import jax
    import jax.numpy as jnp

    from blp_tpu import profiling

    @jax.jit
    def f(x):
        return jnp.sum(x * 2.0)

    float(f(jnp.ones((8, 8))))
    with profiling.trace(str(tmp_path / "tr")):
        float(f(jnp.ones((8, 8))))
    out = profiling.summarize_hlo_stats(str(tmp_path / "tr"))
    if out is not None:
        assert {"total_device_time_us", "by_category_us", "top_ops"} <= set(out)

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


def test_resume_under_mesh_bitwise(workdir):
    """Preemption recovery on a mesh: 1 epoch + resume must equal 2 straight
    epochs, with the resumed params re-placed onto the mesh shardings (a
    single-device re-load against sharded batches is the failure mode)."""
    from blp_tpu.checkpoint import load_pytree
    import jax

    mesh_kw = dict(model="bert-bow", rel_model="distmult",
                   num_data_shards=4, num_model_shards=2, max_epochs=2)
    r_full = link_prediction(_cfg(workdir, run_id="mesh-full", **mesh_kw))
    link_prediction(_cfg(workdir, run_id="mesh-half", stop_after_epochs=1,
                         **mesh_kw))
    state = str(workdir / "output" / "train_state-mesh-half.npz")
    r_res = link_prediction(_cfg(workdir, run_id="mesh-res", resume=state,
                                 **mesh_kw))

    assert np.isclose(r_res["test_mrr"], r_full["test_mrr"], atol=1e-6)
    p_full, _ = load_pytree(str(workdir / "output" / "train_state-mesh-full.npz"))
    p_res, _ = load_pytree(str(workdir / "output" / "train_state-mesh-res.npz"))
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_blp_dp_mesh_unstacked_resume(workdir):
    """model='blp' on a DP-only mesh trains UNSTACKED (round-4); the state
    file stays canonical stacked, so resume crosses layout AND placement:
    stacked npz -> unstacked tuple tree -> re-placed on the mesh. Must be
    bitwise-equal to a straight run."""
    from blp_tpu.checkpoint import load_pytree, peek_metadata
    import jax

    kw = dict(model="blp", rel_model="transe", encoder_name="tiny",
              num_data_shards=8, max_epochs=2, batch_size=16,
              num_negatives=8)
    r_full = link_prediction(_cfg(workdir, run_id="blp-mesh-full", **kw))
    link_prediction(_cfg(workdir, run_id="blp-mesh-half",
                         stop_after_epochs=1, **kw))
    state = str(workdir / "output" / "train_state-blp-mesh-half.npz")
    assert peek_metadata(state)["layout"] == "stacked"
    r_res = link_prediction(_cfg(workdir, run_id="blp-mesh-res", resume=state,
                                 **kw))
    assert np.isclose(r_res["test_mrr"], r_full["test_mrr"], atol=1e-6)
    p_full, _ = load_pytree(str(workdir / "output" / "train_state-blp-mesh-full.npz"))
    p_res, _ = load_pytree(str(workdir / "output" / "train_state-blp-mesh-res.npz"))
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_blp_pipeline_driver_runs_and_resumes(workdir):
    """Pipeline parallelism through the CLI driver (round-4: num_pipe_shards
    config key): a (data=4, pipe=2) mesh trains, evals under the mesh, and a
    stop/resume run is bitwise-equal to a straight one (PP dropout streams
    derive from the folded step key, so the schedule replays)."""
    from blp_tpu.checkpoint import load_pytree
    import jax

    kw = dict(model="blp", rel_model="transe", encoder_name="tiny",
              num_data_shards=4, num_pipe_shards=2, num_microbatches=2,
              max_epochs=2, batch_size=16, num_negatives=8)
    r_full = link_prediction(_cfg(workdir, run_id="pp-full", **kw))
    assert r_full["test_mrr"] > 0
    link_prediction(_cfg(workdir, run_id="pp-half", stop_after_epochs=1, **kw))
    state = str(workdir / "output" / "train_state-pp-half.npz")
    r_res = link_prediction(_cfg(workdir, run_id="pp-res", resume=state, **kw))
    assert np.isclose(r_res["test_mrr"], r_full["test_mrr"], atol=1e-6)
    p_full, _ = load_pytree(str(workdir / "output" / "train_state-pp-full.npz"))
    p_res, _ = load_pytree(str(workdir / "output" / "train_state-pp-res.npz"))
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_pipe_and_model_shards_mutually_exclusive(workdir):
    with pytest.raises(ValueError, match="mutually exclusive"):
        link_prediction(_cfg(workdir, run_id="pp-tp", num_pipe_shards=2,
                             num_model_shards=2))


def test_multihost_data_path_matches_plain(workdir):
    """The LocalBatcher/global_batch epoch loop (what a pod slice runs) must
    produce the same training trajectory as the plain sharded path — same
    seed derives the same global permutation and the same device placement."""
    kw = dict(model="bert-bow", rel_model="transe",
              num_data_shards=8, max_epochs=2)
    r_plain = link_prediction(_cfg(workdir, run_id="mh-plain", **kw))
    r_mh = link_prediction(_cfg(workdir, run_id="mh-local", multihost_data=True,
                                **kw))
    assert np.isclose(r_mh["test_mrr"], r_plain["test_mrr"], atol=1e-6)
    assert np.isclose(r_mh["test_mrr_filt"], r_plain["test_mrr_filt"],
                      atol=1e-6)


def test_multihost_data_requires_mesh(workdir):
    with pytest.raises(ValueError, match="multi-host runs need a mesh"):
        link_prediction(_cfg(workdir, run_id="mh-nomesh", multihost_data=True))


def test_pipe_requires_blp_model(workdir):
    with pytest.raises(ValueError, match="model='blp'"):
        link_prediction(_cfg(workdir, run_id="pp-bow", model="bert-bow",
                             num_pipe_shards=2))

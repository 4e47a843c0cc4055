"""Mid-run resume: training 2 epochs straight must equal 1 epoch + resume
(deterministic RNG streams keyed on (seed, epoch, step))."""

import numpy as np
import pytest

from blp_tpu.checkpoint import load_pytree
from blp_tpu.config import ExperimentConfig
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    write_synth_dataset(str(root / "data" / "synth"), num_entities=36,
                        num_relations=3, num_triples=140, seed=21)
    return root


def _cfg(workdir, **kw):
    base = dict(
        dataset="synth", data_dir=str(workdir / "data"),
        out_dir=str(workdir / "output"), model="bert-bow", rel_model="distmult",
        encoder_name="tiny", dim=16, max_len=16, num_negatives=8,
        batch_size=16, emb_batch_size=16, eval_batch_size=8,
        lr=1e-3, tile=16, seed=3)
    base.update(kw)
    return ExperimentConfig(**base)


def test_resume_bitwise_equivalent(workdir):
    r_full = link_prediction(_cfg(workdir, run_id="full", max_epochs=2))
    # "Preempted" run: schedule spans 2 epochs, stops after 1.
    link_prediction(_cfg(workdir, run_id="half", max_epochs=2,
                         stop_after_epochs=1))
    state = str(workdir / "output" / "train_state-half.npz")
    r_resumed = link_prediction(_cfg(workdir, run_id="resumed", max_epochs=2,
                                     resume=state))

    assert np.isclose(r_resumed["test_mrr"], r_full["test_mrr"], atol=1e-6)
    assert np.isclose(r_resumed["test_mrr_filt"], r_full["test_mrr_filt"],
                      atol=1e-6)

    # The resumed run's final-epoch params equal the straight run's.
    p_full, _ = load_pytree(str(workdir / "output" / "train_state-full.npz"))
    p_res, _ = load_pytree(str(workdir / "output" / "train_state-resumed.npz"))
    for a, b in zip(_leaves(p_full), _leaves(p_res)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def test_resume_blp_stacked_state_into_unstacked_run(workdir):
    """model='blp' trains with UNSTACKED per-layer weights but the state file
    is written in the canonical stacked layout (layout marker in metadata) —
    the resume boundary must convert both params and the Adam mu/nu and keep
    the run bitwise-equal to a straight one (ADVICE r03)."""
    from blp_tpu.checkpoint import peek_metadata

    kw = dict(model="blp", rel_model="transe", encoder_name="tiny",
              batch_size=8, num_negatives=4)
    r_full = link_prediction(_cfg(workdir, run_id="blp-full", max_epochs=2, **kw))
    link_prediction(_cfg(workdir, run_id="blp-half", max_epochs=2,
                         stop_after_epochs=1, **kw))
    state = str(workdir / "output" / "train_state-blp-half.npz")
    assert peek_metadata(state)["layout"] == "stacked"
    r_res = link_prediction(_cfg(workdir, run_id="blp-res", max_epochs=2,
                                 resume=state, **kw))
    assert np.isclose(r_res["test_mrr"], r_full["test_mrr"], atol=1e-6)
    p_full, _ = load_pytree(str(workdir / "output" / "train_state-blp-full.npz"))
    p_res, _ = load_pytree(str(workdir / "output" / "train_state-blp-res.npz"))
    for a, b in zip(_leaves(p_full), _leaves(p_res)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_resume_legacy_markerless_stacked_state(workdir):
    """Pre-round-4 DP-mesh runs wrote STACKED state files WITHOUT a layout
    marker; the resume path must detect the layout by leaf count instead of
    assuming marker-less == live layout (review r04 finding #3)."""
    from blp_tpu.checkpoint import load_pytree, save_pytree

    kw = dict(model="blp", rel_model="transe", encoder_name="tiny",
              batch_size=8, num_negatives=4)
    link_prediction(_cfg(workdir, run_id="lgc-half", max_epochs=2,
                         stop_after_epochs=1, **kw))
    state = str(workdir / "output" / "train_state-lgc-half.npz")
    # Strip the layout marker, simulating a legacy stacked file.
    tree, meta = load_pytree(state)
    meta.pop("layout")
    legacy = str(workdir / "output" / "train_state-legacy.npz")
    save_pytree(legacy, tree, meta)

    r_full = link_prediction(_cfg(workdir, run_id="lgc-full", max_epochs=2, **kw))
    r_res = link_prediction(_cfg(workdir, run_id="lgc-res", max_epochs=2,
                                 resume=legacy, **kw))
    assert np.isclose(r_res["test_mrr"], r_full["test_mrr"], atol=1e-6)


def test_peek_leaf_shapes_disambiguates_single_layer_layout(tmp_path):
    """With num_layers == 1, stacked and unstacked trees have EQUAL leaf
    counts, so the legacy-file layout probe must fall through to comparing
    leaf shapes (stacked layer leaves carry a leading (1,) axis) — ADVICE
    r04 #3. peek_leaf_shapes reads .npy headers only."""
    import jax

    from blp_tpu import checkpoint as ckpt
    from blp_tpu import training
    from blp_tpu.models import bert, blp

    cfg = blp.ModelConfig(
        model="blp", rel_model="transe", loss_fn="margin", dim=8,
        num_relations=3, encoder=bert.BertConfig.tiny(num_layers=1))
    stacked = blp.init_params(jax.random.key(0), cfg)
    unstacked = training.unstack_params(stacked)
    # The ambiguity: equal leaf counts...
    assert len(jax.tree.leaves(stacked)) == len(jax.tree.leaves(unstacked))

    f_stacked = str(tmp_path / "stacked.npz")
    f_unstacked = str(tmp_path / "unstacked.npz")
    ckpt.save_pytree(f_stacked, stacked, {})
    ckpt.save_pytree(f_unstacked, unstacked, {})
    live_shapes = [tuple(l.shape) for l in jax.tree.leaves(unstacked)]
    # ...but distinguishable shapes: the probe must flag the stacked file.
    assert ckpt.peek_leaf_shapes(f_stacked) != live_shapes
    assert ckpt.peek_leaf_shapes(f_unstacked) == live_shapes
    assert ckpt.peek_num_leaves(f_stacked) == len(live_shapes)


def test_auto_resume_same_run_id(workdir):
    """resume='auto' + fixed run_id: a relaunched (preempted) job picks up
    its own train_state file and finishes identically to a straight run."""
    r_full = link_prediction(_cfg(workdir, run_id="auto-full", max_epochs=2))
    link_prediction(_cfg(workdir, run_id="auto", max_epochs=2,
                         stop_after_epochs=1, resume="auto"))
    r2 = link_prediction(_cfg(workdir, run_id="auto", max_epochs=2,
                              resume="auto"))
    assert np.isclose(r2["test_mrr"], r_full["test_mrr"], atol=1e-6)

    p_full, _ = load_pytree(str(workdir / "output" / "train_state-auto-full.npz"))
    p_auto, _ = load_pytree(str(workdir / "output" / "train_state-auto.npz"))
    for a, b in zip(_leaves(p_full), _leaves(p_auto)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

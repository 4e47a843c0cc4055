"""Pipeline-parallel (DP x PP) parity tests on the virtual 8-device CPU mesh.

The pipelined encoder must reproduce the single-device loss and gradients
exactly (fp32, deterministic): the pipeline changes the schedule, not the
math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blp_tpu import training
from blp_tpu.data.sampling import sample_negative_indices
from blp_tpu.models import bert, blp
from blp_tpu.parallel import pipeline, train_parallel


def _setup(num_layers=4, B=8, L=16, K=4, rel_model="transe"):
    cfg = blp.ModelConfig(
        model="blp", rel_model=rel_model, loss_fn="margin", dim=16,
        num_relations=4,
        encoder=bert.BertConfig.tiny(num_heads=4, num_layers=num_layers))
    params = blp.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "text_tok": jnp.asarray(
            rng.integers(1, cfg.encoder.vocab_size, (B, 2, L)), jnp.int32),
        "text_mask": jnp.asarray(
            (rng.random((B, 2, L)) < 0.9) | (np.arange(L) == 0), jnp.float32),
        "rels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }
    return cfg, params, batch


def _reference_loss(cfg, params, batch, key, K):
    k_neg, _ = jax.random.split(key)
    B = batch["rels"].shape[0]
    ref_batch = dict(batch)
    ref_batch["neg_idx"] = sample_negative_indices(k_neg, B, K)
    return blp.train_loss(params, cfg, ref_batch, deterministic=True)


@pytest.mark.parametrize("num_data,num_pipe,num_micro",
                         [(1, 4, 4), (2, 2, 2), (2, 4, 2), (4, 2, 1)])
def test_pipeline_loss_matches_single_device(num_data, num_pipe, num_micro):
    cfg, params, batch = _setup(num_layers=4)
    key = jax.random.key(7)
    K = 4

    mesh = pipeline.make_pipeline_mesh(num_data, num_pipe)
    loss_fn = pipeline.make_pipeline_loss(
        cfg, mesh=mesh, batch_size=8, num_negatives=K,
        num_microbatches=num_micro, deterministic=True)
    p = pipeline.shard_pipeline_params(params, mesh)
    b = train_parallel.shard_batch(batch, mesh)
    got = jax.jit(loss_fn)(p, key, b)

    want = _reference_loss(cfg, params, batch, key, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_grads_match_single_device():
    cfg, params, batch = _setup(num_layers=4)
    key = jax.random.key(3)
    K = 4
    mesh = pipeline.make_pipeline_mesh(2, 4)

    loss_fn = pipeline.make_pipeline_loss(
        cfg, mesh=mesh, batch_size=8, num_negatives=K,
        num_microbatches=2, deterministic=True)
    p = pipeline.shard_pipeline_params(params, mesh)
    b = train_parallel.shard_batch(batch, mesh)
    got = jax.jit(jax.grad(lambda p_: loss_fn(p_, key, b)))(p)

    want = jax.grad(
        lambda p_: _reference_loss(cfg, p_, batch, key, K))(params)

    flat_got, tree_got = jax.tree.flatten(jax.device_get(got))
    flat_want, tree_want = jax.tree.flatten(jax.device_get(want))
    assert tree_got == tree_want
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-6)


def test_pipeline_train_step_matches_single_device_step():
    cfg, params, batch = _setup(num_layers=2)
    mesh = pipeline.make_pipeline_mesh(2, 2, devices=jax.devices()[:4])
    optimizer = training.make_optimizer(1e-3, 10)

    # Single-device reference step with the same key schedule — computed
    # FIRST: the pipeline step donates its (possibly aliased) param buffers.
    key = jax.random.key(11)
    ref_batch = dict(batch)
    k_neg, _ = jax.random.split(key)
    ref_batch["neg_idx"] = sample_negative_indices(k_neg, 8, 4)

    def ref_loss(p_):
        return blp.train_loss(p_, cfg, ref_batch, deterministic=True)

    loss_ref, grads = jax.value_and_grad(ref_loss)(params)
    import optax
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    want = optax.apply_updates(params, updates)

    pp_step = pipeline.make_pipeline_train_step(
        cfg, optimizer, mesh=mesh, batch_size=8, num_negatives=4,
        num_microbatches=2, deterministic=True)
    p = pipeline.shard_pipeline_params(params, mesh)
    opt_state = jax.jit(optimizer.init)(p)
    b = train_parallel.shard_batch(batch, mesh)
    p1, _, loss_pp = pp_step(p, opt_state, key, b)

    np.testing.assert_allclose(np.asarray(loss_pp), np.asarray(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for g, w in zip(jax.tree.leaves(jax.device_get(p1)),
                    jax.tree.leaves(jax.device_get(want))):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-6)


def test_pipeline_dropout_trains_and_is_deterministic_per_key():
    cfg, params, batch = _setup(num_layers=2)
    mesh = pipeline.make_pipeline_mesh(2, 2, devices=jax.devices()[:4])
    loss_fn = pipeline.make_pipeline_loss(
        cfg, mesh=mesh, batch_size=8, num_negatives=4,
        num_microbatches=2, deterministic=False)
    p = pipeline.shard_pipeline_params(params, mesh)
    b = train_parallel.shard_batch(batch, mesh)
    jl = jax.jit(loss_fn)
    l1 = float(jl(p, jax.random.key(5), b))
    l2 = float(jl(p, jax.random.key(5), b))
    l3 = float(jl(p, jax.random.key(6), b))
    assert np.isfinite(l1)
    assert l1 == l2, "same key must give the same dropout masks"
    assert l1 != l3, "different keys must give different dropout masks"


def test_pipeline_validates_layer_divisibility():
    cfg, _, _ = _setup(num_layers=3)
    mesh = pipeline.make_pipeline_mesh(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline.make_pipeline_loss(cfg, mesh=mesh, batch_size=8,
                                    num_negatives=4)

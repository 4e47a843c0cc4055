"""pjit-sharded training step: DP over 'data', optional TP over 'model'.

The semantics match the single-device step exactly: in-batch negatives are
defined w.r.t. the GLOBAL batch (the flattened (2B, d) entity view), matching
the reference's single-GPU behaviour — torch DataParallel instead re-sampled
per shard (reference: data.py:289-299), which was an artifact of replica
scatter, not a modelling choice. XLA inserts the gradient all-reduce over
'data' and the TP collectives over 'model' from the sharding annotations;
there is no hand-written communication here (SURVEY.md §2.3).

Usage:
    state = init_parallel_state(params, optimizer, mesh, tensor_parallel=True)
    step = make_parallel_train_step(cfg, optimizer, batch_size=..., num_negatives=...)
    batch = shard_batch(batch, mesh)           # host numpy -> device shards
    params, opt_state, loss = step(params, opt_state, key, batch)

Committed input shardings flow through jax.jit — the step body itself is
layout-agnostic.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blp_tpu.data.sampling import sample_negative_indices
from blp_tpu.models import blp
from blp_tpu.parallel import mesh as mesh_lib


def init_parallel_state(params, optimizer, mesh: Mesh, *,
                        tensor_parallel: bool = True, shardings=None):
    """Shard params per the TP layout and build a matching optimizer state.

    The opt state is COMMITTED to the mesh explicitly: Adam's mu/nu follow the
    param shardings, everything else (step counts, schedule state) replicates.
    jit propagation alone does NOT do this — optimizer.init's zeros_like
    outputs are input-value-independent, so XLA leaves them uncommitted on the
    default device; a later resume that re-places leaves \"like the template\"
    would then commit the opt state to one device against 8-device params.

    `shardings` overrides the layout (e.g. the pipeline stage slicing of
    parallel/pipeline.py); default is the DP/TP layout of mesh.param_shardings.
    """
    if shardings is None:
        shardings = mesh_lib.param_shardings(params, mesh,
                                             tensor_parallel=tensor_parallel)
    params = jax.device_put(params, shardings)
    opt_state = jax.jit(optimizer.init)(params)
    repl = NamedSharding(mesh, P())

    def place(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jax.device_put(node.count, repl),
                mu=jax.device_put(node.mu, shardings),
                nu=jax.device_put(node.nu, shardings))
        return jax.tree.map(lambda x: jax.device_put(x, repl), node)

    if type(opt_state) is tuple:  # optax.chain: plain tuple of sub-states
        opt_state = tuple(place(s) for s in opt_state)
    else:
        opt_state = place(opt_state)
    return params, opt_state, shardings


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, batch axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_parallel_train_step(cfg: blp.ModelConfig, optimizer, *,
                             batch_size: int, num_negatives: int):
    """Jitted global-batch train step; sharding follows committed inputs,
    params/opt-state buffers are donated (in-place update per shard)."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, batch):
        if isinstance(key, tuple):  # (base_key, step_index): fold in-jit
            key = jax.random.fold_in(key[0], key[1])
        k_neg, k_drop = jax.random.split(key)
        batch = dict(batch)
        batch["neg_idx"] = sample_negative_indices(k_neg, batch_size, num_negatives)

        def loss_fn(p):
            return blp.train_loss(p, cfg, batch, deterministic=False, rng=k_drop)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

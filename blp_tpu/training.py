"""Training step construction: Adam + linear-warmup schedule, jitted step.

Mirrors the reference's optimization setup (train.py:332-350): Adam at lr,
optional linear schedule with 20% warmup then linear decay to zero, one
optimizer step per batch. The step is a single jitted function that samples
negatives on-device, runs the encoder fwd/bwd, and applies the update —
nothing per-step happens on the host beyond feeding the token batch.
"""

from __future__ import annotations

import functools
from typing import Callable  # noqa: F401

import jax
import jax.numpy as jnp
import optax

from blp_tpu.data.sampling import sample_negative_indices
from blp_tpu.models import blp


def linear_warmup_schedule(lr: float, total_steps: int, warmup_frac: float = 0.2):
    """HF get_linear_schedule_with_warmup semantics (train.py:334-338):
    lr * step/warmup during warmup, then linear decay to 0 at total_steps."""
    warmup = int(warmup_frac * total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(warmup, 1)
        t = jnp.maximum(total_steps - warmup, 1)
        warm = step / w
        decay = jnp.maximum(0.0, (total_steps - step) / t)
        return lr * jnp.where(step < warmup, warm, decay)

    return schedule


def scale_by_adam_bf16_moments(b1: float = 0.9, b2: float = 0.999,
                               eps: float = 1e-8):
    """`optax.scale_by_adam` with BOTH moment buffers stored in bfloat16.

    ** Measured QUALITY NEGATIVE — kept in-tree as engineering record, not
    wired to any driver flag (PERFORMANCE.md round 5). ** Fast (+3.4%
    flagship: the moment streams are the biggest slice of the Adam HBM
    floor), and it tracks f32 Adam mid-curve (20k-task 8-epoch MRR within
    3%), but it STALLS at convergence: 30-epoch test MRR 0.083 vs 0.293 for
    f32 state. Mechanism: with b2=0.999 the second moment's per-step
    increment is 0.001*g^2 — below bf16's ~2^-8 relative ulp of the running
    nu once nu is established — so round-to-nearest absorbs every update,
    nu freezes high, and the effective step collapses exactly when
    gradients get small. This is why bf16 EMA accumulators need error
    feedback (8-bit Adam) and why optax exposes mu_dtype but no nu_dtype.
    The production option is mu-only bf16 (`make_optimizer(bf16_mu=True)`).
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), jnp.bfloat16)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - jnp.power(b1, count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(b2, count.astype(jnp.float32))

        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu)
        nu32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu)
        upd = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        return upd, optax.ScaleByAdamState(count=count, mu=cast(mu32),
                                           nu=cast(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(lr: float, total_steps: int, use_scheduler: bool = True,
                   *, bf16_mu: bool = False, bf16_moments: bool = False):
    """bf16_mu stores Adam's FIRST moment in bfloat16 (optax mu_dtype) —
    mu's per-step increment is 0.1*g, well above bf16 ulp absorption, and
    the stored noise is zero-mean. Measured speed-NEUTRAL on the flagship
    (40.8 vs 41.0 ms); kept as a memory option (-220 MB device state for
    BERT-base), quality-A/B'd to convergence on the 20k task
    (PERFORMANCE.md round 5). bf16_moments (both buffers) is the measured
    quality negative above — only reachable explicitly, for the record."""
    sched = linear_warmup_schedule(lr, total_steps) if use_scheduler else lr
    if bf16_moments:
        return optax.chain(scale_by_adam_bf16_moments(eps=1e-8),
                           optax.scale_by_learning_rate(sched))
    return optax.adam(sched, eps=1e-8,
                      mu_dtype=jnp.bfloat16 if bf16_mu else None)


def unstack_params(params: dict) -> dict:
    """BLP-level fast-path view: BERT layers unstacked into per-layer leaves
    (models/bert.py::unstack_layers). Hold TRAINING state in this layout and
    restack at checkpoint/eval boundaries — storage and all other consumers
    keep the canonical stacked tree. No-op for non-BERT models."""
    if "bert" not in params:
        return params
    from blp_tpu.models import bert as bert_mod

    out = dict(params)
    out["bert"] = bert_mod.unstack_layers(params["bert"])
    return out


def restack_params(params: dict) -> dict:
    """Inverse of unstack_params (no-op when already stacked / non-BERT)."""
    if "bert" not in params:
        return params
    from blp_tpu.models import bert as bert_mod

    out = dict(params)
    out["bert"] = bert_mod.restack_layers(params["bert"])
    return out


def map_param_trees(fn, tree):
    """Apply `fn` to every params-style dict (one holding a 'bert' subtree)
    inside an arbitrary container tree — used to convert the param-mirroring
    mu/nu inside an optax state between the stacked and unstacked layouts.
    Leaves everything else (counts, namedtuple shells, non-BERT states)
    untouched."""
    def rec(node):
        if isinstance(node, dict):
            if "bert" in node:
                return fn(node)
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple):
            vals = [rec(v) for v in node]
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [rec(v) for v in node]
        return node
    return rec(tree)


def restack_opt_state(opt_state):
    """Canonical stacked view of an optimizer state built over unstacked
    params (checkpoint files always store the stacked layout — a state file
    must resume regardless of which layout the writing run trained in)."""
    return map_param_trees(restack_params, opt_state)


def unstack_opt_state(opt_state):
    """Inverse of restack_opt_state."""
    return map_param_trees(unstack_params, opt_state)


def make_train_step(
    cfg: blp.ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    batch_size: int,
    num_negatives: int,
) -> Callable:
    """Build the jitted train step.

    step(params, opt_state, key, batch) -> (params, opt_state, loss)

    batch: text models {text_tok (B,2,L), text_mask, rels}; transductive
    {pos_pairs, rels}. Negative indices are sampled inside the step.
    """

    # params/opt_state buffers are donated: the update happens in place on
    # device, halving peak HBM and avoiding dead-copy churn.
    #
    # `key` may be a (base_key, step_index) pair — folding happens INSIDE the
    # jit: an eager fold_in in the host loop is a separate tiny device
    # execution per step, which costs a dispatch round-trip on remote chips.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, batch):
        if isinstance(key, tuple):
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

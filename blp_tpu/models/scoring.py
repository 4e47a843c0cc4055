"""Relational scoring functions, losses and regularization.

Semantics match the reference BLP scorers/losses (reference: models.py:222-266)
but are written as pure jnp functions over broadcastable arrays so the same
code path serves:

  * positive-edge scoring           (B, d)        -> (B,)
  * in-batch negative scoring       (B, K, d)     -> (B, K)
  * rank-against-all-entities       (1, N, d) vs (B, 1, d) -> (B, N)

All functions broadcast on leading axes and reduce the trailing feature axis.
Computation is kept in float32 accumulation regardless of input dtype so
bfloat16 activations rank identically to the fp32 reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def transe_score(heads: Array, tails: Array, rels: Array) -> Array:
    """TransE: -||h + r - t||_1  (reference: models.py:222-223)."""
    diff = heads + rels - tails
    return -jnp.sum(jnp.abs(diff), axis=-1)


def distmult_score(heads: Array, tails: Array, rels: Array) -> Array:
    """DistMult: sum(h * r * t)  (reference: models.py:226-227)."""
    return jnp.sum(heads * rels * tails, axis=-1)


def complex_score(heads: Array, tails: Array, rels: Array) -> Array:
    """ComplEx: Re(<h, r, conj(t)>) with re/im stored as the two halves of the
    feature axis (reference: models.py:230-239)."""
    h_re, h_im = jnp.split(heads, 2, axis=-1)
    t_re, t_im = jnp.split(tails, 2, axis=-1)
    r_re, r_im = jnp.split(rels, 2, axis=-1)
    return jnp.sum(
        r_re * h_re * t_re
        + r_re * h_im * t_im
        + r_im * h_re * t_im
        - r_im * h_im * t_re,
        axis=-1,
    )


def simple_score(heads: Array, tails: Array, rels: Array) -> Array:
    """SimplE: (<h_h, r_a, t_t> + <t_h, r_b, h_t>) / 2 with head/tail halves of
    the feature axis (reference: models.py:242-248)."""
    h_h, h_t = jnp.split(heads, 2, axis=-1)
    t_h, t_t = jnp.split(tails, 2, axis=-1)
    r_a, r_b = jnp.split(rels, 2, axis=-1)
    return jnp.sum(h_h * r_a * t_t + t_h * r_b * h_t, axis=-1) / 2.0


SCORE_FNS = {
    "transe": transe_score,
    "distmult": distmult_score,
    "complex": complex_score,
    "simple": simple_score,
}

#: Relational models whose entity embeddings are L2-normalized before scoring
#: (reference: models.py:13,16-18,38-43 — only TransE normalizes).
NORMALIZED_REL_MODELS = frozenset({"transe"})


def get_score_fn(rel_model: str):
    try:
        return SCORE_FNS[rel_model]
    except KeyError:
        raise ValueError(f"Unknown relational model {rel_model!r}.") from None


def margin_loss(pos_scores: Array, neg_scores: Array, margin: float = 1.0) -> Array:
    """mean(relu(margin - pos + neg)); fixed margin 1 in the reference
    (reference: models.py:251-254). `pos_scores` broadcasts against
    `neg_scores` — pass pos as (B, 1) and neg as (B, K)."""
    return jnp.mean(jax.nn.relu(margin - pos_scores + neg_scores))


def nll_loss(pos_scores: Array, neg_scores: Array) -> Array:
    """(mean softplus(-pos) + mean softplus(neg)) / 2
    (reference: models.py:257-258)."""
    return (
        jnp.mean(jax.nn.softplus(-pos_scores)) + jnp.mean(jax.nn.softplus(neg_scores))
    ) / 2.0


LOSS_FNS = {"margin": margin_loss, "nll": nll_loss}


def get_loss_fn(loss_fn: str):
    try:
        return LOSS_FNS[loss_fn]
    except KeyError:
        raise ValueError(f"Unknown loss function {loss_fn!r}") from None


def l2_regularization(heads: Array, tails: Array, rels: Array) -> Array:
    """Mean of the per-tensor mean squares, averaged over the three tensors
    (reference: models.py:261-266)."""
    return (
        jnp.mean(jnp.square(heads)) + jnp.mean(jnp.square(tails)) + jnp.mean(jnp.square(rels))
    ) / 3.0


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """Row-wise L2 normalization matching torch.nn.functional.normalize:
    x / max(||x||_2, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def compute_loss(
    ent_embs: Array,
    rel_embs: Array,
    neg_idx: Array,
    *,
    rel_model: str,
    loss_fn: str,
    regularizer: float = 0.0,
) -> Array:
    """Positive + in-batch-negative loss for one batch of B edges.

    Args:
      ent_embs: (B, 2, d) encoded [head, tail] embeddings per edge (already
        normalized if the relational model requires it).
      rel_embs: (B, d) relation embeddings of the positive edges. Negatives
        reuse the relation of their row (reference: models.py:51-70).
      neg_idx:  (B, K, 2) int indices into the flattened (2B, d) entity view;
        column 0 picks the corrupted head, column 1 the corrupted tail.
    """
    score = get_score_fn(rel_model)
    loss = get_loss_fn(loss_fn)

    heads = ent_embs[:, 0, :]
    tails = ent_embs[:, 1, :]
    pos_scores = score(heads, tails, rel_embs)[:, None]  # (B, 1)

    flat = ent_embs.reshape(-1, ent_embs.shape[-1])  # (2B, d)
    neg_heads = flat[neg_idx[..., 0]]  # (B, K, d)
    neg_tails = flat[neg_idx[..., 1]]
    neg_scores = score(neg_heads, neg_tails, rel_embs[:, None, :])  # (B, K)

    total = loss(pos_scores, neg_scores)
    if regularizer:
        total = total + regularizer * l2_regularization(heads, tails, rel_embs)
    return total

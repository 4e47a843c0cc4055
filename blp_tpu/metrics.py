"""Ranking metrics with tie-aware average ranks.

The reference computes (reference: utils.py:86-111, after PyKEEN):

    best_rank  = #(scores >  score_true) + 1
    worst_rank = #(scores >= score_true)
    rank       = (best_rank + worst_rank) / 2
    hits@k     = rank <= k

Both counts are plain sums over the candidate axis, so they decompose exactly
into per-shard partial sums — this is what makes the sharded evaluator
(blp_tpu/parallel/eval_parallel.py) bit-identical to a single-device run: each
device counts over its slice of the candidate table and the counts are
psum-reduced. No (B, N) score matrix ever needs to be materialized globally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rank_counts(scores: Array, true_scores: Array, valid_mask: Array | None = None):
    """Partial rank counts for a tile of candidate scores.

    Args:
      scores: (B, N_tile) candidate scores.
      true_scores: (B, 1) score of the true entity.
      valid_mask: optional (B, N_tile) bool; False marks candidates excluded
        from the ranking (padding columns or filtered known-true answers —
        equivalent to the reference's `pred_ents[mask] = min - 1` trick at
        train.py:163-165, since a score below the true score contributes to
        neither count).

    Returns:
      (gt, geq): (B,) int32 counts of candidates scoring > / >= the true score.
    """
    gt = scores > true_scores
    geq = scores >= true_scores
    if valid_mask is not None:
        gt = jnp.logical_and(gt, valid_mask)
        geq = jnp.logical_and(geq, valid_mask)
    return gt.sum(axis=-1, dtype=jnp.int32), geq.sum(axis=-1, dtype=jnp.int32)


def ranks_from_counts(gt: Array, geq: Array) -> Array:
    """Tie-aware average rank from global counts (reference: utils.py:102-106)."""
    return (gt.astype(jnp.float32) + 1.0 + geq.astype(jnp.float32)) * 0.5


def metrics_from_ranks(ranks: Array, k_values=(1, 3, 10)):
    """Reciprocal ranks and hits@k indicators (reference: utils.py:108-110).

    Returns:
      reciprocals: (B,) float32
      hits: (B, len(k_values)) bool
    """
    reciprocals = 1.0 / ranks
    ks = jnp.asarray(k_values, dtype=jnp.float32)
    hits = ranks[:, None] <= ks[None, :]
    return reciprocals, hits


def get_metrics(pred_scores: Array, true_idx: Array, k_values=(1, 3, 10)):
    """Dense-scores convenience wrapper matching the reference signature
    (reference: utils.py:86-111).

    Args:
      pred_scores: (B, N) scores, higher ranks first.
      true_idx: (B,) int index of the true entity per row.
    """
    true_scores = jnp.take_along_axis(pred_scores, true_idx[:, None], axis=1)
    gt, geq = rank_counts(pred_scores, true_scores)
    ranks = ranks_from_counts(gt, geq)
    return metrics_from_ranks(ranks, k_values)


def split_by_new_position(triples, reciprocals, new_entity_mask):
    """Break MRR down by where the unseen entity sits (both/head/tail).

    Vectorized equivalent of the reference's per-triple loop
    (reference: utils.py:114-148).

    Args:
      triples: (B, 3) int array of (head, tail, rel) entity/relation IDs.
      reciprocals: (2B,) reciprocals, first half head-corruption, second half
        tail-corruption.
      new_entity_mask: (max_ent_id+1,) bool lookup; True for new entities.

    Returns:
      (sums, counts): each (3,) float32 — [both new, head new, tail new].
    """
    triples = jnp.asarray(triples)
    reciprocals = jnp.asarray(reciprocals)
    b = triples.shape[0]
    head_new = new_entity_mask[triples[:, 0]]
    tail_new = new_entity_mask[triples[:, 1]]
    per_triple = (reciprocals[:b] + reciprocals[b : 2 * b]) / 2.0

    both = jnp.logical_and(head_new, tail_new)
    head_only = jnp.logical_and(head_new, ~tail_new)
    tail_only = jnp.logical_and(~head_new, tail_new)
    masks = jnp.stack([both, head_only, tail_only])  # (3, B)
    sums = (masks * per_triple[None, :]).sum(axis=1)
    counts = masks.sum(axis=1).astype(jnp.float32)
    return sums, counts


def split_by_category(triples, reciprocals, rel_categories, num_categories: int = 4):
    """Break MRR down by relation category x prediction side
    (reference: utils.py:151-168).

    Args:
      triples: (B, 3) (head, tail, rel).
      reciprocals: (2B,) as in `split_by_new_position`.
      rel_categories: (num_rels,) int category id per relation.

    Returns:
      sums: (2, num_categories) — row 0 head-prediction, row 1 tail-prediction.
      counts: (1, num_categories).
    """
    triples = jnp.asarray(triples)
    reciprocals = jnp.asarray(reciprocals)
    b = triples.shape[0]
    cats = rel_categories[triples[:, 2]]  # (B,)
    onehot = jax.nn.one_hot(cats, num_categories, dtype=jnp.float32)  # (B, C)
    head_sums = reciprocals[:b] @ onehot
    tail_sums = reciprocals[b : 2 * b] @ onehot
    counts = onehot.sum(axis=0, keepdims=True)
    return jnp.stack([head_sums, tail_sums]), counts

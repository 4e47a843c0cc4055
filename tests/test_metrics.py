"""Metrics parity: tie-aware average rank vs an independent torch
implementation of the PyKEEN-style definition, plus the shard-decomposition
property the distributed evaluator relies on."""

import jax.numpy as jnp
import numpy as np
import torch

from blp_tpu import metrics


def torch_metrics(pred_scores, true_idx, ks=(1, 3, 10)):
    ps = torch.from_numpy(pred_scores)
    ti = torch.from_numpy(true_idx)[:, None]
    true_scores = ps.gather(1, ti)
    best = (ps > true_scores).sum(1, keepdim=True) + 1
    worst = (ps >= true_scores).sum(1, keepdim=True)
    avg = (best + worst).float() * 0.5
    rec = avg.reciprocal()
    hits = avg <= torch.tensor([ks])
    return rec.numpy().squeeze(1), hits.numpy()


def test_get_metrics_parity_with_ties():
    rng = np.random.default_rng(0)
    scores = rng.integers(0, 5, size=(32, 50)).astype(np.float32)  # many ties
    true_idx = rng.integers(0, 50, size=(32,))
    rec, hits = metrics.get_metrics(jnp.asarray(scores), jnp.asarray(true_idx))
    t_rec, t_hits = torch_metrics(scores, true_idx)
    np.testing.assert_allclose(np.asarray(rec), t_rec, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hits), t_hits)


def test_rank_counts_shard_decomposition():
    """Summing per-shard (gt, geq) counts == global counts → identical ranks."""
    rng = np.random.default_rng(1)
    B, N, S = 8, 64, 4
    scores = rng.integers(0, 4, size=(B, N)).astype(np.float32)
    true_idx = rng.integers(0, N, size=(B,))
    true_scores = np.take_along_axis(scores, true_idx[:, None], axis=1)

    gt_sum = np.zeros(B, np.int32)
    geq_sum = np.zeros(B, np.int32)
    for s in range(S):
        tile = jnp.asarray(scores[:, s * (N // S):(s + 1) * (N // S)])
        gt, geq = metrics.rank_counts(tile, jnp.asarray(true_scores))
        gt_sum += np.asarray(gt)
        geq_sum += np.asarray(geq)

    ranks = metrics.ranks_from_counts(jnp.asarray(gt_sum), jnp.asarray(geq_sum))
    rec, _ = metrics.metrics_from_ranks(ranks)
    t_rec, _ = torch_metrics(scores, true_idx)
    np.testing.assert_allclose(np.asarray(rec), t_rec, rtol=1e-6)


def test_filter_mask_equals_min_minus_one_trick():
    """Excluding candidates via valid_mask == reference's score=min-1 trick."""
    rng = np.random.default_rng(2)
    B, N = 6, 40
    scores = rng.standard_normal((B, N)).astype(np.float32)
    true_idx = rng.integers(0, N, size=(B,))
    filt = rng.random((B, N)) < 0.3
    filt[np.arange(B), true_idx] = False  # the true answer is never filtered

    # Reference trick on dense scores.
    masked = scores.copy()
    masked[filt] = scores.min() - 1.0
    t_rec, t_hits = torch_metrics(masked, true_idx)

    # Count-based with validity mask.
    true_scores = np.take_along_axis(scores, true_idx[:, None], axis=1)
    gt, geq = metrics.rank_counts(jnp.asarray(scores), jnp.asarray(true_scores),
                                  jnp.asarray(~filt))
    ranks = metrics.ranks_from_counts(gt, geq)
    rec, hits = metrics.metrics_from_ranks(ranks)
    np.testing.assert_allclose(np.asarray(rec), t_rec, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hits), t_hits)


def test_split_by_new_position():
    triples = np.array([[0, 1, 0], [2, 3, 1], [4, 1, 0], [0, 5, 1]])
    rec = np.arange(8, dtype=np.float32) / 8.0
    new_mask = np.zeros(6, bool)
    new_mask[[2, 3, 5]] = True  # triple1: both new; triple3: tail new
    sums, counts = metrics.split_by_new_position(triples, rec, jnp.asarray(new_mask))
    per = (rec[:4] + rec[4:]) / 2
    np.testing.assert_allclose(np.asarray(sums), [per[1], 0.0, per[3]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), [1.0, 0.0, 1.0])


def test_split_by_category():
    triples = np.array([[0, 1, 0], [2, 3, 1], [4, 1, 2], [0, 5, 1]])
    rec = np.arange(8, dtype=np.float32)
    rel_cats = jnp.asarray(np.array([3, 0, 1]))
    sums, counts = metrics.split_by_category(triples, rec, rel_cats)
    want = np.zeros((2, 4), np.float32)
    cnt = np.zeros((1, 4), np.float32)
    for i, (_, _, r) in enumerate(triples):
        c = int(np.asarray(rel_cats)[r])
        want[0, c] += rec[i]
        want[1, c] += rec[i + 4]
        cnt[0, c] += 1
    np.testing.assert_allclose(np.asarray(sums), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), cnt)

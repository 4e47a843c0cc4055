"""Pallas TransE rank-count kernel vs the XLA tiled implementation
(interpret mode on CPU; the real lowering runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blp_tpu.ops import pallas_ranking, ranking


@pytest.mark.parametrize("corrupt", ["head", "tail"])
def test_kernel_matches_xla_counts(corrupt):
    rng = np.random.default_rng(0)
    B, d, tile = 8, 16, 16
    N = 40
    Np = 48  # 3 tiles
    table = np.zeros((Np, d), np.float32)
    table[:N] = rng.standard_normal((N, d)).astype(np.float32)
    fixed = rng.standard_normal((B, d)).astype(np.float32)
    rel = rng.standard_normal((B, d)).astype(np.float32)
    true_pos = rng.integers(0, N, B).astype(np.int32)
    filter_pos = np.full((B, 8), -1, np.int32)
    filter_pos[0, :3] = [1, 17, 39]
    filter_pos[3, 0] = 20

    true_scores = np.asarray(ranking.score_pairs(
        jnp.asarray(table[true_pos]), jnp.asarray(fixed), jnp.asarray(rel),
        rel_model="transe", corrupt=corrupt))[:, None]

    want = ranking.tiled_rank_counts(
        jnp.asarray(table), jnp.asarray(fixed), jnp.asarray(rel),
        jnp.asarray(true_scores), jnp.asarray(true_pos),
        jnp.asarray(filter_pos), jnp.asarray(N, jnp.int32),
        rel_model="transe", corrupt=corrupt, tile=tile)

    got = pallas_ranking.transe_tiled_rank_counts(
        jnp.asarray(table), jnp.asarray(fixed), jnp.asarray(rel),
        jnp.asarray(true_scores), jnp.asarray(true_pos),
        jnp.asarray(filter_pos), jnp.asarray(N, jnp.int32),
        corrupt=corrupt, tile=tile, interpret=True)

    for k in ("gt", "geq", "fgt", "fgeq"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)


def test_bidir_kernel_matches_xla_counts():
    rng = np.random.default_rng(1)
    B, d, tile = 8, 16, 16
    N, Np = 40, 48
    table = np.zeros((Np, d), np.float32)
    table[:N] = rng.standard_normal((N, d)).astype(np.float32)
    head = rng.standard_normal((B, d)).astype(np.float32)
    tail = rng.standard_normal((B, d)).astype(np.float32)
    rel = rng.standard_normal((B, d)).astype(np.float32)
    head_pos = rng.integers(0, N, B).astype(np.int32)
    tail_pos = rng.integers(0, N, B).astype(np.int32)
    hf = np.full((B, 8), -1, np.int32)
    tf = np.full((B, 8), -1, np.int32)
    hf[0, :3] = [1, 17, 39]
    tf[2, :2] = [5, 20]

    h_true = np.asarray(ranking.score_pairs(
        jnp.asarray(table[head_pos]), jnp.asarray(tail), jnp.asarray(rel),
        rel_model="transe", corrupt="head"))[:, None]
    t_true = np.asarray(ranking.score_pairs(
        jnp.asarray(table[tail_pos]), jnp.asarray(head), jnp.asarray(rel),
        rel_model="transe", corrupt="tail"))[:, None]

    want = ranking.tiled_rank_counts_bidir(
        jnp.asarray(table), jnp.asarray(head), jnp.asarray(tail),
        jnp.asarray(rel), jnp.asarray(h_true), jnp.asarray(t_true),
        jnp.asarray(head_pos), jnp.asarray(tail_pos), jnp.asarray(hf),
        jnp.asarray(tf), jnp.asarray(N, jnp.int32),
        rel_model="transe", tile=tile)
    got = pallas_ranking.transe_tiled_rank_counts_bidir(
        jnp.asarray(table), jnp.asarray(head), jnp.asarray(tail),
        jnp.asarray(rel), jnp.asarray(h_true), jnp.asarray(t_true),
        jnp.asarray(head_pos), jnp.asarray(tail_pos), jnp.asarray(hf),
        jnp.asarray(tf), jnp.asarray(N, jnp.int32),
        tile=tile, interpret=True)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)


def test_seq_abs_scores_matches_kernel_order():
    """The outside filter scorer must accumulate in the kernel's exact d
    order: a manual sequential accumulation agrees bitwise."""
    rng = np.random.default_rng(2)
    B, F, d = 4, 6, 32
    rows = rng.standard_normal((B, F, d)).astype(np.float32)
    u = rng.standard_normal((B, d)).astype(np.float32)
    got = np.asarray(pallas_ranking._seq_abs_scores(jnp.asarray(rows),
                                                    jnp.asarray(u)))
    DC = pallas_ranking._DC
    want = None
    for c0 in range(0, d, DC):
        part = None
        for dd in range(c0, min(c0 + DC, d)):
            t = np.abs(rows[:, :, dd] + u[:, None, dd]).astype(np.float32)
            part = t if part is None else part + t
        want = part if want is None else want + part
    np.testing.assert_array_equal(got, want)


def test_kernel_rejects_unaligned_table():
    with pytest.raises(ValueError, match="multiple of tile"):
        pallas_ranking.transe_tiled_rank_counts(
            jnp.zeros((40, 8)), jnp.zeros((2, 8)), jnp.zeros((2, 8)),
            jnp.zeros((2, 1)), jnp.zeros(2, jnp.int32),
            jnp.full((2, 4), -1, jnp.int32), jnp.asarray(40, jnp.int32),
            corrupt="head", tile=16, interpret=True)

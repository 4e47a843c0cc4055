"""Negative sampler: structural invariants + distributional equivalence with
the reference's multinomial scheme."""

import jax
import numpy as np

from blp_tpu.data.sampling import sample_negative_indices


def test_shapes_and_dtypes():
    idx = sample_negative_indices(jax.random.key(0), batch_size=16, num_negatives=8)
    assert idx.shape == (16, 8, 2)
    assert idx.dtype == np.int32


def test_exactly_one_column_corrupted_and_no_same_row():
    B, K = 32, 64
    idx = np.asarray(sample_negative_indices(jax.random.key(1), B, K))
    rows = np.arange(B)[:, None]
    head_slot, tail_slot = 2 * rows, 2 * rows + 1
    head_kept = idx[..., 0] == head_slot
    tail_kept = idx[..., 1] == tail_slot
    # Exactly one side kept per negative.
    assert np.all(head_kept ^ tail_kept | (head_kept & tail_kept) == (head_kept | tail_kept))
    assert np.all(head_kept | tail_kept)
    # The corrupted side never points back into its own row.
    corrupted = np.where(head_kept, idx[..., 1], idx[..., 0])
    assert np.all(corrupted // 2 != rows)
    assert corrupted.min() >= 0 and corrupted.max() < 2 * B


def test_uniform_over_complement():
    """Corrupting slot distribution ~ uniform over the 2B-2 other-row slots."""
    B, K = 4, 20000
    idx = np.asarray(sample_negative_indices(jax.random.key(2), B, K))
    rows = np.arange(B)[:, None]
    head_kept = idx[..., 0] == 2 * rows
    corrupted = np.where(head_kept, idx[..., 1], idx[..., 0])
    for i in range(B):
        counts = np.bincount(corrupted[i], minlength=2 * B)
        assert counts[2 * i] == 0 and counts[2 * i + 1] == 0
        others = np.delete(counts, [2 * i, 2 * i + 1])
        expected = K / (2 * B - 2)
        assert np.all(np.abs(others - expected) < 5 * np.sqrt(expected))
    # Head/tail coin is fair.
    frac_head_corrupt = 1 - head_kept.mean()
    assert abs(frac_head_corrupt - 0.5) < 0.02


def test_jit_compatible():
    f = jax.jit(sample_negative_indices, static_argnums=(1, 2))
    out = f(jax.random.key(3), 8, 4)
    assert out.shape == (8, 4, 2)

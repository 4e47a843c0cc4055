"""In-batch negative sampling as a jittable JAX op.

Semantics (distribution-equivalent to reference data.py:35-81): a batch of B
positive pairs yields 2B entity slots laid out row-major

    [[0, 1],
     [2, 3],
     ...]

For each of the K negatives of row i, one column (head or tail, fair coin) is
replaced by a slot sampled uniformly from the 2B - 2 slots *outside* row i.
The reference implements the row exclusion with a zero-weight multinomial; we
instead draw r ~ U[0, 2B-2) and shift r past the excluded pair — an exact
bijection onto the complement, fully vectorized, no rejection loop, and it
runs on-device inside the jitted train step (the reference samples on the
host in the DataLoader collate_fn, data.py:297-298).

The reference's `repeats=num_devices` plumbing (data.py:66,76-79) existed only
to hand torch DataParallel per-shard negatives; under pjit the batch is
globally sharded and negatives are defined w.r.t. the global batch, which
matches the reference's single-device semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_negative_indices(key: jax.Array, batch_size: int, num_negatives: int) -> jax.Array:
    """Sample in-batch corruption indices.

    Args:
      key: PRNG key.
      batch_size: number of positive pairs B (static).
      num_negatives: negatives per positive K (static).

    Returns:
      (B, K, 2) int32 indices into the flattened (2B,) entity-slot axis;
      column 0 is the (possibly corrupted) head slot, column 1 the tail slot.
    """
    if batch_size < 2:
        raise ValueError("In-batch negative sampling requires batch_size >= 2.")
    k_sample, k_coin = jax.random.split(key)

    row = jnp.arange(batch_size, dtype=jnp.int32)[:, None]  # (B, 1)
    r = jax.random.randint(
        k_sample, (batch_size, num_negatives), 0, 2 * batch_size - 2, dtype=jnp.int32
    )
    # Shift past the excluded pair {2i, 2i+1}: r in [0, 2i) maps to itself,
    # r >= 2i maps to r + 2.
    sampled = r + jnp.where(r >= 2 * row, 2, 0)

    corrupt_head = jax.random.bernoulli(k_coin, 0.5, (batch_size, num_negatives))
    head_slot = jnp.broadcast_to(2 * row, (batch_size, num_negatives))
    tail_slot = head_slot + 1
    neg_head = jnp.where(corrupt_head, sampled, head_slot)
    neg_tail = jnp.where(corrupt_head, tail_slot, sampled)
    return jnp.stack([neg_head, neg_tail], axis=-1)

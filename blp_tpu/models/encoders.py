"""Word-embedding description encoders: BOW and DKRL-CNN.

Reference semantics: models.py:114-204. Re-designed for static shapes — the
reference truncates each batch to its longest description (dynamic L) and
degrades the DKRL pool kernel for short batches (models.py:189-195); here L is
the fixed dataset max_len and padding correctness comes from masks, so the
whole encoder jits once and tiles cleanly onto the MXU (the DKRL convs are
expressed as single matmuls over a shifted-concat layout instead of Conv1d).

Static-shape note (documented deviation): with dynamic batch length Lb, the
reference's max_pool1d(kernel=4) silently drops the trailing Lb % 4 positions
of the *batch-longest* sequence. With static L — a multiple of 4 — no valid
position is dropped. For batches whose max length is a multiple of 4 the two
formulations are bit-identical (covered by tests); otherwise ours keeps
strictly more signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bow_encode(word_embeddings: Array, text_tok: Array, text_mask: Array | None) -> Array:
    """Masked mean of word embeddings (reference: models.py:146-155).

    Args:
      word_embeddings: (V, E) table.
      text_tok: (B, L) int token ids.
      text_mask: (B, L) 1/0 mask or None (= all ones).
    Returns: (B, E).
    """
    if text_mask is None:
        text_mask = jnp.ones(text_tok.shape, jnp.float32)
    text_mask = text_mask.astype(jnp.float32)
    embs = word_embeddings[text_tok]  # (B, L, E)
    lengths = jnp.sum(text_mask, axis=-1, keepdims=True)
    summed = jnp.einsum("bl,ble->be", text_mask, embs)
    return summed / lengths


def init_dkrl_params(key: Array, emb_dim: int, dim: int) -> dict:
    """Two 1D conv layers with kernel size 2, stored pre-flattened as
    (2*in, out) matmul weights. Init matches torch Conv1d's default
    kaiming-uniform(a=sqrt(5)) which reduces to U(-b, b), b = 1/sqrt(fan_in),
    fan_in = in_channels * kernel_size — for both weights and biases."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = 1.0 / jnp.sqrt(2.0 * emb_dim)
    b2 = 1.0 / jnp.sqrt(2.0 * dim)
    return {
        "conv1_w": jax.random.uniform(k1, (2 * emb_dim, dim), minval=-b1, maxval=b1),
        "conv1_b": jax.random.uniform(k3, (dim,), minval=-b1, maxval=b1),
        "conv2_w": jax.random.uniform(k2, (2 * dim, dim), minval=-b2, maxval=b2),
        "conv2_b": jax.random.uniform(k4, (dim,), minval=-b2, maxval=b2),
    }


def _conv_k2_same_right(x: Array, w: Array, b: Array) -> Array:
    """Width-2 'valid conv after right-pad-1' as one matmul.

    out[l] = [x[l]; x[l+1]] @ w + b, with x[L] = 0 (the reference's
    F.pad([0,1]) + Conv1d(k=2), models.py:186-199). x: (B, L, C) -> (B, L, out).
    """
    x_next = jnp.concatenate([x[:, 1:, :], jnp.zeros_like(x[:, :1, :])], axis=1)
    stacked = jnp.concatenate([x, x_next], axis=-1)  # (B, L, 2C)
    return jnp.dot(stacked, w, preferred_element_type=jnp.float32) + b


def dkrl_encode(params: dict, word_embeddings: Array, text_tok: Array,
                text_mask: Array | None, *, pool: int = 4) -> Array:
    """DKRL CNN encoder (reference: models.py:174-204).

    emb -> mask -> conv1(k=2, right-pad) -> mask -> maxpool(4) -> tanh
        -> conv2(k=2, right-pad) -> masked mean over pooled positions -> tanh

    Requires static L divisible by `pool` (the standard max_len 32/64 are).
    """
    B, L = text_tok.shape
    if L % pool != 0:
        raise ValueError(f"DKRL requires seq len divisible by {pool}, got {L}")
    if text_mask is None:
        text_mask = jnp.ones((B, L), jnp.float32)
    text_mask = text_mask.astype(jnp.float32)

    embs = word_embeddings[text_tok] * text_mask[..., None]  # (B, L, E)

    h = _conv_k2_same_right(embs, params["conv1_w"], params["conv1_b"])
    h = h * text_mask[..., None]

    # Non-overlapping max pool, stride == kernel == pool.
    h = h.reshape(B, L // pool, pool, -1).max(axis=2)
    pooled_mask = text_mask.reshape(B, L // pool, pool).max(axis=2)
    h = jnp.tanh(h)

    h = _conv_k2_same_right(h, params["conv2_w"], params["conv2_b"])
    lengths = jnp.sum(pooled_mask, axis=-1, keepdims=True)
    h = jnp.einsum("bl,bld->bd", pooled_mask, h) / lengths
    return jnp.tanh(h)


def init_entity_table(key: Array, num_entities: int, dim: int) -> Array:
    """Transductive entity lookup table, xavier-uniform like the reference
    (reference: models.py:211-212)."""
    bound = jnp.sqrt(6.0 / (num_entities + dim))
    return jax.random.uniform(key, (num_entities, dim), minval=-bound, maxval=bound)

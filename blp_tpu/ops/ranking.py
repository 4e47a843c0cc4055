"""Rank-against-all-entities scoring as tiled streaming counts.

The reference materializes a (B, N) score matrix per direction and applies
dense boolean filter masks (reference: train.py:146-165) — at Wikidata5M
(N=4.8M) that forces eval_batch_size=2. Here ranking is a streaming reduction:
`lax.scan` over candidate tiles computes tie-aware (gt, geq) counts per tile
and accumulates — peak memory is (B, tile), independent of N, and each tile's
scores feed the VPU/MXU directly.

The bilinear scorers (distmult/complex/simple) collapse rank-vs-all into a
single (B, d) x (d, tile) matmul per tile via a per-query "dual vector" — the
MXU path; TransE keeps the broadcast L1 form on the VPU.

Exactness policy for tie-aware ranks (reference: utils.py:102-106 counts the
true entity's self-tie in `worst_rank`): the true entity and the filtered
known-true answers are handled BY POSITION, not by float comparison —
  * the self column is excluded from the streamed counts and contributes
    exactly (gt += 0, geq += 1);
  * filtered columns' contributions are gathered from the very tile scores
    being counted, so the filtered subtraction is exact by construction (the
    reference instead writes min-1 into a dense matrix; the equivalence of
    count-exclusion is proven in tests/test_metrics.py).
The remaining float sensitivity — a non-self candidate whose score lands
within accumulation-error of the true score — is measure-zero for continuous
scores and can at most perturb one rank by 0.5 (tie vs non-tie).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from blp_tpu.models import scoring

Array = jax.Array


def dual_query(fixed_emb: Array, rel_emb: Array, *, rel_model: str, corrupt: str) -> Array | None:
    """For bilinear scorers, the vector q with score(candidate) = cand @ q.

    corrupt='head': score(c, t, r) as a function of candidate c;
    corrupt='tail': score(h, c, r). Returns None for non-bilinear (transe).
    """
    if rel_model == "distmult":
        return rel_emb * fixed_emb
    if rel_model == "complex":
        r_re, r_im = jnp.split(rel_emb, 2, axis=-1)
        f_re, f_im = jnp.split(fixed_emb, 2, axis=-1)
        if corrupt == "head":
            # c_re . (r_re*t_re + r_im*t_im) + c_im . (r_re*t_im - r_im*t_re)
            return jnp.concatenate([r_re * f_re + r_im * f_im,
                                    r_re * f_im - r_im * f_re], axis=-1)
        # c as tail: c_re . (r_re*h_re - r_im*h_im) + c_im . (r_re*h_im + r_im*h_re)
        return jnp.concatenate([r_re * f_re - r_im * f_im,
                                r_re * f_im + r_im * f_re], axis=-1)
    if rel_model == "simple":
        r_a, r_b = jnp.split(rel_emb, 2, axis=-1)
        f_h, f_t = jnp.split(fixed_emb, 2, axis=-1)
        if corrupt == "head":
            # (c_h . (r_a*t_t) + c_t . (r_b*t_h)) / 2
            return jnp.concatenate([r_a * f_t, r_b * f_h], axis=-1) / 2.0
        # (h_h . (r_a*c_t) + h_t . (r_b*c_h)) / 2 -> c_h: r_b*h_t, c_t: r_a*h_h
        return jnp.concatenate([r_b * f_t, r_a * f_h], axis=-1) / 2.0
    return None


def score_tile(tile_emb: Array, fixed_emb: Array, rel_emb: Array, *,
               rel_model: str, corrupt: str) -> Array:
    """Scores of a candidate tile for every query: (B, tile).

    tile_emb: (T, d); fixed_emb/rel_emb: (B, d).
    """
    q = dual_query(fixed_emb, rel_emb, rel_model=rel_model, corrupt=corrupt)
    if q is not None:
        return jnp.dot(q, tile_emb.T, preferred_element_type=jnp.float32)
    score = scoring.get_score_fn(rel_model)
    if corrupt == "head":
        return score(tile_emb[None, :, :], fixed_emb[:, None, :], rel_emb[:, None, :])
    return score(fixed_emb[:, None, :], tile_emb[None, :, :], rel_emb[:, None, :])


def score_pairs(own_emb: Array, fixed_emb: Array, rel_emb: Array, *,
                rel_model: str, corrupt: str) -> Array:
    """Score of each query's own (true) candidate, (B,). Used as the pivot for
    tie-aware counts; self/filter handling is positional so this value's exact
    float path is uncritical (see module docstring)."""
    q = dual_query(fixed_emb, rel_emb, rel_model=rel_model, corrupt=corrupt)
    if q is not None:
        return jnp.einsum("bd,bd->b", q, own_emb, preferred_element_type=jnp.float32)
    score = scoring.get_score_fn(rel_model)
    if corrupt == "head":
        return score(own_emb, fixed_emb, rel_emb)
    return score(fixed_emb, own_emb, rel_emb)


@functools.partial(jax.jit, static_argnames=("rel_model", "corrupt", "tile"))
def tiled_rank_counts(
    table: Array,
    fixed_emb: Array,
    rel_emb: Array,
    true_scores: Array,
    true_pos: Array,
    filter_pos: Array,
    num_valid: Array,
    *,
    rel_model: str,
    corrupt: str,
    tile: int = 65536,
):
    """Stream over the candidate table accumulating tie-aware rank counts.

    Args:
      table: (Np, d) candidate embeddings, Np a multiple of `tile`.
      fixed_emb: (B, d) the non-corrupted side's embeddings.
      rel_emb: (B, d).
      true_scores: (B, 1) pivot score of the true entity (see score_pairs).
      true_pos: (B,) column of the true entity (excluded positionally).
      filter_pos: (B, F) columns of filtered known-true answers, -1 padded.
      num_valid: scalar int — number of real (non-padding) candidates.

    Returns dict with (B,) int32 counts over valid non-self candidates:
      gt/geq   — raw counts (caller adds the self-tie: rank uses geq + 1);
      fgt/fgeq — the filtered columns' share of gt/geq (subtract for the
                 filtered metric). Gathered from the same tile scores, so
                 the subtraction is exact.
    """
    n_pad, d = table.shape
    b = fixed_emb.shape[0]
    n_tiles = n_pad // tile

    def body(carry, tile_idx):
        gt_a, geq_a, fgt_a, fgeq_a = carry
        start = tile_idx * tile
        tile_emb = jax.lax.dynamic_slice(table, (start, 0), (tile, d))
        s = score_tile(tile_emb, fixed_emb, rel_emb,
                       rel_model=rel_model, corrupt=corrupt)  # (B, tile)

        cols = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        valid = (cols < num_valid) & (cols != true_pos[:, None])
        gt = ((s > true_scores) & valid).sum(-1, dtype=jnp.int32)
        geq = ((s >= true_scores) & valid).sum(-1, dtype=jnp.int32)

        # Filtered columns inside this tile: gather their scores from s.
        local = filter_pos - start                       # (B, F)
        in_tile = (filter_pos >= 0) & (local >= 0) & (local < tile)
        s_f = jnp.take_along_axis(s, jnp.clip(local, 0, tile - 1), axis=1)
        fgt = ((s_f > true_scores) & in_tile).sum(-1, dtype=jnp.int32)
        fgeq = ((s_f >= true_scores) & in_tile).sum(-1, dtype=jnp.int32)

        return (gt_a + gt, geq_a + geq, fgt_a + fgt, fgeq_a + fgeq), None

    zeros = jnp.zeros(b, jnp.int32)
    (gt, geq, fgt, fgeq), _ = jax.lax.scan(
        body, (zeros, zeros, zeros, zeros), jnp.arange(n_tiles))
    return {"gt": gt, "geq": geq, "fgt": fgt, "fgeq": fgeq}


@functools.partial(jax.jit, static_argnames=("rel_model", "tile"))
def tiled_rank_counts_bidir(
    table: Array,
    head_emb: Array,
    tail_emb: Array,
    rel_emb: Array,
    h_true_scores: Array,
    t_true_scores: Array,
    head_pos: Array,
    tail_pos: Array,
    heads_filter: Array,
    tails_filter: Array,
    num_valid: Array,
    *,
    rel_model: str,
    tile: int = 65536,
):
    """Both-direction rank counts in ONE stream over the candidate table.

    The evaluator scores every candidate as head AND as tail per eval batch
    (reference: train.py:146-147). Running the two directions as separate
    scans reads the (N, d) table from HBM twice; for the bilinear scorers the
    pass is table-read-bound (PERFORMANCE.md), so fusing the directions into
    a single scan ~halves the rank phase. Per tile, the two directions'
    dual queries are stacked into one (2B, d) x (d, tile) matmul — a larger,
    better-shaped MXU op than either direction alone. TransE (no dual form)
    still shares the tile read, with both broadcast-L1 scores computed in
    the tile body.

    Count semantics are identical to tiled_rank_counts (positional self
    exclusion, in-tile filter gather). Returns dict with 'h_'/'t_' prefixed
    gt/geq/fgt/fgeq, each (B,) int32 — h_* for head-corruption (candidates
    replace the head; fixed side is the tail), t_* for tail-corruption.
    """
    n_pad, d = table.shape
    b = head_emb.shape[0]
    n_tiles = n_pad // tile

    q_h = dual_query(tail_emb, rel_emb, rel_model=rel_model, corrupt="head")
    bilinear = q_h is not None
    if bilinear:
        q_t = dual_query(head_emb, rel_emb, rel_model=rel_model, corrupt="tail")
        q_both = jnp.concatenate([q_h, q_t], axis=0)        # (2B, d)
    score = scoring.get_score_fn(rel_model)

    def direction_counts(s, true_scores, true_pos, filter_pos, start, cols):
        valid = (cols < num_valid) & (cols != true_pos[:, None])
        gt = ((s > true_scores) & valid).sum(-1, dtype=jnp.int32)
        geq = ((s >= true_scores) & valid).sum(-1, dtype=jnp.int32)
        local = filter_pos - start
        in_tile = (filter_pos >= 0) & (local >= 0) & (local < tile)
        s_f = jnp.take_along_axis(s, jnp.clip(local, 0, tile - 1), axis=1)
        fgt = ((s_f > true_scores) & in_tile).sum(-1, dtype=jnp.int32)
        fgeq = ((s_f >= true_scores) & in_tile).sum(-1, dtype=jnp.int32)
        return gt, geq, fgt, fgeq

    def body(carry, tile_idx):
        start = tile_idx * tile
        tile_emb = jax.lax.dynamic_slice(table, (start, 0), (tile, d))
        if bilinear:
            s_both = jnp.dot(q_both, tile_emb.T,
                             preferred_element_type=jnp.float32)  # (2B, tile)
            s_h, s_t = s_both[:b], s_both[b:]
        else:
            s_h = score(tile_emb[None, :, :], tail_emb[:, None, :],
                        rel_emb[:, None, :])
            s_t = score(head_emb[:, None, :], tile_emb[None, :, :],
                        rel_emb[:, None, :])
        cols = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        h_c = direction_counts(s_h, h_true_scores, head_pos, heads_filter,
                               start, cols)
        t_c = direction_counts(s_t, t_true_scores, tail_pos, tails_filter,
                               start, cols)
        return tuple(a + x for a, x in zip(carry, h_c + t_c)), None

    zeros = (jnp.zeros(b, jnp.int32),) * 8
    acc, _ = jax.lax.scan(body, zeros, jnp.arange(n_tiles))
    names = ("h_gt", "h_geq", "h_fgt", "h_fgeq",
             "t_gt", "t_geq", "t_fgt", "t_fgeq")
    return dict(zip(names, acc))


@functools.partial(jax.jit, static_argnames=("k", "rel_model", "corrupt",
                                             "approx"))
def dense_top_k(
    table: Array,
    fixed_emb: Array,
    rel_emb: Array,
    num_valid: Array,
    *,
    k: int,
    rel_model: str,
    corrupt: str,
    approx: bool = False,
):
    """Top-k via ONE dense (B, Np) score pass + a single selection — the
    small-batch serving fast path. The tiled scan (tiled_top_k) pays a
    (B, 2k) top-k merge per tile (73 merges at Wikidata5M tile=65536), which
    dominates single-query latency; at small B the full (B, Np) score row is
    only ~19 MB per query, so one pass + one (approx_)max_k wins — measured
    on v5e at 4.8M TransE candidates: 6.7 vs 29.3 ms exact at B=1 (4.4x;
    exact is as fast as approximate on this path), 95 vs 109 ms at B=64
    (PERFORMANCE.md). XLA fuses the scoring reduction:
    the (B, Np, d) broadcast never materializes. Memory is O(B * Np); use
    tiled_top_k for large batches.

    Returns (scores (B, k) desc-sorted, ids (B, k) int32).
    """
    n_pad, _ = table.shape
    b = fixed_emb.shape[0]
    s = score_tile(table, fixed_emb, rel_emb, rel_model=rel_model,
                   corrupt=corrupt)                       # (B, Np)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    s = jnp.where(cols < num_valid, s, -jnp.inf)
    if approx:
        ts, ti = jax.lax.approx_max_k(s, k)
    else:
        ts, ti = jax.lax.top_k(s, k)
    return ts, ti.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "rel_model", "corrupt",
                                             "tile", "approx"))
def tiled_top_k(
    table: Array,
    fixed_emb: Array,
    rel_emb: Array,
    num_valid: Array,
    *,
    k: int,
    rel_model: str,
    corrupt: str,
    tile: int = 65536,
    approx: bool = False,
):
    """Streaming top-k candidates per query — the serving-path counterpart of
    tiled_rank_counts. Scans the candidate table in (tile, d) blocks, takes
    the in-tile top-k on-device, and merges with the running best via a
    (B, 2k) top-k — peak memory O(B * (tile + k)), never (B, N).

    approx=True swaps the in-tile selection to `lax.approx_max_k` (the
    TPU-native approximate top-k; default recall target 0.95 per tile) —
    measured on v5e at 4.8M candidates: 29 vs 52 ms for a single TransE
    query, 107 vs 132 ms at B=64. The cross-tile merge stays exact, so
    recall only drops when a true top-k member is missed *within* its tile.

    Returns (scores (B, k) float32 desc-sorted, ids (B, k) int32 global
    columns). Padding columns (>= num_valid) are excluded.
    """
    n_pad, d = table.shape
    b = fixed_emb.shape[0]
    if n_pad % tile != 0:
        raise ValueError(f"table rows {n_pad} not a multiple of tile {tile}; "
                         f"pad the table (a trailing partial tile would be "
                         f"silently skipped)")
    n_tiles = n_pad // tile

    def body(carry, tile_idx):
        best_s, best_i = carry
        start = tile_idx * tile
        tile_emb = jax.lax.dynamic_slice(table, (start, 0), (tile, d))
        s = score_tile(tile_emb, fixed_emb, rel_emb,
                       rel_model=rel_model, corrupt=corrupt)  # (B, tile)
        cols = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        s = jnp.where(cols < num_valid, s, -jnp.inf)
        if approx:
            ts, ti = jax.lax.approx_max_k(s, k)               # (B, k)
        else:
            ts, ti = jax.lax.top_k(s, k)                      # (B, k)
        ti = jnp.take_along_axis(jnp.broadcast_to(cols, (b, tile)), ti, axis=1)
        merged_s = jnp.concatenate([best_s, ts], axis=1)      # (B, 2k)
        merged_i = jnp.concatenate([best_i, ti], axis=1)
        ms, mi = jax.lax.top_k(merged_s, k)
        best_i = jnp.take_along_axis(merged_i, mi, axis=1)
        return (ms, best_i), None

    init = (jnp.full((b, k), -jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    (scores, ids), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return scores, ids

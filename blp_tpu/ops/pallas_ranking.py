"""Pallas TPU kernel: fused TransE rank-vs-all scoring + tie-aware counting.

The bilinear scorers ride the MXU as one matmul per tile (ops/ranking.py);
TransE's L1 distance cannot — its rank pass is a pure VPU workload with a
hard floor of 3 elementwise ops per (query, candidate, dim) element
(add, abs, accumulate). This kernel is built to stream at that floor:

  * the candidate table is laid out TRANSPOSED, (d, Np): each step of the
    static d-loop reads one contiguous (1, C) lane row — no strided access;
  * scoring is batch-vectorized: the accumulator is a (Bq, C) block
    (queries on sublanes, candidates on lanes) updated by a broadcast
    add+abs per dimension — no per-query fori_loop (the round-2 kernel's
    main sin, 184 ms);
  * BOTH eval directions are stacked into the query axis (Bq = 2B), so one
    table stream serves head- and tail-corruption and fills the sublanes;
  * the filtered correction moved OUT of the kernel (the O(B*F*tile)
    in-VMEM mask rebuild was the round-2 kernel's other sin). Exactness is
    preserved by ORDER-MATCHED scoring: `_seq_abs_scores` accumulates the
    L1 distance over d in exactly the kernel's order (an explicit
    dependency chain XLA may not reassociate), so a filter column's outside
    score is bit-identical to its in-stream score and the subtraction
    gt - fgt is exact by construction.

Measured A/B numbers at Wikidata5M scale live in PERFORMANCE.md
(tools/pallas_rank_bench.py reproduces them); the TransE default in
evaluation.py follows whichever path wins on hardware.

Exactness contract (same as ops/ranking.py): the true entity and filtered
known-true answers are excluded POSITIONALLY; the remaining float
sensitivity (a non-self candidate within accumulation error of the pivot)
is measure-zero and perturbs one rank by at most 0.5.

score(c; b) = -sum_d |c_d + u_d|  with  u = rel_b - fixed_b   (head corrupt)
                                        u = -(rel_b + fixed_b) (tail corrupt,
since score(h, c, r) = -sum|h + r - c| = -sum|c - (h + r)|).
The kernel accumulates the POSITIVE distance and compares against
r_b = -true_score_b:  score > true  <=>  dist < r.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: d-chunk height per grid step — bounds the kernel's live (Bq, C) VMEM
#: temporaries regardless of d while amortizing the accumulator
#: read-modify-write. Swept on v5e at Wikidata5M scale: DC 8/16/32 gave
#: 230/—/201 ms per bidir batch at tile=1024 (PERFORMANCE.md).
_DC = 32


def _kernel(u3_ref, r_ref, true_pos_ref, num_valid_ref, table_t_ref,
            counts_ref, acc_ref):
    """Grid: (candidate tiles, d chunks) — d innermost.

    u3_ref:       (DC, Bq, 1) VMEM — per-query offset chunk; the trailing
                  unit axis makes each u3_ref[jj] a NATIVE (Bq, 1) sublane
                  vector, so the (1, C) + (Bq, 1) outer broadcast lowers to
                  hardware lane/sublane splats — no 3-D temp, no relayout
    r_ref:        (Bq, 1)  VMEM — distance threshold (-true_score)
    true_pos_ref: (Bq, 1)  VMEM int32 global column of the true entity
    num_valid_ref:(1, 1)   SMEM int32
    table_t_ref:  (DC, C)  VMEM — transposed candidate tile chunk
    counts_ref:   (2, Bq)  VMEM int32 accumulators [gt, geq]
    acc_ref:      (Bq, C)  VMEM fp32 scratch — per-tile distance accumulator

    The per-chunk accumulation is an EXPLICIT sequential add chain (a
    jnp.sum could be reassociated; the explicit chain keeps the order
    replicable by _seq_abs_scores, which the exact filtered correction
    depends on). ~3 VPU ops per element — the workload's floor.
    """
    tile_i = pl.program_id(0)
    chunk_j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    _, C = table_t_ref.shape
    start = tile_i * C

    @pl.when((tile_i == 0) & (chunk_j == 0))
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    part = None
    for jj in range(_DC):
        term = jnp.abs(table_t_ref[jj:jj + 1, :] + u3_ref[jj])  # (Bq, C)
        part = term if part is None else part + term

    @pl.when(chunk_j == 0)
    def _():
        acc_ref[:, :] = part

    @pl.when(chunk_j > 0)
    def _():
        acc_ref[:, :] += part

    @pl.when(chunk_j == n_chunks - 1)
    def _():
        acc = acc_ref[:, :]
        cols = start + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        valid = (cols < num_valid_ref[0, 0]) & (cols != true_pos_ref[:, :])
        r = r_ref[:, :]
        gt = jnp.sum(jnp.where((acc < r) & valid, 1, 0), axis=1,
                     dtype=jnp.int32)
        geq = jnp.sum(jnp.where((acc <= r) & valid, 1, 0), axis=1,
                      dtype=jnp.int32)
        counts_ref[0:1, :] += gt[None, :]
        counts_ref[1:2, :] += geq[None, :]


def _seq_abs_scores(rows: jax.Array, u: jax.Array) -> jax.Array:
    """L1 distances accumulated over d in EXACTLY the kernel's order.

    rows: (B, F, d) candidate embeddings; u: (B, d). Returns (B, F) float32.
    Mirrors the kernel's TWO-LEVEL fp32 add order — an explicit chain over
    each _DC-dim chunk, then an explicit chain over chunks — so results are
    bit-identical to the in-stream scores, which makes the outside filter
    correction exact (module docstring). The kernel's d padding adds exact
    +0.0 terms (|0+0|), so the final partial chunk needs no padding here.
    """
    d = rows.shape[-1]
    acc = None
    for c0 in range(0, d, _DC):
        part = None
        for dd in range(c0, min(c0 + _DC, d)):
            t = jnp.abs(rows[:, :, dd] + u[:, dd:dd + 1])
            part = t if part is None else part + t
        acc = part if acc is None else acc + part
    return acc


def bidir_pivot_dists(head_emb: jax.Array, tail_emb: jax.Array,
                      rel_emb: jax.Array) -> jax.Array:
    """The (2B, 1) order-matched pivot distances the bidir kernel compares
    against: head-corruption rows first, then tail-corruption. Compute this
    GLOBALLY (from gathered true-entity embeddings) when the table is
    sharded — each shard's kernel must see the same pivot."""
    u = jnp.concatenate([_offset(tail_emb, rel_emb, "head"),
                         _offset(head_emb, rel_emb, "tail")], axis=0)
    own = jnp.concatenate([head_emb, tail_emb], axis=0)
    return _seq_abs_scores(own[:, None, :], u)


def prepare_table_t(table: jax.Array) -> jax.Array:
    """Transpose (Np, d) -> (d_pad, Np) with d padded to a multiple of _DC
    (zero rows contribute exactly 0 to every distance). Build this ONCE per
    candidate table and pass it to the rank functions via `table_t` — a
    per-batch transpose of a multi-GB table would dominate the pass."""
    d = table.shape[1]
    pad = (-d) % _DC
    table_t = table.T
    if pad:
        table_t = jnp.pad(table_t, ((0, pad), (0, 0)))
    return table_t


def _offset(fixed_emb, rel_emb, corrupt: str):
    if corrupt == "head":
        return rel_emb - fixed_emb       # score(c) = -sum|c + r - t|
    return -(rel_emb + fixed_emb)        # score(c) = -sum|c - (h + r)|


def _raw_counts(table_t, u, r, true_pos, num_valid, *, tile, interpret):
    d_pad, n_pad = table_t.shape
    if d_pad % _DC != 0:
        # A zero-size d grid would silently skip the kernel and return
        # uninitialized counts. Callers must pass prepare_table_t output.
        raise ValueError(
            f"table_t first dim {d_pad} not a multiple of {_DC}; build it "
            f"with prepare_table_t()")
    bq = u.shape[0]
    if u.shape[1] != d_pad:
        u = jnp.pad(u, ((0, 0), (0, d_pad - u.shape[1])))
    u3 = u.T[:, :, None]                                   # (d_pad, Bq, 1)
    # Mosaic lowering is TPU-only; fall back to interpret mode elsewhere so
    # the default eval path (TransE routes here) runs on the CPU test mesh.
    interpret = interpret or jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(n_pad // tile, d_pad // _DC),
        in_specs=[
            pl.BlockSpec((_DC, bq, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_DC, tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bq), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, bq), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bq, tile), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * bq * d_pad, bytes_accessed=n_pad * d_pad * 4,
            transcendentals=0),
    )(u3, r, true_pos, num_valid, table_t)


def _filter_counts(table, u, r, filter_pos):
    """Outside-the-kernel filtered correction, order-matched to the stream.

    Positions outside [0, len(table)) are ignored — sharded callers pass
    locally-translated positions where out-of-shard entries fall outside
    the local range (eval_parallel)."""
    n_pad = table.shape[0]
    rows = table[jnp.clip(filter_pos, 0, n_pad - 1)]       # (B, F, d)
    dist = _seq_abs_scores(rows, u)                        # (B, F)
    present = (filter_pos >= 0) & (filter_pos < n_pad)
    fgt = jnp.sum((dist < r) & present, axis=1, dtype=jnp.int32)
    fgeq = jnp.sum((dist <= r) & present, axis=1, dtype=jnp.int32)
    return fgt, fgeq


@functools.partial(jax.jit,
                   static_argnames=("corrupt", "tile", "interpret"))
def transe_tiled_rank_counts(
    table: jax.Array,
    fixed_emb: jax.Array,
    rel_emb: jax.Array,
    true_scores: jax.Array,
    true_pos: jax.Array,
    filter_pos: jax.Array,
    num_valid: jax.Array,
    *,
    corrupt: str,
    tile: int = 2048,
    interpret: bool = False,
    table_t: jax.Array | None = None,
) -> dict:
    """Drop-in Pallas replacement for ops.ranking.tiled_rank_counts with
    rel_model='transe'. Same signature contract and return dict.

    table_t: optionally the pre-transposed (d, Np) table — pass it when
    ranking many batches against one table so the transpose happens once
    per eval, not per batch.
    """
    n_pad, d = table.shape
    if n_pad % tile != 0:
        raise ValueError(f"table rows {n_pad} not a multiple of tile {tile}")
    b = fixed_emb.shape[0]
    if table_t is None:
        table_t = prepare_table_t(table)

    u = _offset(fixed_emb, rel_emb, corrupt)
    # The pivot distance is recomputed ORDER-MATCHED to the stream (not taken
    # from `true_scores`, whose XLA reduction order differs in ulp): entities
    # with mathematically equal scores — common under L2-normalized cluster
    # structure — must compare EQUAL to the pivot (tie, 0.5 rank credit),
    # not spuriously greater. `true_scores` is kept for API parity with
    # ops.ranking.tiled_rank_counts; its value is mathematically identical.
    del true_scores
    r = _seq_abs_scores(table[true_pos.reshape(b)][:, None, :], u)
    counts = _raw_counts(table_t, u, r,
                         true_pos.astype(jnp.int32).reshape(b, 1),
                         num_valid.astype(jnp.int32).reshape(1, 1),
                         tile=tile, interpret=interpret)
    fgt, fgeq = _filter_counts(table, u, r, filter_pos)
    return {"gt": counts[0], "geq": counts[1], "fgt": fgt, "fgeq": fgeq}


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def transe_tiled_rank_counts_bidir(
    table: jax.Array,
    head_emb: jax.Array,
    tail_emb: jax.Array,
    rel_emb: jax.Array,
    h_true_scores: jax.Array,
    t_true_scores: jax.Array,
    head_pos: jax.Array,
    tail_pos: jax.Array,
    heads_filter: jax.Array,
    tails_filter: jax.Array,
    num_valid: jax.Array,
    *,
    tile: int = 2048,
    interpret: bool = False,
    table_t: jax.Array | None = None,
    pivot_dists: jax.Array | None = None,
) -> dict:
    """Both-direction TransE rank counts in ONE kernel stream: the two
    directions' offset vectors are stacked on the query axis (Bq = 2B), so
    each table tile is read once and the (Bq, C) accumulator fills the
    VPU sublanes. Same return contract as
    ops.ranking.tiled_rank_counts_bidir ('h_'/'t_' prefixed gt/geq/fgt/fgeq).

    pivot_dists: optionally the precomputed (2B, 1) order-matched pivot
    distances (bidir_pivot_dists) — sharded callers must compute the pivot
    GLOBALLY once (the true entity's row lives on one shard) and pass it to
    every shard's kernel call.
    """
    n_pad, d = table.shape
    if n_pad % tile != 0:
        raise ValueError(f"table rows {n_pad} not a multiple of tile {tile}")
    b = head_emb.shape[0]
    if table_t is None:
        table_t = prepare_table_t(table)

    # Head-corruption ranks candidates against the fixed TAIL; tail-
    # corruption against the fixed HEAD (see ops/ranking.py call sites).
    u = jnp.concatenate([_offset(tail_emb, rel_emb, "head"),
                         _offset(head_emb, rel_emb, "tail")], axis=0)
    pos = jnp.concatenate([head_pos, tail_pos]).astype(jnp.int32)
    # Order-matched pivot (see transe_tiled_rank_counts): exact ties must
    # compare equal against the stream's distances.
    del h_true_scores, t_true_scores
    if pivot_dists is None:
        r = _seq_abs_scores(table[pos][:, None, :], u)
    else:
        r = pivot_dists.reshape(2 * b, 1)
    counts = _raw_counts(table_t, u, r, pos.reshape(2 * b, 1),
                         num_valid.astype(jnp.int32).reshape(1, 1),
                         tile=tile, interpret=interpret)
    filt = jnp.concatenate([heads_filter, tails_filter], axis=0)
    fgt, fgeq = _filter_counts(table, u, r, filt)
    return {
        "h_gt": counts[0, :b], "h_geq": counts[1, :b],
        "h_fgt": fgt[:b], "h_fgeq": fgeq[:b],
        "t_gt": counts[0, b:], "t_geq": counts[1, b:],
        "t_fgt": fgt[b:], "t_fgeq": fgeq[b:],
    }

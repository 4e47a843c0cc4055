"""Pallas TPU kernel: fused TransE rank-vs-all scoring + tie-aware counting.

The bilinear scorers ride the MXU as one matmul per tile (ops/ranking.py);
TransE's L1 distance cannot. This kernel fuses score + count on-chip: the
candidate table streams HBM -> VMEM tile by tile (Pallas double-buffers the
grid automatically), scores are formed and reduced to the four count
accumulators without ever leaving VMEM.

STATUS — not the default path. Measured at Wikidata5M scale on v5e
(N=4.8M, B=64, d=128) XLA's fused broadcast-L1 + reduce runs at ~68% of
fp32 VPU speed-of-light (95 ms/pass) and beats this kernel (184 ms): the
per-batch-row fori_loop and the O(B*F*tile) filter-mask rebuild dominate.
Kept as a correctness-tested reference implementation and dispatchable via
use_pallas=True (evaluation.py); a competitive version needs a
(d, tile)-transposed table layout and batch-vectorized scoring.

Exactness contract (same as ops/ranking.py): the true entity and filtered
known-true answers are excluded POSITIONALLY — the filter correction reads the
very same in-kernel scores — so filtered metrics are exact by construction
regardless of float accumulation order.

score(c; b) = -sum_d |c_d + u_d|  with  u = rel_b - fixed_b   (head corrupt)
                                        u = -(rel_b + fixed_b) (tail corrupt,
since score(h, c, r) = -sum|h + r - c| = -sum|c - (h + r)|).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, true_scores_ref, true_pos_ref, filter_ref, num_valid_ref,
            table_ref, counts_ref):
    """Grid: one step per table tile.

    u_ref:        (B, d)    VMEM  — per-query offset vector (see module doc)
    true_scores_ref: (B, 1) VMEM
    true_pos_ref: (B, 1)    VMEM  int32 global column of the true entity
    filter_ref:   (B, F)    VMEM  int32 global filtered columns, -1 padded
    num_valid_ref:(1, 1)    SMEM  int32
    table_ref:    (tile, d) VMEM  — current candidate tile (auto-DMA'd)
    counts_ref:   (4, B)    VMEM  int32 accumulators [gt, geq, fgt, fgeq]
    """
    tile_i = pl.program_id(0)
    tile, d = table_ref.shape
    b_total = u_ref.shape[0]
    start = tile_i * tile

    @pl.when(tile_i == 0)
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    num_valid = num_valid_ref[0, 0]
    cols = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)  # (1,tile)
    table = table_ref[:, :]  # (tile, d)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (1, b_total), 1)

    def body(b, acc):
        gt_a, geq_a, fgt_a, fgeq_a = acc
        u = u_ref[b, :]                                   # (d,)
        s = -jnp.sum(jnp.abs(table + u[None, :]), axis=1,
                     keepdims=True).T                     # (1, tile)
        t_s = true_scores_ref[b, 0]
        valid = (cols < num_valid) & (cols != true_pos_ref[b, 0])
        gt = jnp.sum(jnp.where((s > t_s) & valid, 1, 0), dtype=jnp.int32)
        geq = jnp.sum(jnp.where((s >= t_s) & valid, 1, 0), dtype=jnp.int32)

        # Filtered columns inside this tile -> mask over the tile, built by
        # comparison (no dynamic gather on TPU).
        fcols = filter_ref[b, :]                          # (F,)
        fmask = jnp.any(fcols[:, None] == cols, axis=0)[None, :]  # (1, tile)
        fgt = jnp.sum(jnp.where((s > t_s) & fmask, 1, 0), dtype=jnp.int32)
        fgeq = jnp.sum(jnp.where((s >= t_s) & fmask, 1, 0), dtype=jnp.int32)

        # Scatter the four scalars into lane b via one-hot adds (scalar VMEM
        # stores don't lower on TPU).
        onehot = b_iota == b
        return (gt_a + jnp.where(onehot, gt, 0),
                geq_a + jnp.where(onehot, geq, 0),
                fgt_a + jnp.where(onehot, fgt, 0),
                fgeq_a + jnp.where(onehot, fgeq, 0))

    zeros = jnp.zeros((1, b_total), jnp.int32)
    gt_v, geq_v, fgt_v, fgeq_v = jax.lax.fori_loop(
        0, b_total, body, (zeros, zeros, zeros, zeros))
    counts_ref[0:1, :] += gt_v
    counts_ref[1:2, :] += geq_v
    counts_ref[2:3, :] += fgt_v
    counts_ref[3:4, :] += fgeq_v


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
    tile: int = 512,
    interpret: bool = False,
) -> dict:
    """Drop-in Pallas replacement for ops.ranking.tiled_rank_counts with
    rel_model='transe'. Same signature contract and return dict."""
    n_pad, d = table.shape
    if n_pad % tile != 0:
        raise ValueError(f"table rows {n_pad} not a multiple of tile {tile}")
    if tile > 16384:
        # The in-kernel (F, tile) filter-mask broadcast exhausts VMEM beyond
        # this; the XLA path (ops/ranking.py, the default) handles any tile.
        raise ValueError(f"pallas ranking kernel supports tile <= 16384, got {tile}")
    b = fixed_emb.shape[0]

    if corrupt == "head":
        u = rel_emb - fixed_emb          # score(c) = -sum|c + r - t|
    else:
        u = -(rel_emb + fixed_emb)       # score(c) = -sum|c - (h + r)|

    counts = pl.pallas_call(
        _kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, filter_pos.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, b), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * b * d, bytes_accessed=n_pad * d * 4,
            transcendentals=0),
    )(
        u,
        true_scores.astype(jnp.float32),
        true_pos.astype(jnp.int32).reshape(b, 1),
        filter_pos.astype(jnp.int32),
        num_valid.astype(jnp.int32).reshape(1, 1),
        table,
    )
    return {"gt": counts[0], "geq": counts[1],
            "fgt": counts[2], "fgeq": counts[3]}

"""Candidate-sharded full-ranking evaluation via shard_map + psum.

This is the TPU-native answer to the reference's (B, N) dense eval
(reference: train.py:146-165) at Wikidata5M scale: the candidate table's row
axis is sharded across ALL devices (data*model flattened), each device runs
the local tiled tie-aware counts over its (N/D, d) slice — including its
share of the filtered known-true answers — and the integer counts are
psum-reduced. Because the rank decomposes into per-shard sums
(blp_tpu/metrics.py), the result is bit-identical to the single-device
evaluator; no global (B, N) anything, no gather of the table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blp_tpu.ops import ranking

def shard_entity_table(table, mesh: Mesh):
    """Place an (Np, d) table with rows sharded across every device (all mesh
    axes flattened — works for (data, model) and (data, pipe) meshes alike).
    Np must be a multiple of the device count (pad with rows >= num_valid)."""
    return jax.device_put(table, NamedSharding(mesh, P(mesh.axis_names)))


_ENCODE_CACHE: dict = {}


def replicate(tree, mesh: Mesh):
    """Commit a pytree to every device of the mesh (fully replicated)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_encode(mesh: Mesh, cfg):
    """Mesh-parallel phase-1 candidate encoding.

    Returns fn(params, tok, mask) -> (E, d) embeddings with rows sharded over
    every device (all mesh axes flattened): the chunk's batch axis is committed
    to P(axes), so GSPMD runs the encoder data-parallel — each device encodes
    its (E/D, L) slice, no collectives in the body — and the output rows come
    back sharded the same way, ready for `shard_entity_table`. This
    parallelizes the expensive phase of full-ranking eval (the reference
    encodes all candidates on one device, train.py:95-123); at Wikidata5M
    scale phase 1 is ~330 s of a 428 s single-chip eval.

    The chunk's row count must be a multiple of the device count (use
    `chunk_multiple` in build_entity_table). `params` should be committed once
    via `replicate(params, mesh)` to avoid a per-chunk host transfer.
    Cached per (mesh, cfg) so jit compiles once per shape set.
    """
    key = (mesh, cfg)
    if key in _ENCODE_CACHE:
        return _ENCODE_CACHE[key]

    from blp_tpu.models import blp

    axes = tuple(mesh.axis_names)
    rows = NamedSharding(mesh, P(axes))

    # shard_map (not bare GSPMD propagation): the encode body has no
    # cross-device communication — each device runs the full single-device
    # program on its row slice, so the Pallas kernels inside the
    # fast_inference path (ops/pallas_attention.py) execute per shard
    # instead of forcing GSPMD to replicate an unpartitionable custom call.
    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(axes), P(axes)), out_specs=P(axes),
                       check_vma=False)
    def encode(params, tok, mask):
        return blp.encode(params, cfg, tok, mask, deterministic=True)

    def fn(params, tok, mask):
        tok = jax.device_put(jnp.asarray(tok), rows)
        mask = jax.device_put(jnp.asarray(mask), rows)
        return encode(params, tok, mask)

    _ENCODE_CACHE[key] = fn
    return fn


def make_sharded_rank_counts(mesh: Mesh, *, rel_model: str, corrupt: str,
                             tile: int):
    """Build the sharded counting function.

    fn(table, fixed_emb, rel_emb, true_scores, true_pos, filter_pos, num_valid)
      -> dict of (B,) global counts {gt, geq, fgt, fgeq}

    table: (Np, d) sharded over all mesh axes; everything else replicated.
    true_pos / filter_pos are GLOBAL candidate positions; each shard
    translates them into its local frame via its axis index.
    """
    axes = tuple(mesh.axis_names)

    def local_counts(table_l, fixed_emb, rel_emb, true_scores, true_pos,
                     filter_pos, num_valid):
        # Flattened shard index along the candidate axis (row-major over the
        # mesh axes, matching the P(axes) placement).
        shard = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            shard = shard * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        rows = table_l.shape[0]
        offset = shard * rows

        local_true = true_pos - offset
        local_filter = jnp.where(filter_pos >= 0, filter_pos - offset, -1)
        # Out-of-shard positions fall outside [0, rows) and are ignored by the
        # in-tile position checks; clamp num_valid into the local frame.
        local_valid = jnp.clip(num_valid - offset, 0, rows)

        c = ranking.tiled_rank_counts(
            table_l, fixed_emb, rel_emb, true_scores,
            local_true, local_filter, local_valid,
            rel_model=rel_model, corrupt=corrupt, tile=tile)
        return {k: jax.lax.psum(v, axes) for k, v in c.items()}

    fn = shard_map(
        local_counts, mesh=mesh,
        in_specs=(P(axes), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        # The scan carry inside tiled_rank_counts starts replicated and
        # becomes shard-varying; psum restores replication at the end, so the
        # varying-manual-axes check is disabled rather than threading pcast
        # through a function also used outside shard_map.
        check_vma=False,
    )
    return jax.jit(fn)


def shard_entity_table_t(table_t, mesh: Mesh):
    """Place a transposed (d_pad, Np) table with CANDIDATE columns sharded
    across every device — the Pallas rank kernel's stream layout
    (ops/pallas_ranking.py::prepare_table_t builds table_t; shard it once
    per eval)."""
    return jax.device_put(table_t, NamedSharding(mesh, P(None, mesh.axis_names)))


def make_sharded_rank_counts_bidir_pallas(mesh: Mesh, *, tile: int):
    """Candidate-sharded BOTH-direction TransE counting through the Pallas
    rank kernel (2.5x the XLA stream on v5e, PERFORMANCE.md): each device
    runs the kernel over its (rows, d) table slice + (d_pad, rows)
    transposed slice, then counts psum. The pivot distances must be computed
    globally (pallas_ranking.bidir_pivot_dists) — the true entity's row
    lives on one shard — and are replicated to every device; all shards
    then compare against bit-identical pivots, preserving the exactness
    contract.

    fn(table, table_t, head_emb, tail_emb, rel_emb, pivot, head_pos,
       tail_pos, heads_filter, tails_filter, num_valid)
      -> dict of (B,) global counts with 'h_'/'t_' prefixed gt/geq/fgt/fgeq.
    """
    from blp_tpu.ops import pallas_ranking

    axes = tuple(mesh.axis_names)

    def local_counts(table_l, table_t_l, head_emb, tail_emb, rel_emb, pivot,
                     head_pos, tail_pos, heads_filter, tails_filter,
                     num_valid):
        shard = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            shard = shard * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        rows = table_l.shape[0]
        offset = shard * rows

        # Out-of-shard positions land outside [0, rows) and are ignored by
        # the kernel's validity check / the filter bound check.
        local_head = head_pos - offset
        local_tail = tail_pos - offset
        big = jnp.iinfo(jnp.int32).max
        local_hf = jnp.where(heads_filter >= 0, heads_filter - offset, big)
        local_tf = jnp.where(tails_filter >= 0, tails_filter - offset, big)
        local_valid = jnp.clip(num_valid - offset, 0, rows)
        b = head_emb.shape[0]

        c = pallas_ranking.transe_tiled_rank_counts_bidir(
            table_l, head_emb, tail_emb, rel_emb,
            jnp.zeros((b, 1), jnp.float32), jnp.zeros((b, 1), jnp.float32),
            local_head, local_tail, local_hf, local_tf, local_valid,
            tile=tile, table_t=table_t_l, pivot_dists=pivot)
        return {k: jax.lax.psum(v, axes) for k, v in c.items()}

    fn = shard_map(
        local_counts, mesh=mesh,
        in_specs=(P(axes), P(None, axes)) + (P(),) * 9,
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_rank_counts_bidir(mesh: Mesh, *, rel_model: str, tile: int):
    """Both-direction sharded counting in ONE local table stream per device
    (see ops/ranking.py::tiled_rank_counts_bidir — the bilinear rank pass is
    table-read-bound, so fusing the directions ~halves it; the psum count
    semantics are unchanged).

    fn(table, head_emb, tail_emb, rel_emb, h_true_scores, t_true_scores,
       head_pos, tail_pos, heads_filter, tails_filter, num_valid)
      -> dict of (B,) global counts with 'h_'/'t_' prefixed gt/geq/fgt/fgeq.
    """
    axes = tuple(mesh.axis_names)

    def local_counts(table_l, head_emb, tail_emb, rel_emb, h_true, t_true,
                     head_pos, tail_pos, heads_filter, tails_filter,
                     num_valid):
        shard = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            shard = shard * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        rows = table_l.shape[0]
        offset = shard * rows

        local_head = head_pos - offset
        local_tail = tail_pos - offset
        local_hf = jnp.where(heads_filter >= 0, heads_filter - offset, -1)
        local_tf = jnp.where(tails_filter >= 0, tails_filter - offset, -1)
        local_valid = jnp.clip(num_valid - offset, 0, rows)

        c = ranking.tiled_rank_counts_bidir(
            table_l, head_emb, tail_emb, rel_emb, h_true, t_true,
            local_head, local_tail, local_hf, local_tf, local_valid,
            rel_model=rel_model, tile=tile)
        return {k: jax.lax.psum(v, axes) for k, v in c.items()}

    fn = shard_map(
        local_counts, mesh=mesh,
        in_specs=(P(axes),) + (P(),) * 10,
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)

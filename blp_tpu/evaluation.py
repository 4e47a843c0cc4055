"""Two-phase full-ranking link-prediction evaluation.

Phase 1 encodes every candidate entity into an (N, d) table in fixed-size
chunks (one jit compile); phase 2 streams each eval batch against the table
with tiled tie-aware rank counts (blp_tpu/ops/ranking.py) and sparse filtered
corrections. Mirrors the reference evaluator's semantics exactly
(reference: train.py:57-243) — raw + filtered MRR/hits@{1,3,10}, the
head-corruption-first ordering of reciprocals, new-entity and
relation-category breakdowns — without ever materializing (B, N) scores.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from blp_tpu import metrics
from blp_tpu.data.filtering import FilterIndex, build_filters
from blp_tpu.models import blp
from blp_tpu.ops import ranking
from blp_tpu.utils import make_ent2idx

HIT_POSITIONS = (1, 3, 10)


@dataclasses.dataclass
class EvalResult:
    mrr: float
    hits: dict[int, float]
    mrr_filt: float | None = None
    hits_filt: dict[int, float] | None = None
    mrr_by_position: np.ndarray | None = None   # (3,) both/head/tail-new
    mrr_by_category: np.ndarray | None = None   # (2, 4)
    ent_emb: np.ndarray | None = None
    entities: np.ndarray | None = None

    def scalars(self, prefix: str) -> dict[str, float]:
        out = {f"{prefix}_mrr": self.mrr}
        for k, v in self.hits.items():
            out[f"{prefix}_hits@{k}"] = v
        if self.mrr_filt is not None:
            out[f"{prefix}_mrr_filt"] = self.mrr_filt
            for k, v in self.hits_filt.items():
                out[f"{prefix}_hits@{k}_filt"] = v
        if self.mrr_by_position is not None:
            for i, name in enumerate(("both_new", "head_new", "tail_new")):
                out[f"{prefix}_mrr_filt_{name}"] = float(self.mrr_by_position[i])
        if self.mrr_by_category is not None:
            # Per-relation-category breakdown, pred_head/pred_tail x the 4
            # cardinality categories (reference prints these after filtered
            # eval, train.py:228-236; key form mirrors its log labels).
            from blp_tpu.data.datasets import CATEGORY_IDS

            for case_i, case in enumerate(("pred_head", "pred_tail")):
                for cat, cat_id in CATEGORY_IDS.items():
                    out[f"{prefix}_{case}_{cat}_mrr"] = float(
                        self.mrr_by_category[case_i, cat_id])
        return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_entity_table(
    encode_batch: Callable[[np.ndarray, np.ndarray], jax.Array],
    text_data,
    entities: np.ndarray,
    *,
    emb_batch_size: int,
    dim: int,
    pad_to: int = 1,
    chunk_multiple: int = 256,
    log=None,
) -> jax.Array:
    """Encode all candidate entities into an (Np, d) table.

    encode_batch: jitted (tok (E, L), mask (E, L)) -> (E, d). Chunks are
    padded to emb_batch_size so the encoder compiles once
    (reference phase 1: train.py:95-123). chunk_multiple forces the chunk to
    a multiple (mesh encodes need rows divisible by the device count).
    """
    n = len(entities)
    n_pad = _round_up(max(n, 1), pad_to)
    # Clamp the chunk to the candidate count (rounded for clean layout): the
    # 2048 default is tuned for multi-million-entity table builds; on a
    # 135-entity UMLS graph it would make every encoder call 93% padding.
    # Round UP only to chunk_multiple itself (the mesh divisibility need);
    # a user-chosen small encode batch is a memory knob and must survive
    # (ADVICE r03: max(256, ...) silently inflated emb_batch_size=16 16x).
    emb_batch_size = min(_round_up(emb_batch_size, chunk_multiple),
                         _round_up(max(n, 1), chunk_multiple))
    # Chunks stay on device (async dispatch pipelines encoder compute), and
    # the HOST side — description gathers + the host->device transfer — runs
    # double-buffered on a prefetch thread (data/prefetch.py). Async dispatch
    # alone overlaps device compute but leaves each chunk's numpy gather and
    # transfer on the dispatch critical path: at W5M scale that gap was ~13%
    # of end-to-end phase 1 (22.4k vs 25.9k on-device entities/s,
    # PERFORMANCE.md); prefetching closes it.
    from blp_tpu.data import prefetch

    def host_chunks():
        for start in range(0, n, emb_batch_size):
            ids = entities[start : start + emb_batch_size]
            tok, mask = text_data.get_entity_descriptions(ids)
            if len(ids) < emb_batch_size:
                pad = emb_batch_size - len(ids)
                tok = np.pad(tok, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
                mask[len(ids):, 0] = 1.0  # avoid 0/0 in mean-pool encoders
            yield tok, mask, len(ids)

    def place(item):
        tok, mask, real = item
        return jnp.asarray(tok), jnp.asarray(mask), real

    chunks = []
    done = 0
    for ci, (tok, mask, real) in enumerate(prefetch.prefetch_to_device(
            host_chunks(), placement=place)):
        chunks.append(encode_batch(tok, mask)[:real])
        done += real
        if log and ci % 20 == 0:
            log.info(f"[encode {done:,}/{n:,}]")
    if not chunks:
        return jnp.zeros((n_pad, dim), jnp.float32)
    table = jnp.concatenate(chunks, axis=0)
    if n_pad > n:
        table = jnp.pad(table, ((0, n_pad - n), (0, 0)))
    return table


def _unstack_for_encode(params: dict) -> dict:
    """Per-layer (unstacked) BERT weight view for the phase-1 encode loop:
    the straight-line layer chain beats the rolled scan forward-only too
    (25.9k vs 23.7k entities/s on v5e with the fast_inference layer — the
    scan's carried-weight copies cost ~9%). View only (no-op if already
    unstacked) — canonical storage stays stacked."""
    from blp_tpu import training

    return training.unstack_params(params)


_MESH_RANK_CACHE: dict = {}


def _mesh_rank_batch(mesh, rel_model: str, tile: int, use_pallas: bool = False):
    """Jitted per-batch raw+filtered counting over a candidate-sharded table
    (shard_map + psum inside). use_pallas routes TransE through the Pallas
    kernel on every shard (pivot computed globally, order-matched). Cached
    per (mesh, rel_model, tile, use_pallas)."""
    key = (mesh, rel_model, tile, use_pallas)
    if key in _MESH_RANK_CACHE:
        return _MESH_RANK_CACHE[key]

    from blp_tpu.parallel import eval_parallel

    if use_pallas:
        from blp_tpu.ops import pallas_ranking

        count_fn = eval_parallel.make_sharded_rank_counts_bidir_pallas(
            mesh, tile=_pallas_tile(tile))

        @jax.jit
        def fn(table, head_pos, tail_pos, rel_table, rel_ids, num_valid,
               heads_filter, tails_filter, table_t):
            rel_emb = rel_table[rel_ids]
            head_emb = table[head_pos]
            tail_emb = table[tail_pos]
            pivot = pallas_ranking.bidir_pivot_dists(head_emb, tail_emb,
                                                     rel_emb)
            c = count_fn(table, table_t, head_emb, tail_emb, rel_emb, pivot,
                         head_pos, tail_pos, heads_filter, tails_filter,
                         num_valid)
            return {k: v + 1 if k.endswith("_geq") else v
                    for k, v in c.items()}

        _MESH_RANK_CACHE[key] = fn
        return fn

    count_fn = eval_parallel.make_sharded_rank_counts_bidir(
        mesh, rel_model=rel_model, tile=tile)

    @jax.jit
    def fn(table, head_pos, tail_pos, rel_table, rel_ids, num_valid,
           heads_filter, tails_filter):
        # rel gather happens in-jit: an eager table[ids] in the host loop is
        # a separate tiny device execution per batch (dispatch round-trip).
        rel_emb = rel_table[rel_ids]
        head_emb = table[head_pos]
        tail_emb = table[tail_pos]
        h_true = ranking.score_pairs(
            head_emb, tail_emb, rel_emb, rel_model=rel_model,
            corrupt="head")[:, None]
        t_true = ranking.score_pairs(
            tail_emb, head_emb, rel_emb, rel_model=rel_model,
            corrupt="tail")[:, None]
        c = count_fn(table, head_emb, tail_emb, rel_emb, h_true, t_true,
                     head_pos, tail_pos, heads_filter, tails_filter,
                     num_valid)
        # Self-tie: +1 to geq in both settings (reference: utils.py:104-105).
        return {k: v + 1 if k.endswith("_geq") else v for k, v in c.items()}

    _MESH_RANK_CACHE[key] = fn
    return fn


def _use_pallas_default(rel_model: str) -> bool:
    """The Pallas rank kernel (ops/pallas_ranking.py) is the default for
    TransE: its batch-vectorized transposed-layout stream measured 1.5x the
    XLA broadcast-L1 fusion at Wikidata5M scale on v5e (PERFORMANCE.md).
    The bilinear scorers collapse to MXU matmuls, where the XLA path already
    runs at the table-read bound — no kernel needed."""
    return rel_model == "transe"


def _pallas_tile(tile: int) -> int:
    """Largest kernel tile <= 1024 dividing `tile`, so the table padding (a
    multiple of `tile`) stays a multiple of the kernel tile for ANY user
    tile. 1024 lanes was the fastest measured width on v5e (PERFORMANCE.md);
    bigger tiles blow the kernel's scoped VMEM."""
    return next(t for t in range(min(tile, 1024), 0, -1) if tile % t == 0)


@functools.partial(jax.jit, static_argnames=("rel_model", "tile", "use_pallas"))
def _rank_batch(
    table, head_pos, tail_pos, rel_table, rel_ids, num_valid,
    heads_filter, tails_filter, *, rel_model: str, tile: int,
    use_pallas: bool = False, table_t=None,
):
    """Raw + filtered rank counts for one eval batch, both directions.

    Returns dict of (B,) arrays; 'h_' prefixes head-corruption (predict the
    head given (?, t, r)), 't_' tail-corruption. Both paths stream the table
    ONCE for the two directions; use_pallas routes TransE through the Pallas
    kernel (table_t: the pre-transposed table, built once per eval).
    """
    rel_emb = rel_table[rel_ids]
    head_emb = table[head_pos]
    tail_emb = table[tail_pos]

    h_true = ranking.score_pairs(
        head_emb, tail_emb, rel_emb, rel_model=rel_model,
        corrupt="head")[:, None]
    t_true = ranking.score_pairs(
        tail_emb, head_emb, rel_emb, rel_model=rel_model,
        corrupt="tail")[:, None]
    if use_pallas:
        from blp_tpu.ops import pallas_ranking

        c = pallas_ranking.transe_tiled_rank_counts_bidir(
            table, head_emb, tail_emb, rel_emb, h_true, t_true,
            head_pos, tail_pos, heads_filter, tails_filter, num_valid,
            tile=_pallas_tile(tile), table_t=table_t)
    else:
        # Fused both-direction stream: one pass over the table instead of
        # two (the bilinear rank pass is table-read-bound; see
        # ops/ranking.py::tiled_rank_counts_bidir).
        c = ranking.tiled_rank_counts_bidir(
            table, head_emb, tail_emb, rel_emb, h_true, t_true,
            head_pos, tail_pos, heads_filter, tails_filter, num_valid,
            rel_model=rel_model, tile=tile)
    # Self-tie: the true entity contributes exactly 1 to geq in both the
    # raw and filtered settings (reference: utils.py:104-105 counts it
    # via scores >= true at the self position).
    return {k: v + 1 if k.endswith("_geq") else v for k, v in c.items()}


def eval_link_prediction(
    params: dict,
    cfg: blp.ModelConfig,
    eval_triples: np.ndarray,
    text_data,
    entities: np.ndarray,
    *,
    batch_size: int = 64,
    emb_batch_size: int = 2048,
    tile: int = 65536,
    filter_index: FilterIndex | None = None,
    new_entities: np.ndarray | None = None,
    rel_categories: np.ndarray | None = None,
    max_num_batches: int | None = None,
    return_embeddings: bool = False,
    ent_emb: jax.Array | None = None,
    use_pallas: bool | None = None,
    mesh=None,
    log=None,
) -> EvalResult:
    """Full-ranking evaluation over a candidate entity set.

    Args:
      eval_triples: (T, 3) [head, tail, rel].
      entities: candidate entity ids (the ranking universe).
      filter_index: known-true triples for filtered metrics (None = raw only).
      new_entities: entity ids unseen in training, for the position breakdown.
      rel_categories: (num_rels,) category ids for the category breakdown.
      ent_emb: optionally a precomputed (padded) candidate table.
      mesh: optional jax.sharding.Mesh — shards the candidate table's rows
        over every device and psums the decomposed rank counts
        (blp_tpu/parallel/eval_parallel.py); results are bit-identical to the
        single-device path.
    """
    compute_filtered = filter_index is not None
    max_ent_id = int(max(entities.max(), eval_triples[:, :2].max()))
    ent2idx = make_ent2idx(entities, max_ent_id)
    n = len(entities)
    # Clamp the tile to the candidate count (rounded for clean layout):
    # padding a 135-entity UMLS table to the Wikidata5M-sized default tile
    # would multiply every rank pass by tile/n in pure wasted work.
    tile = min(tile, _round_up(max(n, 1), 256))
    pad_unit = tile if mesh is None else tile * mesh.devices.size
    n_pad = _round_up(n, pad_unit)

    if ent_emb is None:
        if cfg.is_inductive:
            # 4 keeps BERT seq-packing engaged (embed_inputs packs only when
            # B % 4 == 0) without inflating a user-chosen small encode batch
            # (ADVICE r03): 16 stays 16, 10 becomes 12 — never 16x.
            chunk_multiple = 4
            if mesh is not None:
                # Phase 1 sharded over the mesh: each device encodes its slice
                # of every chunk (GSPMD data-parallel; the reference builds the
                # whole table on one device, train.py:95-123). Chunk rows must
                # divide over devices — 4x for BERT seq packing per shard.
                from blp_tpu.parallel import eval_parallel

                params_r = eval_parallel.replicate(_unstack_for_encode(params),
                                                   mesh)
                sharded_encode = eval_parallel.make_sharded_encode(mesh, cfg)
                chunk_multiple = 4 * mesh.devices.size

                def encode_batch(tok, mask):
                    return sharded_encode(params_r, tok, mask)
            else:
                params_enc = _unstack_for_encode(params)

                def encode_batch(tok, mask):
                    return blp.encode_jit(params_enc, cfg, tok, mask)

            ent_emb = build_entity_table(
                encode_batch, text_data, entities,
                emb_batch_size=emb_batch_size, dim=cfg.entity_dim,
                pad_to=pad_unit, chunk_multiple=chunk_multiple, log=log)
        else:
            table = blp.encode_entity_ids(params, cfg, jnp.asarray(entities))
            ent_emb = jnp.pad(table, ((0, n_pad - n), (0, 0)))
    elif ent_emb.shape[0] != n_pad:
        # A caller-provided table may be padded for a LARGER tile than the
        # clamped one (build_entity_table pads to the caller's pad_to); any
        # multiple of pad_unit works — only pad up, never truncate real rows.
        target = max(n_pad, _round_up(int(ent_emb.shape[0]), pad_unit))
        if target > int(ent_emb.shape[0]):
            ent_emb = jnp.pad(ent_emb, ((0, target - int(ent_emb.shape[0])), (0, 0)))

    if mesh is not None:
        from blp_tpu.parallel import eval_parallel

        ent_emb = eval_parallel.shard_entity_table(ent_emb, mesh)

    rel_emb_table = params["rel_emb"]
    num_valid = jnp.asarray(n, jnp.int32)

    # Mosaic requires the kernel's (d, C) table block to have C % 128 == 0
    # or C == Np (lane-tiling constraint); tiny candidate sets fall back to
    # the XLA stream rather than failing to lower on hardware. (Under a
    # mesh, each shard's local rows are a multiple of `tile`, so only the
    # 128-multiple form applies.)
    pt = _pallas_tile(tile)
    pallas_lowers = pt % 128 == 0 or (mesh is None and pt == n_pad)
    if use_pallas is None:
        use_pallas = pallas_lowers and _use_pallas_default(cfg.rel_model)
    elif use_pallas:
        if cfg.rel_model != "transe":
            raise ValueError("use_pallas=True requires rel_model='transe' "
                             "(the kernel implements the L1 stream; bilinear "
                             "scorers already ride the MXU)")
        if not pallas_lowers:
            raise ValueError(
                f"use_pallas=True needs a kernel tile divisible by 128 "
                f"(got {pt} from tile={tile}); raise `tile` or pad the "
                f"candidate set")
    ent_emb_t = None
    if use_pallas:
        # One transpose per eval (two HBM passes) buys the kernel its
        # contiguous (d_pad, Np) stream layout for every batch; under a
        # mesh the transposed copy is candidate-sharded like the table.
        from blp_tpu.ops import pallas_ranking

        ent_emb_t = pallas_ranking.prepare_table_t(ent_emb)
        if mesh is not None:
            from blp_tpu.parallel import eval_parallel

            ent_emb_t = eval_parallel.shard_entity_table_t(ent_emb_t, mesh)
    if mesh is not None:
        mesh_rank = _mesh_rank_batch(mesh, cfg.rel_model, tile,
                                     use_pallas=use_pallas)

    total_gt, total_geq = [], []
    filt_gt, filt_geq = [], []
    triples_seen = []
    pending_counts = []

    t_total = len(eval_triples)
    n_batches = -(-t_total // batch_size)
    if max_num_batches is not None:
        n_batches = min(n_batches, max_num_batches)

    filter_pad = 8
    if compute_filtered:
        # One bucketed width across all batches -> one jit compile.
        hf_all, tf_all = build_filters(eval_triples, filter_index, ent2idx)
        filter_pad = max(hf_all.shape[1], tf_all.shape[1])
    empty_filters = np.full((batch_size, filter_pad), -1, np.int32)

    for bi in range(n_batches):
        batch = eval_triples[bi * batch_size : (bi + 1) * batch_size]
        real = len(batch)
        if real < batch_size:  # pad; padded rows sliced off below
            batch = np.concatenate([batch, np.repeat(batch[-1:], batch_size - real, 0)])
        head_pos = ent2idx[batch[:, 0]]
        tail_pos = ent2idx[batch[:, 1]]
        assert head_pos.min() >= 0 and tail_pos.min() >= 0, \
            "eval triple references an entity outside the candidate set"

        if compute_filtered:
            hf, tf = build_filters(batch, filter_index, ent2idx, pad_width=filter_pad)
        else:
            hf = tf = empty_filters

        if mesh is not None:
            extra = (ent_emb_t,) if use_pallas else ()
            counts = mesh_rank(
                ent_emb, jnp.asarray(head_pos), jnp.asarray(tail_pos),
                rel_emb_table, jnp.asarray(batch[:, 2]), num_valid,
                jnp.asarray(hf), jnp.asarray(tf), *extra)
        else:
            counts = _rank_batch(
                ent_emb, jnp.asarray(head_pos), jnp.asarray(tail_pos),
                rel_emb_table, jnp.asarray(batch[:, 2]), num_valid,
                jnp.asarray(hf), jnp.asarray(tf), rel_model=cfg.rel_model,
                tile=tile, use_pallas=use_pallas, table_t=ent_emb_t)
        # Counts stay on device until the end of the loop — one host sync per
        # eval, not per batch (dispatch pipelines with host-side filter prep).
        pending_counts.append((counts, real))
        triples_seen.append(batch[:real])
        if log and (bi + 1) % max(1, n_batches // 5) == 0:
            log.info(f"[rank {bi + 1:,}/{n_batches:,}]")

    for counts, real in pending_counts:
        counts = {k: np.asarray(v)[:real] for k, v in counts.items()}
        total_gt.append(np.concatenate([counts["h_gt"], counts["t_gt"]]))
        total_geq.append(np.concatenate([counts["h_geq"], counts["t_geq"]]))
        if compute_filtered:
            filt_gt.append(np.concatenate([counts["h_gt"] - counts["h_fgt"],
                                           counts["t_gt"] - counts["t_fgt"]]))
            filt_geq.append(np.concatenate([counts["h_geq"] - counts["h_fgeq"],
                                           counts["t_geq"] - counts["t_fgeq"]]))

    def finish(gts, geqs):
        # Per-direction blocks stay [heads...tails] per batch; for breakdowns
        # we need global [all-head-corruption; all-tail-corruption] ordering.
        h = np.concatenate([np.split(x, 2)[0] for x in gts])
        t = np.concatenate([np.split(x, 2)[1] for x in gts])
        gh = np.concatenate([np.split(x, 2)[0] for x in geqs])
        gt_ = np.concatenate([np.split(x, 2)[1] for x in geqs])
        ranks = np.asarray(metrics.ranks_from_counts(
            jnp.asarray(np.concatenate([h, t])), jnp.asarray(np.concatenate([gh, gt_]))))
        rec = 1.0 / ranks
        hits = {k: float((ranks <= k).mean()) for k in HIT_POSITIONS}
        return float(rec.mean()), hits, rec

    mrr, hits, _ = finish(total_gt, total_geq)
    result = EvalResult(mrr=mrr, hits=hits)

    all_triples = np.concatenate(triples_seen)
    if compute_filtered:
        mrr_f, hits_f, rec_f = finish(filt_gt, filt_geq)
        result.mrr_filt, result.hits_filt = mrr_f, hits_f

        if new_entities is not None:
            mask = np.zeros(max_ent_id + 1, bool)
            mask[np.asarray(new_entities, np.int64)] = True
            sums, cnts = metrics.split_by_new_position(
                all_triples, rec_f, jnp.asarray(mask))
            cnts = np.maximum(np.asarray(cnts), 1.0)
            result.mrr_by_position = np.asarray(sums) / cnts
        if rel_categories is not None:
            sums, cnts = metrics.split_by_category(
                all_triples, rec_f, jnp.asarray(rel_categories))
            cnts = np.maximum(np.asarray(cnts), 1.0)
            result.mrr_by_category = np.asarray(sums) / cnts

    if return_embeddings:
        result.ent_emb = np.asarray(ent_emb)[:n]
        result.entities = entities
    return result

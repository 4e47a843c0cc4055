"""Serving: load a trained model and answer link-prediction queries.

A capability beyond the reference (which only evaluates benchmarks): given a
checkpoint, serve top-k tail (or head) predictions for (head, relation)
queries over a candidate entity universe, TPU-native — the candidate table is
encoded once (or loaded from an `ent_emb-*.npz` export), queries run as one
jitted streaming top-k per batch (ops/ranking.py::tiled_top_k, never
materializing (B, N) scores), and ad-hoc entities can be encoded from raw
description text (the inductive setting's whole point: reference
README.md:15-25).

Usage (library):
    srv = LinkPredictor.from_checkpoint("output/model-X.npz", mcfg,
                                        tokenizer=tok)
    srv.set_candidates_from_texts(ids, texts)        # or .set_candidates(table, ids)
    scores, ents = srv.predict_tails(head_texts=["..."], rels=[3], k=10)

CLI demo over a packed dataset:
    python -m blp_tpu.serve checkpoint=... dataset=... rel_model=... model=...
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from blp_tpu import checkpoint as ckpt
from blp_tpu.models import blp
from blp_tpu.ops import ranking




def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class LinkPredictor:
    params: dict
    cfg: blp.ModelConfig
    tokenizer: object | None = None
    max_len: int = 32
    tile: int = 65536
    # Approximate in-tile top-k (lax.approx_max_k, ~0.95 per-tile recall):
    # 1.8x lower single-query latency at Wikidata5M scale (PERFORMANCE.md).
    # When to flip it ON: latency-sensitive interactive serving where the
    # top-k feeds a human or a reranker — a missed candidate must be both in
    # the true top-k AND dropped inside its own tile, so end-to-end recall
    # stays >=0.95 and the p50 drops 29 vs 52 ms (B=1). Keep it OFF (exact)
    # for offline evaluation, exports, or anything whose numbers land in a
    # paper/dashboard — the 23 ms saved does not justify nondeterministic
    # recall there.
    approx: bool = False
    # candidate state
    _table: jax.Array | None = None          # (Np, d) padded
    _num_valid: int = 0
    _candidate_ids: np.ndarray | None = None  # (N,) external ids
    # cached unstacked-layer view of params for the encode fast path
    _params_enc: dict | None = None
    _params_enc_src: dict | None = None

    @classmethod
    def from_checkpoint(cls, path: str, cfg: blp.ModelConfig, *,
                        tokenizer=None, max_len: int = 32,
                        tile: int = 65536) -> "LinkPredictor":
        template = blp.init_params(jax.random.key(0), cfg)
        params, _ = ckpt.load_pytree(path, template=template)
        return cls(params=params, cfg=cfg, tokenizer=tokenizer,
                   max_len=max_len, tile=tile)

    # -- encoding ------------------------------------------------------------

    def embed_texts(self, texts: list[str]) -> jax.Array:
        """Encode raw description texts into entity embeddings (B, d)."""
        if self.tokenizer is None:
            raise ValueError("a tokenizer is required to embed raw text")
        tok, mask = self.tokenizer.batch_encode(texts, self.max_len)
        return self._encode(self.params, jnp.asarray(tok), jnp.asarray(mask))

    def _encode(self, params, tok, mask):
        # Unstacked per-layer view: straight-line layers beat the rolled scan
        # forward-only (+9% on v5e, PERFORMANCE.md); cached so repeated
        # queries reuse the same param identity/jit entry. The cache is keyed
        # on the params dict's OBJECT IDENTITY: to hot-swap weights, replace
        # srv.params wholesale (srv.params = new_tree) — mutating leaves of
        # the existing dict in place would silently serve the stale view.
        # After any in-place mutation, call invalidate_encode_cache().
        if self._params_enc is None or params is not self._params_enc_src:
            from blp_tpu import training

            self._params_enc_src = params
            self._params_enc = training.unstack_params(params)
        return blp.encode_jit(self._params_enc, self.cfg, tok, mask)

    def invalidate_encode_cache(self) -> None:
        """Drop the cached unstacked-weight view. Needed only after mutating
        `self.params` leaves IN PLACE (weight hot-swap into the same dict);
        replacing the dict wholesale invalidates automatically."""
        self._params_enc = self._params_enc_src = None

    # -- candidate universe ----------------------------------------------------

    def set_candidates(self, table, ids=None) -> None:
        """Install a precomputed (N, d) candidate table (e.g. a training
        run's ent_emb-*.npz export)."""
        table = jnp.asarray(table, jnp.float32)
        n = int(table.shape[0])
        n_pad = _round_up(max(n, 1), self.tile)
        if n_pad > n:
            table = jnp.pad(table, ((0, n_pad - n), (0, 0)))
        self._table = jax.device_put(table)
        self._num_valid = n
        self._candidate_ids = (np.asarray(ids) if ids is not None
                               else np.arange(n))

    def set_candidates_from_export(self, out_dir: str, run_id: str) -> None:
        """Install candidates from a training run's embedding export — either
        this framework's ent_emb-{id}.npz or the reference's
        ent_emb-{id}.pt + ents-{id}.pt torch pair (train.py:403-405)."""
        from blp_tpu.utils import load_embedding_export

        table, ids = load_embedding_export(out_dir, run_id)
        self.set_candidates(table, ids)

    def set_candidates_from_texts(self, ids, texts: list[str],
                                  batch_size: int = 512) -> None:
        if self.tokenizer is None:
            raise ValueError("a tokenizer is required to embed raw text")
        chunks = []
        for s in range(0, len(texts), batch_size):
            chunk = texts[s : s + batch_size]
            pad = batch_size - len(chunk)
            tok, mask = self.tokenizer.batch_encode(
                chunk + [""] * pad, self.max_len)
            mask[len(chunk):, 0] = 1.0
            chunks.append(self._encode(self.params, jnp.asarray(tok),
                                       jnp.asarray(mask))[: len(chunk)])
        self.set_candidates(jnp.concatenate(chunks, axis=0), ids)

    # -- queries ---------------------------------------------------------------

    #: Dense-path budget: max B * Np score elements (fp32) materialized at
    #: once — 320M = 1.28 GB, i.e. B<=66 at Wikidata5M scale.
    DENSE_TOPK_BUDGET = 320_000_000

    def _topk(self, fixed: jax.Array, rels, k: int, corrupt: str):
        if self._table is None:
            raise ValueError("no candidate table installed")
        rel_emb = self.params["rel_emb"][jnp.asarray(rels, jnp.int32)]
        n_pad = self._table.shape[0]
        if fixed.shape[0] * n_pad <= self.DENSE_TOPK_BUDGET:
            # Small-batch fast path: one dense score pass + ONE selection
            # beats the 73-tile top-k merge chain — measured 29.3 -> 6.7 ms
            # for a single exact TransE query at 4.8M candidates
            # (PERFORMANCE.md); exact selection is as fast as approximate
            # here, so `approx` only matters on the tiled path.
            scores, cols = ranking.dense_top_k(
                self._table, fixed, rel_emb,
                jnp.asarray(self._num_valid, jnp.int32),
                k=k, rel_model=self.cfg.rel_model, corrupt=corrupt,
                approx=self.approx)
        else:
            scores, cols = ranking.tiled_top_k(
                self._table, fixed, rel_emb,
                jnp.asarray(self._num_valid, jnp.int32),
                k=k, rel_model=self.cfg.rel_model, corrupt=corrupt,
                tile=min(self.tile, n_pad), approx=self.approx)
        cols = np.asarray(cols)
        ents = np.where(cols >= 0, self._candidate_ids[np.clip(cols, 0, None)],
                        -1)
        return np.asarray(scores), ents

    def predict_tails(self, *, rels, head_texts=None, head_emb=None,
                      k: int = 10):
        """Top-k tail candidates for (head, rel, ?). Heads given as raw
        description texts (inductive) or precomputed embeddings (B, d)."""
        fixed = (self.embed_texts(head_texts) if head_texts is not None
                 else jnp.asarray(head_emb, jnp.float32))
        return self._topk(fixed, rels, k, corrupt="tail")

    def predict_heads(self, *, rels, tail_texts=None, tail_emb=None,
                      k: int = 10):
        """Top-k head candidates for (?, rel, tail)."""
        fixed = (self.embed_texts(tail_texts) if tail_texts is not None
                 else jnp.asarray(tail_emb, jnp.float32))
        return self._topk(fixed, rels, k, corrupt="head")


def serve_loop(srv: "LinkPredictor", requests, write, *,
               ent_ids: dict | None = None, rel_ids: dict | None = None,
               max_batch: int = 64, linger_s: float = 0.002) -> dict:
    """Long-running request loop with micro-batching (the daemon behind
    `python -m blp_tpu.serve serve with ...`; beyond the reference, which
    only evaluates benchmarks).

    requests: a queue.Queue of JSON strings (None terminates — the CLI feeds
    it from a stdin reader thread; tests feed it directly). Each request:

        {"id": any, "op": "tails"|"heads", "rel": <id or name>, "k": 10,
         "head"/"tail": <entity name>            # transductive lookup, or
         "head_text"/"tail_text": <description>} # inductive ad-hoc encode

    write: called with one JSON line per response,
    `{"id":..., "entities": [...], "scores": [...]}` (entities as names when
    `ent_ids` is given, else candidate ids) or `{"id":..., "error": "..."}`.

    Batching: drains up to `max_batch` queued requests (waiting `linger_s`
    for stragglers after the first), groups them by (op, k, input kind), and
    runs ONE top-k pass per group — the measured v5e batching win is 12.7 ->
    403 QPS between B=1 and B=64 (PERFORMANCE.md serving table).

    Returns counters {"served": n, "errors": n, "batches": n}.
    """
    import json as _json
    import queue as _queue
    import time as _time

    id2ent = None if ent_ids is None else {v: k for k, v in ent_ids.items()}
    stats = {"served": 0, "errors": 0, "batches": 0}

    def fail(rid, msg):
        stats["errors"] += 1
        write(_json.dumps({"id": rid, "error": msg}))

    num_rels = int(srv.params["rel_emb"].shape[0])

    def resolve_rel(r):
        if isinstance(r, str):
            if rel_ids is None or r not in rel_ids:
                raise KeyError(f"unknown relation {r!r}")
            return rel_ids[r]
        r = int(r)
        # Range-check: jnp gather CLAMPS out-of-range ids, which would
        # silently score against the last relation instead of erroring.
        if not 0 <= r < num_rels:
            raise KeyError(f"relation id {r} out of range [0, {num_rels})")
        return r

    def run_group(group):
        # group: list of (rid, op, k, fixed_kind, fixed_value, rel_id).
        # Pad to a power-of-two bucket by repeating the last request: every
        # distinct batch shape costs a jit retrace + TPU compile (tens of
        # seconds over the tunnel), so organic 1..max_batch group sizes must
        # collapse onto log2(max_batch) executables.
        _, op, k, kind, _, _ = group[0]
        bucket = 1
        while bucket < len(group):
            bucket *= 2
        pad = bucket - len(group)
        rels = [g[5] for g in group] + [group[-1][5]] * pad
        vals = [g[4] for g in group] + [group[-1][4]] * pad
        if kind == "text":
            fixed = srv.embed_texts(vals)
        else:
            fixed = srv._table[jnp.asarray(np.asarray(vals))]
        fn = srv.predict_tails if op == "tails" else srv.predict_heads
        scores, ents = fn(rels=rels, **{("head_emb" if op == "tails" else
                                        "tail_emb"): fixed}, k=k)
        stats["batches"] += 1
        for i, g in enumerate(group):
            names = ([id2ent.get(int(e), "?") if e >= 0 else None
                      for e in ents[i]] if id2ent is not None
                     else [int(e) for e in ents[i]])
            write(_json.dumps({"id": g[0], "entities": names,
                               "scores": np.round(scores[i], 6).tolist()}))
            stats["served"] += 1

    done = False
    while not done:
        batch = []
        try:
            first = requests.get()
        except (EOFError, KeyboardInterrupt):
            break
        if first is None:
            break
        batch.append(first)
        deadline = _time.monotonic() + linger_s
        while len(batch) < max_batch:
            try:
                nxt = requests.get(timeout=max(deadline - _time.monotonic(), 0))
            except _queue.Empty:
                break
            if nxt is None:
                done = True
                break
            batch.append(nxt)

        groups: dict = {}
        for line in batch:
            line = line.strip()
            if not line:
                continue
            rid = None
            try:
                req = _json.loads(line)
                rid = req.get("id")
                op = req.get("op", "tails")
                if op not in ("tails", "heads"):
                    raise ValueError(f"unknown op {op!r}")
                k = int(req.get("k", 10))
                rel = resolve_rel(req["rel"])
                side = "head" if op == "tails" else "tail"
                if f"{side}_text" in req:
                    kind, val = "text", str(req[f"{side}_text"])
                elif side in req:
                    name = req[side]
                    if ent_ids is None or name not in ent_ids:
                        raise KeyError(f"unknown entity {name!r}")
                    if srv._candidate_ids is None:
                        raise ValueError("no candidate table installed")
                    rows = np.flatnonzero(srv._candidate_ids == ent_ids[name])
                    if not len(rows):
                        raise KeyError(f"{name!r} not in the candidate table")
                    kind, val = "row", int(rows[0])
                else:
                    raise KeyError(f"request needs {side!r} or '{side}_text'")
                groups.setdefault((op, k, kind), []).append(
                    (rid, op, k, kind, val, rel))
            except Exception as e:  # noqa: BLE001 — per-request isolation
                fail(rid, f"{type(e).__name__}: {e}")
        for group in groups.values():
            try:
                run_group(group)
            except Exception as e:  # noqa: BLE001
                for g in group:
                    fail(g[0], f"{type(e).__name__}: {e}")
    return stats


def main(argv=None):
    """CLI demo / daemon: load a checkpoint + dataset, build the candidate
    table, and either answer a few test-split queries (default) or, with a
    `serve` argument, run the stdin-JSONL request daemon (serve_loop)."""
    import json
    import sys

    from blp_tpu import train as train_mod
    from blp_tpu.config import ExperimentConfig, parse_overrides
    from blp_tpu.data.datasets import GraphData, TextGraphData

    args = argv if argv is not None else sys.argv[1:]
    cfg = parse_overrides([a for a in args if "=" in a or a == "with"])
    tokenizer = train_mod.make_tokenizer(cfg)
    text = TextGraphData.load(
        cfg.triples_file("train"), tokenizer=tokenizer, max_len=cfg.max_len,
        write_maps=True, use_cached_text=cfg.use_cached_text)
    test = GraphData.load(cfg.triples_file("test"))
    mcfg = train_mod.make_model_config(cfg, tokenizer, len(text.rel_ids),
                                       len(text.ent_ids))
    srv = LinkPredictor.from_checkpoint(cfg.checkpoint, mcfg,
                                        tokenizer=tokenizer,
                                        max_len=cfg.max_len, tile=cfg.tile)
    # Candidate universe: every entity with a description, encoded in chunks.
    ents = np.arange(len(text.ent_ids))
    chunks = []
    for s in range(0, len(ents), cfg.emb_batch_size):
        tok, mask = text.get_entity_descriptions(ents[s : s + cfg.emb_batch_size])
        chunks.append(srv._encode(srv.params, jnp.asarray(tok), jnp.asarray(mask)))
    table = jnp.concatenate(chunks, axis=0)
    srv.set_candidates(table, ents)

    if "serve" in args:
        # Daemon mode: JSONL requests on stdin, JSONL responses on stdout.
        import queue
        import threading

        req_q: "queue.Queue[str | None]" = queue.Queue()

        def reader():
            for line in sys.stdin:
                req_q.put(line)
            req_q.put(None)

        threading.Thread(target=reader, daemon=True).start()
        print(json.dumps({"ready": True, "num_candidates": len(ents)}),
              flush=True)
        stats = serve_loop(srv, req_q,
                           lambda s: print(s, flush=True),
                           ent_ids=text.ent_ids, rel_ids=text.rel_ids)
        print(json.dumps({"done": True, **stats}), flush=True)
        return

    ent_name = {v: k for k, v in text.ent_ids.items()}
    rel_name = {v: k for k, v in text.rel_ids.items()}
    q = test.triples[:4]  # (T, 3) [head, tail, rel]
    scores, pred = srv.predict_tails(
        head_emb=np.asarray(table)[q[:, 0]], rels=q[:, 2], k=5)
    for i, (h, t, r) in enumerate(q):
        names = [ent_name.get(int(e), "?") for e in pred[i]]
        print(f"({ent_name[int(h)]}, {rel_name[int(r)]}, ?) -> {names}  "
              f"true={ent_name[int(t)]}  scores={np.round(scores[i], 3).tolist()}")


if __name__ == "__main__":
    main()

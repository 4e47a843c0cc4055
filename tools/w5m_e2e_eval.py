"""End-to-end Wikidata5M-scale evaluation rehearsal on one chip.

Runs the REAL evaluator (`blp_tpu.evaluation.eval_link_prediction`) at
Wikidata5M dimensions — 4.8M candidate entities, BERT-base bf16 encoder,
filtered metrics in large-dataset mode (filter index over the eval split
only, reference: train.py:381-393) — with synthetic descriptions/triples, and
reports phase timings. This measures the "Wikidata5M full-ranking eval time"
north star (BASELINE.md) that the reference never published; at this scale
the reference materializes (B, 4.8M) score matrices and copes with
eval_batch_size=2 (reference: scripts/blp-transe-wikidata5m.sh), while this
evaluator streams O(B*tile) tiles.

    python tools/w5m_e2e_eval.py --n 4800000 --triples 5000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


class SynthTextStore:
    """Minimal stand-in for TextGraphData: a packed (N, L+1) token matrix
    with the trailing length column (blp_tpu/data/datasets.py layout)."""

    def __init__(self, n: int, max_len: int, vocab: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.max_len = max_len
        self.tok = rng.integers(1, vocab, (n, max_len), dtype=np.int32)
        self.lengths = rng.integers(8, max_len + 1, n).astype(np.int32)
        col = np.arange(max_len, dtype=np.int32)[None, :]
        self.tok *= (col < self.lengths[:, None])

    def get_entity_descriptions(self, ids: np.ndarray):
        tok = self.tok[ids]
        mask = (tok > 0).astype(np.float32)
        return tok, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_800_000)
    ap.add_argument("--triples", type=int, default=5_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--max-len", type=int, default=32)
    ap.add_argument("--rel-model", default="transe")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--emb-batch", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny encoder (CPU smoke test of this tool)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon site hook pins "
                         "JAX_PLATFORMS, so the env var alone is not enough)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blp_tpu import evaluation
    from blp_tpu.data.filtering import FilterIndex
    from blp_tpu.models import bert, blp
    from blp_tpu.utils import get_logger

    log = get_logger()
    N, T = args.n, args.triples
    rng = np.random.default_rng(0)

    enc = (bert.BertConfig.tiny(vocab_size=1024) if args.tiny
           else bert.BertConfig(compute_dtype=jnp.bfloat16))
    cfg = blp.ModelConfig(
        model="blp", rel_model=args.rel_model, loss_fn="margin",
        dim=args.dim, num_relations=822,  # Wikidata5M relation count
        encoder=enc)
    params = blp.init_params(jax.random.key(0), cfg)

    t0 = time.time()
    text = SynthTextStore(N, args.max_len, cfg.encoder.vocab_size)
    entities = np.arange(N, dtype=np.int64)
    triples = np.stack([
        rng.integers(0, N, T), rng.integers(0, N, T),
        rng.integers(0, 822, T)], axis=1).astype(np.int64)
    t_data = time.time() - t0
    log.info(f"synthetic data ready in {t_data:.1f}s "
             f"(text matrix {text.tok.nbytes / 1e9:.2f} GB)")

    # Large-dataset mode: filter index over the eval split only.
    filter_index = FilterIndex(triples)

    # Phase 1 timed separately (forced through a scalar read — async dispatch
    # otherwise defers all encode work into the ranking phase).
    pad_unit = args.tile
    t0 = time.time()
    ent_emb = evaluation.build_entity_table(
        lambda tok, mask: blp.encode_jit(params, cfg, tok, mask),
        text, entities, emb_batch_size=args.emb_batch, dim=cfg.entity_dim,
        pad_to=pad_unit, log=log)
    float(ent_emb[0, 0])
    t_encode = time.time() - t0

    t0 = time.time()
    res = evaluation.eval_link_prediction(
        params, cfg, triples, text, entities,
        batch_size=args.batch, emb_batch_size=args.emb_batch, tile=args.tile,
        filter_index=filter_index, ent_emb=ent_emb, log=log)
    t_rank = time.time() - t0

    print(json.dumps({
        "metric": "w5m_e2e_eval_seconds",
        "n_candidates": N, "n_triples": T,
        "rel_model": args.rel_model,
        "value": round(t_encode + t_rank, 1), "unit": "s",
        "encode_seconds": round(t_encode, 1),
        "rank_seconds": round(t_rank, 1),
        "mrr_filt": res.mrr_filt,
    }))


if __name__ == "__main__":
    main()

"""Serving-path latency benchmark: streaming top-k queries over a large
candidate table (blp_tpu/serve.py::LinkPredictor -> ops/ranking.tiled_top_k).

Measures per-query-batch latency (p50/p95 over repeated calls, one
device->host sync per call — serving is latency-bound, unlike the throughput
loops elsewhere) for several batch sizes and candidate-table scales.

    python tools/serving_bench.py --n 4800000 --rel-model transe
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--rel-model", default="transe")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8, 64])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--approx", action="store_true",
                    help="lax.approx_max_k in-tile selection (~0.95 recall)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blp_tpu.models import bert, blp
    from blp_tpu.serve import LinkPredictor

    rng = np.random.default_rng(0)
    cfg = blp.ModelConfig(model="blp", rel_model=args.rel_model,
                          loss_fn="margin", dim=args.d, num_relations=64,
                          encoder=bert.BertConfig.tiny())
    params = blp.init_params(jax.random.key(0), cfg)
    srv = LinkPredictor(params=params, cfg=cfg, tile=args.tile,
                        approx=args.approx)
    table = rng.standard_normal((args.n, args.d)).astype(np.float32)
    srv.set_candidates(table, np.arange(args.n))

    for B in args.batches:
        emb = rng.standard_normal((B, args.d)).astype(np.float32)
        rels = rng.integers(0, 64, B)
        # warmup (compile)
        srv.predict_tails(head_emb=emb, rels=rels, k=args.k)
        lat = []
        for _ in range(args.reps):
            t0 = time.time()
            scores, ents = srv.predict_tails(head_emb=emb, rels=rels, k=args.k)
            # predict_tails already syncs (np.asarray on scores/ids)
            lat.append((time.time() - t0) * 1e3)
        lat = np.sort(np.asarray(lat))
        print(json.dumps({
            "metric": "serving_topk_latency_ms", "batch": B,
            "n_candidates": args.n, "k": args.k,
            "rel_model": args.rel_model, "approx": args.approx,
            "p50": round(float(np.percentile(lat, 50)), 2),
            "p95": round(float(np.percentile(lat, 95)), 2),
            "qps": round(B / (np.median(lat) / 1e3), 1),
        }))


if __name__ == "__main__":
    main()

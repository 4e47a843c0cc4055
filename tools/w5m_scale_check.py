"""Wikidata5M-scale streaming check: rank-vs-all over millions of candidates.

Validates that the streamed evaluator's memory stays O(B * tile) regardless of
candidate count and reports ranking throughput. The Wikidata5M eval problem is
(B, 4.8M) per direction — the reference copes with eval_batch_size=2
(scripts/blp-transe-wikidata5m.sh); here the table is the only O(N) object.

    python tools/w5m_scale_check.py --n 4800000     # real chip
    JAX_PLATFORMS=cpu python tools/w5m_scale_check.py --n 1000000
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tile", type=int, default=65536)
    ap.add_argument("--rel-model", default="transe")
    ap.add_argument("--bidir", action="store_true",
                    help="A/B the fused both-direction stream against two "
                         "unidirectional passes")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blp_tpu.ops import ranking

    N, d, B, tile = args.n, args.d, args.batch, args.tile
    Np = -(-N // tile) * tile
    rng = np.random.default_rng(0)

    t0 = time.time()
    table = jnp.asarray(rng.standard_normal((Np, d)).astype(np.float32))
    fixed = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    true_pos = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    filt = jnp.full((B, 64), -1, jnp.int32)
    ts = ranking.score_pairs(table[true_pos], fixed, rel,
                             rel_model=args.rel_model, corrupt="head")[:, None]
    nv = jnp.asarray(N, jnp.int32)

    c = ranking.tiled_rank_counts(table, fixed, rel, ts, true_pos, filt, nv,
                                  rel_model=args.rel_model, corrupt="head",
                                  tile=tile)
    int(np.asarray(c["gt"])[0])  # force
    setup = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        c = ranking.tiled_rank_counts(table, fixed, rel, ts, true_pos, filt,
                                      nv, rel_model=args.rel_model,
                                      corrupt="head", tile=tile)
    int(np.asarray(c["gt"])[0])
    dt = (time.time() - t0) / reps

    out = {
        "n_candidates": N, "batch": B, "tile": tile, "rel_model": args.rel_model,
        "table_gb": round(Np * d * 4 / 2**30, 2),
        "setup_s": round(setup, 1),
        "rank_pass_s": round(dt, 3),
        "cand_scores_per_sec": round(B * N / dt / 1e6, 1),
        "unit": "M scores/s",
    }

    if args.bidir:
        head_emb = table[true_pos]
        tail_pos = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
        tail_emb = table[tail_pos]
        h_ts = ranking.score_pairs(head_emb, tail_emb, rel,
                                   rel_model=args.rel_model,
                                   corrupt="head")[:, None]
        t_ts = ranking.score_pairs(tail_emb, head_emb, rel,
                                   rel_model=args.rel_model,
                                   corrupt="tail")[:, None]

        def two_pass():
            a = ranking.tiled_rank_counts(
                table, tail_emb, rel, h_ts, true_pos, filt, nv,
                rel_model=args.rel_model, corrupt="head", tile=tile)
            b2 = ranking.tiled_rank_counts(
                table, head_emb, rel, t_ts, tail_pos, filt, nv,
                rel_model=args.rel_model, corrupt="tail", tile=tile)
            return a, b2

        def fused():
            return ranking.tiled_rank_counts_bidir(
                table, head_emb, tail_emb, rel, h_ts, t_ts, true_pos,
                tail_pos, filt, filt, nv, rel_model=args.rel_model, tile=tile)

        a, b2 = two_pass()
        int(np.asarray(a["gt"])[0]); int(np.asarray(b2["gt"])[0])
        t0 = time.time()
        for _ in range(reps):
            a, b2 = two_pass()
        int(np.asarray(a["gt"])[0]); int(np.asarray(b2["gt"])[0])
        dt_two = (time.time() - t0) / reps

        f = fused()
        int(np.asarray(f["h_gt"])[0])
        t0 = time.time()
        for _ in range(reps):
            f = fused()
        int(np.asarray(f["h_gt"])[0])
        dt_fused = (time.time() - t0) / reps

        # The stacked (2B, d) matmul is not guaranteed bit-identical to two
        # (B, d) matmuls on TPU; report count mismatches (ulp-level tie
        # flips) instead of hard-asserting in a benchmark tool.
        mism = int((~np.isclose(np.asarray(f["h_gt"]), np.asarray(a["gt"]),
                                atol=1)).sum()
                   + (~np.isclose(np.asarray(f["t_gt"]), np.asarray(b2["gt"]),
                                  atol=1)).sum())
        out["fused_vs_two_pass_count_mismatches"] = mism
        out.update({
            "both_dir_two_pass_s": round(dt_two, 3),
            "both_dir_fused_s": round(dt_fused, 3),
            "fused_speedup": round(dt_two / dt_fused, 2),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()

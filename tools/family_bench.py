"""Train-step throughput across the full model family, one JSON line each.

Reproduces PERFORMANCE.md's family table (bench.py measures only the BLP
flagship). Methodology matches bench.py: jitted step with on-device negative
sampling, 6 warmup steps, 3 timed windows, fastest window kept (the tunneled
chip's relay stalls land between windows, not inside the min).

    python tools/family_bench.py            # all families
    python tools/family_bench.py --models blp glove-bow
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

FAMILIES = {
    # model: (batch, max_len, dim, emb_dim, vocab)
    "glove-bow": (4096, 32, 300, 300, 40_000),
    "bert-bow": (4096, 32, 768, 768, 28_996),
    "glove-dkrl": (2048, 32, 128, 300, 40_000),
    "bert-dkrl": (2048, 32, 128, 768, 28_996),
    "transductive": (4096, 0, 128, 0, 0),
    "blp": (128, 32, 128, 0, 0),
    # The Wikidata5M TRAINING operating point (reference config:
    # scripts/blp-transe-wikidata5m.sh — B=1024, max_len=64, K=64, bf16);
    # needs rematerialization to fit a 16 GB v5e (per layer the bf16
    # stashes are ~2 GB, dominated by the 768 MB (2B/4, 128, 3072) FFN
    # temp — ~24 GB over 12 layers un-remat'd). Runs partial remat k=4 +
    # fast_train + dropout_bits=8, the best stable A/B'd config (the remat
    # optimum moved 8 -> 4 once narrow masks freed HBM); the shipped
    # launchers use k=8 at reference numerics (PERFORMANCE.md).
    "blp-w5m": (1024, 64, 128, 0, 0),
}


def bench_family(model: str, *, reps: int = 15) -> dict:
    import jax
    import jax.numpy as jnp

    from blp_tpu import training
    from blp_tpu.models import bert, blp

    B, L, dim, emb_dim, vocab = FAMILIES[model]
    K = 64
    kw = dict(model="blp" if model.startswith("blp") else model,
              rel_model="transe", loss_fn="margin", dim=dim,
              num_relations=16)
    if model.startswith("blp"):
        w5m = model == "blp-w5m"
        cfg = blp.ModelConfig(
            **kw, encoder=bert.BertConfig(compute_dtype=jnp.bfloat16,
                                          remat=4 if w5m else False,
                                          dropout_bits=8 if w5m else 32,
                                          fast_train=w5m))
    elif model == "transductive":
        cfg = blp.ModelConfig(**kw, num_entities=40_000)
    else:
        cfg = blp.ModelConfig(**kw, emb_dim=emb_dim, vocab_size=vocab)

    params = training.unstack_params(blp.init_params(jax.random.key(0), cfg))
    # f32 Adam state everywhere — reduced-precision state was priced in
    # round 5 and not adopted (both-moments: quality negative; mu-only:
    # speed-neutral). See PERFORMANCE.md.
    opt = training.make_optimizer(2e-5, 10_000)
    step = training.make_train_step(cfg, opt, batch_size=B, num_negatives=K)
    rng = np.random.default_rng(0)
    if model == "transductive":
        batch = {"pos_pairs": jnp.asarray(rng.integers(0, 40_000, (B, 2))),
                 "rels": jnp.asarray(rng.integers(0, 16, (B,)))}
    else:
        V = cfg.encoder.vocab_size if model.startswith("blp") else vocab
        batch = {"text_tok": jnp.asarray(rng.integers(1, V, (B, 2, L))),
                 "text_mask": jnp.asarray(np.ones((B, 2, L), np.float32)),
                 "rels": jnp.asarray(rng.integers(0, 16, (B,)))}

    p, s = params, jax.jit(opt.init)(params)
    n = 0
    for _ in range(6):
        p, s, loss = step(p, s, (jax.random.key(0), n), batch)
        n += 1
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            p, s, loss = step(p, s, (jax.random.key(0), n), batch)
            n += 1
        float(loss)
        best = min(best, (time.time() - t0) / reps)
    return {"model": model, "batch": B, "num_negatives": K,
            "ms_per_step": round(best * 1e3, 1),
            "triples_per_sec": round(B / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=list(FAMILIES))
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()
    for model in args.models:
        print(json.dumps(bench_family(model, reps=args.reps)), flush=True)


if __name__ == "__main__":
    main()

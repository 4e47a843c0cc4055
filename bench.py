"""Benchmark: flagship training throughput on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the BLP flagship hot path — BERT-base encoder (bfloat16 compute)
over 2B=256 descriptions of 32 tokens, TransE scoring of positives + 64
in-batch negatives sampled on-device, margin loss, Adam step — one jitted
step, fixed shapes. vs_baseline compares against the reference-equivalent
PyTorch implementation measured by tools/measure_reference_baseline.py
(bench_baseline.json; torch is CPU-only in this image, and the baseline JSON
labels its hardware accordingly).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from blp_tpu import training
    from blp_tpu.models import bert, blp

    # --w5m: the Wikidata5M TRAINING operating point (reference config
    # scripts/blp-transe-wikidata5m.sh — B=1024, max_len=64, K=64, bf16).
    # Rematerialization is required to fit 16 GB HBM at this batch. The
    # bench runs partial remat k=4 + fast_train poly-GeLU + dropout_bits=8
    # narrow mask draws — the quality-parity-A/B'd-to-convergence best
    # stable config (910.2 ms = 1,125 t/s measured; with the 4x-smaller
    # mask buffers the remat-k optimum moved from 8 to 4). NOTE: the
    # shipped launchers use k=8 at reference numerics (942.7 t/s at
    # 1086.2 ms); the k sweep and the mask-bits profile are in
    # PERFORMANCE.md.
    # Default stays the flagship point for metric continuity across rounds.
    w5m = "--w5m" in sys.argv[1:]
    B, L, K = (1024, 64, 64) if w5m else (128, 32, 64)
    steps, warmup, windows = (10, 6, 3) if w5m else (20, 6, 3)

    cfg = blp.ModelConfig(
        model="blp", rel_model="transe", loss_fn="margin", dim=128,
        num_relations=16,
        encoder=bert.BertConfig(compute_dtype=jnp.bfloat16,
                                remat=4 if w5m else False,
                                dropout_bits=8 if w5m else 32,
                                fast_train=w5m))
    params = training.unstack_params(blp.init_params(jax.random.key(0), cfg))
    # f32 Adam state (reference numerics). Reduced-precision Adam state
    # was priced in round 5 and NOT adopted: bf16 both-moments is +3.4%
    # here but stalls convergence (nu ulp absorption), bf16 mu-only is
    # quality-safe but speed-neutral (40.8 vs 41.0 ms) — PERFORMANCE.md.
    optimizer = training.make_optimizer(2e-5, 10_000)
    opt_state = jax.jit(optimizer.init)(params)
    step = training.make_train_step(cfg, optimizer, batch_size=B,
                                    num_negatives=K)

    rng = np.random.default_rng(0)
    batch = {
        "text_tok": jnp.asarray(rng.integers(1, cfg.encoder.vocab_size, (B, 2, L))),
        "text_mask": jnp.asarray(np.ones((B, 2, L), np.float32)),
        "rels": jnp.asarray(rng.integers(0, 16, (B,))),
    }

    base = jax.random.key(0)
    # NOTE: on the axon-relayed TPU, jax.block_until_ready does NOT force
    # execution — only a device->host read does. Warmup syncs via float()
    # (the first real execution also pays the remote warmup, minutes); each
    # timed window dispatches asynchronously and forces the whole chain
    # through the final loss, which depends on every preceding step's params.
    # The key is passed as (base, step_index) so the RNG fold happens inside
    # the jit (an eager host-side split is one extra dispatch per step).
    # Several windows are timed and the fastest kept: the remote relay adds
    # occasional multi-second stalls that are tunnel noise, not device time —
    # the best window is the reproducible steady state (worst/best spread is
    # reported on stderr for honesty).
    n = 0
    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, (base, n), batch)
        n += 1
    float(loss)

    times = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, (base, n), batch)
            n += 1
        float(loss)
        times.append((time.time() - t0) / steps)
    dt = min(times)
    tput = B / dt
    print(f"windows ms/step: {[round(t * 1e3, 1) for t in times]}",
          file=sys.stderr)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            vs = tput / json.load(f)["value"]

    print(json.dumps({
        "metric": "train_triples_per_sec_w5m" if w5m else "train_triples_per_sec",
        "value": round(tput, 2),
        "unit": "triples/s",
        "vs_baseline": round(vs, 2) if not w5m else 0.0,
    }))


if __name__ == "__main__":
    main()

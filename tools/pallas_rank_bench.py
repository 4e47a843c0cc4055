"""A/B: Pallas TransE rank kernel vs the XLA broadcast-L1 fusion at
Wikidata5M scale on the real chip.

Usage: python tools/pallas_rank_bench.py [--tiles 1024,2048,4096]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from blp_tpu.ops import pallas_ranking, ranking

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=4_800_000)
p.add_argument("--b", type=int, default=64)
p.add_argument("--d", type=int, default=128)
p.add_argument("--f", type=int, default=64)
p.add_argument("--tiles", type=str, default="512,1024")  # >2048 can exceed
                                                         # scoped VMEM at DC=32
p.add_argument("--xla-tile", type=int, default=65536)
p.add_argument("--reps", type=int, default=5)
args = p.parse_args()

N, B, d, F = args.n, args.b, args.d, args.f
Np = -(-N // 65536) * 65536
rng = np.random.default_rng(0)
print(f"N={N:,} Np={Np:,} B={B} d={d} F={F}")

table = jnp.asarray(rng.standard_normal((Np, d)).astype(np.float32))
head = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
tail = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
rel = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
head_pos = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
tail_pos = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
hf = jnp.asarray(rng.integers(0, N, (B, F)).astype(np.int32))
tf = jnp.asarray(rng.integers(0, N, (B, F)).astype(np.int32))
nv = jnp.asarray(N, jnp.int32)

h_true = ranking.score_pairs(table[head_pos], tail, rel,
                             rel_model="transe", corrupt="head")[:, None]
t_true = ranking.score_pairs(table[tail_pos], head, rel,
                             rel_model="transe", corrupt="tail")[:, None]


def timeit(fn, label, reps=args.reps):
    out = fn()
    s = sum(int(np.asarray(v).sum()) for v in out.values())  # force
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    s2 = sum(int(np.asarray(v).sum()) for v in out.values())
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label:44s} {dt:8.1f} ms  (checksum {s2})")
    return out, dt


xla_bidir = lambda: ranking.tiled_rank_counts_bidir(
    table, head, tail, rel, h_true, t_true, head_pos, tail_pos, hf, tf, nv,
    rel_model="transe", tile=args.xla_tile)
ref, xla_ms = timeit(xla_bidir, f"XLA bidir (tile={args.xla_tile})")

table_t = jnp.asarray(np.asarray(table).T)  # pre-transposed once
for tile in [int(t) for t in args.tiles.split(",")]:
    fn = lambda: pallas_ranking.transe_tiled_rank_counts_bidir(
        table, head, tail, rel, h_true, t_true, head_pos, tail_pos, hf, tf,
        nv, tile=tile, table_t=table_t)
    out, ms = timeit(fn, f"Pallas bidir (tile={tile})")
    mism = sum(int((np.abs(np.asarray(out[k]) - np.asarray(ref[k])) > 1).sum())
               for k in ref)
    print(f"    counts vs XLA (>1 off, beyond ulp-tie flips): {mism}   "
          f"speedup {xla_ms / ms:.2f}x")

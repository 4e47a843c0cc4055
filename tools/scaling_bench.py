"""Scaling harness: edges/s across mesh sizes + streamed-eval throughput.

Measures (a) train-step throughput at mesh shapes (1,1) -> (D,1)/(D/2,2) and
(b) candidate-sharded ranking throughput, reporting parallel efficiency vs
the single-device run. On this machine real hardware is one TPU chip, so
multi-device scaling is measured on the virtual CPU mesh (relative
efficiency of the SPMD program, not absolute speed); run on a pod slice
as-is for real numbers.

Usage:
    python tools/scaling_bench.py            # real backend (1 chip here)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --cpu-mesh
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_train(mesh_shape, B, steps=10, L=16, K=8, tiny=True):
    import jax
    import jax.numpy as jnp

    from blp_tpu import training
    from blp_tpu.models import bert, blp
    from blp_tpu.parallel import mesh as mesh_lib, train_parallel

    enc = bert.BertConfig.tiny(num_heads=4) if tiny else bert.BertConfig(
        compute_dtype=jnp.bfloat16)
    cfg = blp.ModelConfig(model="blp", rel_model="transe", loss_fn="margin",
                          dim=128 if not tiny else 16, num_relations=8,
                          encoder=enc)
    params = blp.init_params(jax.random.key(0), cfg)
    optimizer = training.make_optimizer(1e-4, 10_000)

    devices = jax.devices()[: mesh_shape[0] * mesh_shape[1]]
    mesh = mesh_lib.make_mesh(*mesh_shape, devices=devices)
    params, opt_state, _ = train_parallel.init_parallel_state(
        params, optimizer, mesh, tensor_parallel=mesh_shape[1] > 1)
    step = train_parallel.make_parallel_train_step(
        cfg, optimizer, batch_size=B, num_negatives=K)

    rng = np.random.default_rng(0)
    batch = train_parallel.shard_batch({
        "text_tok": rng.integers(1, enc.vocab_size, (B, 2, L)),
        "text_mask": np.ones((B, 2, L), np.float32),
        "rels": rng.integers(0, 8, (B,)).astype(np.int32),
    }, mesh)

    key = jax.random.key(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k, batch)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k, batch)
    float(loss)
    dt = (time.time() - t0) / steps
    return B / dt


def measure_eval(mesh_shape, N=131072, d=128, B=32, tile=4096, reps=5):
    import jax
    import jax.numpy as jnp

    from blp_tpu.ops import ranking
    from blp_tpu.parallel import eval_parallel, mesh as mesh_lib

    devices = jax.devices()[: mesh_shape[0] * mesh_shape[1]]
    mesh = mesh_lib.make_mesh(*mesh_shape, devices=devices)
    n_dev = mesh.devices.size
    Np = -(-N // (tile * n_dev)) * tile * n_dev
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((Np, d)).astype(np.float32))
    table = eval_parallel.shard_entity_table(table, mesh)
    fixed = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    true_pos = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    ts = ranking.score_pairs(table[true_pos], fixed, rel,
                             rel_model="transe", corrupt="head")[:, None]
    filt = jnp.full((B, 8), -1, jnp.int32)
    fn = eval_parallel.make_sharded_rank_counts(
        mesh, rel_model="transe", corrupt="head", tile=tile)
    nv = jnp.asarray(N, jnp.int32)
    c = fn(table, fixed, rel, ts, true_pos, filt, nv)
    int(np.asarray(c["gt"])[0])
    t0 = time.time()
    for _ in range(reps):
        c = fn(table, fixed, rel, ts, true_pos, filt, nv)
    int(np.asarray(c["gt"])[0])
    dt = (time.time() - t0) / reps
    return B * N / dt  # candidate-scores/s


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force CPU with the virtual device mesh")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    if args.cpu_mesh:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")

    d = jax.device_count()
    shapes = [(1, 1)]
    if d >= 2:
        shapes += [(d, 1)]
    if d >= 4:
        shapes += [(d // 2, 2)]

    # On a VIRTUAL mesh (--cpu-mesh: N devices carved from one host) the N
    # "devices" share one machine's FLOPs, so per-device scaling efficiency is
    # not measurable — the honest metric there is SPMD partitioning overhead:
    # perfect behavior keeps throughput equal to the 1-device run. On real
    # multi-chip hardware each device adds FLOPs and the per-device
    # efficiency_vs_1dev (tput / (base * num_devices)) is the right metric.
    virtual = args.cpu_mesh

    def report(bench, shape, tput, base, unit):
        n_dev = shape[0] * shape[1]
        row = {"bench": bench, "mesh": list(shape), unit: round(tput, 1)}
        if virtual:
            row["virtual_mesh_overhead_vs_1dev"] = round(tput / base, 3)
            row["note"] = "virtual mesh shares one host's FLOPs; validates semantics/overhead, not scaling"
        else:
            row["efficiency_vs_1dev"] = round(tput / (base * n_dev), 3)
        print(json.dumps(row))

    base = None
    for shape in shapes:
        tput = measure_train(shape, args.batch)
        base = base or tput
        report("train", shape, tput, base, "edges_per_sec")
    base = None
    for shape in shapes:
        tput = measure_eval(shape)
        base = base or tput
        report("eval_rank", shape, tput, base, "cand_scores_per_sec")


if __name__ == "__main__":
    main()

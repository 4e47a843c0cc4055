"""Wikidata5M-MODE rehearsal with a quality bar: 300k-entity typed graph,
large_dataset=True semantics, from-scratch BERT-base, absolute MRR assertion.

The 20k on-chip quality check (tools/onchip_blp_20k.py) pins absolute
learning quality but runs the SMALL-dataset driver path. This rehearsal runs
the same typed-graph methodology at 15x scale through the LARGE-dataset path
the real Wikidata5M config takes (reference train.py:297-315,381-393 —
`large_dataset=True`: no global filter graph, no train-sample eval,
valid-only/test-only filter graphs, best-checkpoint reload), so a quality
regression specific to those semantics cannot hide behind the toy graph.

Task construction (see blp_tpu/data/synth.py): 10,000 types of ~30 members,
the type word leads each description, relation r links one fixed (head_type,
tail_type) pair. Perfect type knowledge alone yields raw MRR ≈ H(30)/30 =
0.133 against a type-blind candidate set; random is ~ln(N)/N ≈ 1e-3 at the
dev candidate-set scale. The default bar (filtered MRR ≥ 0.05) is ~50x
random and requires the encoder to actually read type words — it is NOT
reachable by degenerate embeddings.

Why 10k types, not 30k (measured, round 5): keeping the 20k graph's ~10
members/type at 300k entities means 30,000 type words, and that
cardinality does NOT break through the margin-loss plateau in any tested
budget (B=512/3.1k steps and B=128/13.3k steps both ended at chance,
~114-134 occurrences per type word — versus the 20k graph's 2k types
breaking through inside 1k steps at the same per-word occurrence rate).
The bottleneck is type-direction crowding in the 128-d projection, not
sample count; 10k types at 30 members each keeps the full 300k-entity,
~900k-edge scale while staying in the learnable regime.

    python tools/w5m_mode_rehearsal.py --epochs 4 --out /tmp/w5m_mode
"""
import argparse
import json
import os
import time

from blp_tpu.config import ExperimentConfig
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction

p = argparse.ArgumentParser()
p.add_argument("--out", default="/tmp/w5m_mode")
p.add_argument("--epochs", type=int, default=4)
p.add_argument("--entities", type=int, default=300_000)
p.add_argument("--types", type=int, default=10_000)
p.add_argument("--triples", type=int, default=900_000)
p.add_argument("--batch", type=int, default=128)
# Defaults mirror the PROVEN 20k quality recipe (B=128, lr=1e-4) at 15x
# scale, with the epoch budget raised to 4: the margin-loss breakthrough on
# the typed task is nonlinear (plateau -> cliff) and needs BOTH enough
# optimizer steps (BERT-body adaptation) and enough per-type-word
# occurrences (~100+; at 30k types each type word appears ~57x/epoch).
# Measured plateaus recorded in PERFORMANCE.md: B=512/lr=1e-4/2 epochs
# (3.1k steps, ~105 occ — chance) and B=128/2 epochs' first half
# (3.7k steps, ~31 occ — chance). Big-batch THROUGHPUT at the W5M
# operating point is covered by bench.py --w5m / family_bench, which carry
# no quality claim.
p.add_argument("--lr", type=float, default=1e-4)
p.add_argument("--run-id", default="w5m-mode")
p.add_argument("--bar", type=float, default=0.05,
               help="filtered test-MRR assertion bar (0 disables)")
# The reference's Wikidata5M holds out ~0.15% of entities (4.6k/6.9k of
# 4.8M); 3% here is still 20x that fraction and keeps the two held-out
# eval splits at ~25k triples (an 0.1 frac made each full eval pass
# ~80k triples — most of the rehearsal's wall clock for no extra signal).
p.add_argument("--inductive-frac", type=float, default=0.03)
args = p.parse_args()

d = os.path.join(args.out, "data",
                 f"typed{args.entities // 1000}k-t{args.types // 1000}k"
                 f"-f{args.inductive_frac:g}")
if not os.path.exists(os.path.join(d, "ind-train.tsv")):
    t0 = time.time()
    write_synth_dataset(
        d, num_entities=args.entities, num_relations=args.types,
        num_triples=args.triples, num_types=args.types,
        distinct_type_pairs=True, desc_words=(1, 3),
        inductive_frac=args.inductive_frac, seed=31)
    print(f"dataset written in {time.time() - t0:.0f}s")

cfg = ExperimentConfig(
    dataset=os.path.basename(d), data_dir=os.path.join(args.out, "data"),
    out_dir=os.path.join(args.out, "run"), inductive=True, model="blp",
    rel_model="transe", loss_fn="margin", dim=128, max_len=16,
    num_negatives=64, lr=args.lr, use_scheduler=True, batch_size=args.batch,
    emb_batch_size=2048, eval_batch_size=64, max_epochs=args.epochs,
    eval_every=1, tile=65536, bf16=True, remat=True,
    large_dataset=True, use_cached_text=True,
    run_id=args.run_id, resume="auto", seed=0)
t0 = time.time()
r = link_prediction(cfg)
r["wall_s"] = round(time.time() - t0, 1)
members = args.entities / args.types
r["type_ceiling_mrr"] = round(
    sum(1.0 / k for k in range(1, int(members) + 1)) / members, 4)  # H(M)/M
r["bar"] = args.bar
print(json.dumps(r))
if args.bar > 0:
    assert r["test_mrr_filt"] >= args.bar, (
        f"large_dataset-mode quality regression: filtered test MRR "
        f"{r['test_mrr_filt']:.4f} < bar {args.bar}")
    print(f"PASS: filtered test MRR {r['test_mrr_filt']:.4f} >= {args.bar}")

"""On-chip BLP quality target: 20k-entity typed graph, from-scratch
BERT-base, absolute filtered-MRR bar.

The reference's published MRRs need its pretrained bert-base-cased weights,
which this zero-egress image cannot fetch (BASELINE.md). This check stands
in: a 20k-entity graph with 2,000 types of ~10 members (type word leads each
description, relations link fixed type pairs), where perfect type knowledge
alone yields filtered MRR ~ H(10)/10 = 0.29 and random gives ~0.0005. A
from-scratch BERT that LEARNS to read the type word must land well above
random and is measured against the 0.29 type-ceiling.

    python tools/onchip_blp_20k.py --epochs 8 --out /tmp/blp20k
"""
import argparse
import json
import os
import time

from blp_tpu.config import ExperimentConfig
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction

p = argparse.ArgumentParser()
p.add_argument("--out", default="/tmp/blp20k")
p.add_argument("--epochs", type=int, default=8)
p.add_argument("--entities", type=int, default=20_000)
p.add_argument("--types", type=int, default=2_000)
p.add_argument("--triples", type=int, default=60_000)
p.add_argument("--batch", type=int, default=128)
p.add_argument("--fast-train", action="store_true",
               help="poly-GeLU training numerics (BertConfig.fast_train) — "
                    "used for the quality A/B against the exact-erf run")
p.add_argument("--adam-bf16", action="store_true",
               help="bf16 Adam first-moment storage (adam_bf16_mu) — used "
                    "for the quality A/B against the f32-state run")
p.add_argument("--dropout-bits", type=int, default=32,
               help="dropout mask draw width (BertConfig.dropout_bits) — "
                    "used for the quality A/B against the bernoulli run")
p.add_argument("--run-id", default=None)
args = p.parse_args()

d = os.path.join(args.out, "data", "typed20k")
if not os.path.exists(os.path.join(d, "ind-train.tsv")):
    t0 = time.time()
    write_synth_dataset(
        d, num_entities=args.entities, num_relations=args.types,
        num_triples=args.triples, num_types=args.types,
        distinct_type_pairs=True, desc_words=(1, 3), inductive_frac=0.1,
        seed=20)
    print(f"dataset written in {time.time() - t0:.0f}s")

cfg = ExperimentConfig(
    dataset="typed20k", data_dir=os.path.join(args.out, "data"),
    out_dir=os.path.join(args.out, "run"), inductive=True, model="blp",
    rel_model="transe", loss_fn="margin", dim=128, max_len=16,
    num_negatives=64, lr=1e-4, use_scheduler=True, batch_size=args.batch,
    emb_batch_size=2048, eval_batch_size=64, max_epochs=args.epochs,
    eval_every=max(args.epochs // 2, 1), tile=20_480, bf16=True,
    fast_train=args.fast_train, adam_bf16_mu=args.adam_bf16,
    dropout_bits=args.dropout_bits,
    # run_id concatenates every active knob — combined-flag runs must not
    # collide with (and auto-resume, via resume="auto") a single-knob run.
    run_id=args.run_id or "blp20k" + (
        ("-fast" if args.fast_train else "")
        + ("-adambf16" if args.adam_bf16 else "")
        + (f"-drop{args.dropout_bits}" if args.dropout_bits != 32 else "")),
    resume="auto", seed=0)
t0 = time.time()
r = link_prediction(cfg)
r["wall_s"] = round(time.time() - t0, 1)
r["type_ceiling_mrr"] = 0.293  # H(10)/10
print(json.dumps(r))

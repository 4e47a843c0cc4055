"""UMLS-scale smoke benchmark — the reference's ONLY published wall-clock
claim is that its UMLS smoke test (bert-bow + TransE, 5 epochs,
scripts/test-umls.sh) takes "less than 1 minute on GPU"
(reference README.md:72). UMLS: 135 entities, 46 relations, 5,216 train
triples. This measures the same workload shape end-to-end on one chip —
dataset build, 5 training epochs with per-epoch evals, final filtered
valid+test evals, embedding export.

    python tools/umls_smoke.py --out /tmp/umls_smoke
"""
import argparse
import json
import os
import time

from blp_tpu.config import ExperimentConfig
from blp_tpu.data.synth import write_synth_dataset
from blp_tpu.train import link_prediction

p = argparse.ArgumentParser()
p.add_argument("--out", default="/tmp/umls_smoke")
p.add_argument("--epochs", type=int, default=5)
args = p.parse_args()

d = os.path.join(args.out, "data", "umls-like")
if not os.path.exists(os.path.join(d, "ind-train.tsv")):
    write_synth_dataset(d, num_entities=135, num_relations=46,
                        num_triples=5216, seed=1)

t0 = time.time()
r = link_prediction(ExperimentConfig(
    dataset="umls-like", data_dir=os.path.join(args.out, "data"),
    out_dir=os.path.join(args.out, "run"), inductive=True, model="bert-bow",
    rel_model="transe", loss_fn="margin", max_len=32, num_negatives=32,
    lr=2e-5, batch_size=64, emb_batch_size=512, eval_batch_size=64,
    max_epochs=args.epochs, run_id="umls-smoke", seed=0))
wall = time.time() - t0
print(json.dumps({"metric": "umls_smoke_seconds", "value": round(wall, 1),
                  "unit": "s", "reference_claim": "<60 s on unspecified GPU",
                  "test_mrr_filt": r["test_mrr_filt"]}))

# Optional: --epochs N override for marginal-cost measurement

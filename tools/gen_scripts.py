"""Generate the launcher-script matrix (the reference ships 48 hand-written
scripts; here they're generated to stay consistent with the CLI).

Run: python tools/gen_scripts.py [scripts_dir]
"""

from __future__ import annotations

import os
import stat
import sys

DATASETS = {
    # dataset: (max_len, batch_size, emb_batch_size, eval_batch_size,
    #           blp_epochs, word_epochs, blp_lr, large)
    "WN18RR": (32, 64, 512, 64, 40, 80, "2e-5", False),
    "FB15k-237": (32, 64, 512, 64, 40, 80, "2e-5", False),
    "Wikidata5M": (64, 1024, 12288, 64, 5, 5, "5e-5", True),
}

BLP_REL_MODELS = ("transe", "distmult", "complex", "simple")
WORD_MODELS = {
    # model: (lr, use_scheduler)
    "glove-bow": ("1e-3", False),
    "bert-bow": ("1e-4", False),
    "glove-dkrl": ("1e-4", False),
    "bert-dkrl": ("1e-4", False),
}

UMLS_PREAMBLE = """\
# UMLS itself is not redistributable; when data/umls is absent, synthesize a
# UMLS-scale stand-in (135 entities, 46 relations, typed => learnable) so the
# smoke test runs out of the box with no downloads.
[ -d data/umls ] || python -c "from blp_tpu.data.synth import \\
write_synth_dataset as w; w('data/umls', num_entities=135, num_relations=46, \\
num_triples=5200, num_types=8, seed=0)"

"""


def emit(path: str, args: dict, preamble: str = ""):
    lines = [f"{k}={v} \\" for k, v in args.items()]
    lines[-1] = lines[-1][:-2]
    with open(path, "w") as f:
        f.write("#!/bin/bash\n\n" + preamble +
                "python -m blp_tpu.train link_prediction with \\\n" +
                "\n".join(lines) + "\n")
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP)


def base_args(dataset, model, rel_model, lr, max_epochs, use_scheduler,
              regularizer):
    ml, bs, ebs, evbs, _, _, _, large = DATASETS[dataset]
    return {
        "dataset": f"'{dataset}'",
        "inductive": True,
        "dim": 128,
        "model": f"'{model}'",
        "rel_model": f"'{rel_model}'",
        "loss_fn": "'margin'",
        "encoder_name": "'bert-base-cased'",
        "regularizer": regularizer,
        "max_len": ml,
        "num_negatives": 64,
        "lr": lr,
        "use_scheduler": use_scheduler,
        "batch_size": bs,
        "emb_batch_size": ebs,
        "eval_batch_size": evbs,
        "max_epochs": max_epochs,
        "checkpoint": "None",
        "use_cached_text": False,
        "large_dataset": large,
        "bf16": model == "blp",
        # Wikidata5M's B=1024 x L=64 BLP step does NOT fit 16 GB HBM
        # without rematerialization: per layer the bf16 stashes are ~2 GB
        # (dominated by the 768 MB (2B/4, 128, 3072) FFN temp), ~24 GB over
        # 12 layers. remat=8 = partial remat of 8 of 12 layers — the
        # measured sweet spot with ~4 GB headroom (full sweep in
        # PERFORMANCE.md; this launcher config measures 942.7 t/s at
        # 1086.2 ms/step). Numerics are untouched by remat; the further
        # fast_train knob (+~4%, quality-parity A/B'd) is left off in
        # presets to keep reference numerics.
        **({"remat": 8} if large and model == "blp" else {}),
    }


def main(out_dir: str = "scripts"):
    os.makedirs(out_dir, exist_ok=True)
    names = []

    for dataset, (ml, bs, ebs, evbs, blp_ep, word_ep, blp_lr, large) in \
            DATASETS.items():
        ds_slug = dataset.lower().replace("-", "")
        for rel in BLP_REL_MODELS:
            args = base_args(dataset, "blp", rel, blp_lr, blp_ep, True, 0)
            name = f"blp-{rel}-{ds_slug}.sh"
            emit(os.path.join(out_dir, name), args)
            names.append(name)
            # Pretrained-eval variant (reference: *-pretrained.sh —
            # max_epochs=0 re-derives published metrics from a checkpoint).
            p = dict(args)
            p["max_epochs"] = 0
            p["checkpoint"] = f"'output/model-blp-{rel}-{ds_slug}.npz'"
            p["use_cached_text"] = True
            pname = f"blp-{rel}-{ds_slug}-pretrained.sh"
            emit(os.path.join(out_dir, pname), p)
            names.append(pname)
        for model, (lr, sched) in WORD_MODELS.items():
            args = base_args(dataset, model, "transe", lr, word_ep, sched,
                             "1e-2")
            name = f"{model}-{ds_slug}.sh"
            emit(os.path.join(out_dir, name), args)
            names.append(name)
            if model.endswith("bow"):
                # The reference ships pretrained-eval variants for the BOW
                # models too (e.g. scripts/bert-bow-wn18rr-pretrained.sh).
                p = dict(args)
                p["max_epochs"] = 0
                p["checkpoint"] = f"'output/model-{model}-{ds_slug}.npz'"
                p["use_cached_text"] = True
                pname = f"{model}-{ds_slug}-pretrained.sh"
                emit(os.path.join(out_dir, pname), p)
                names.append(pname)

    # UMLS smoke test (reference: scripts/test-umls.sh — "<1 min on GPU").
    args = base_args("WN18RR", "bert-bow", "transe", "1e-3", 5, False, "1e-2")
    args.update({"dataset": "'umls'", "inductive": False, "large_dataset": False,
                 "bf16": False})
    emit(os.path.join(out_dir, "test-umls.sh"), args, preamble=UMLS_PREAMBLE)
    names.append("test-umls.sh")

    print(f"Wrote {len(names)} scripts to {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:])

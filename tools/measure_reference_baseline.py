"""Measure the reference implementation's training throughput on this host.

Reconstructs the reference hot path in PyTorch (reference: train.py:343-350 —
HF BertModel forward on 2B descriptions, [CLS] projection, TransE scoring of
positives + in-batch negatives, margin loss, Adam step) with random-init
weights (this environment has no network for pretrained downloads; throughput
is weight-independent). Writes bench_baseline.json consumed by bench.py.

The reference repo has no GPU here — torch is CPU-only — so this measures the
reference on CPU. bench.py reports our TPU throughput against it and labels
the hardware in the JSON so the comparison is explicit.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from transformers import BertConfig, BertModel

B, L, K, DIM = 16, 32, 16, 128
STEPS, WARMUP = 3, 1


def main():
    torch.manual_seed(0)
    encoder = BertModel(BertConfig())
    proj = nn.Linear(768, DIM, bias=False)
    rel_emb = nn.Embedding(16, DIM)
    model_params = (list(encoder.parameters()) + list(proj.parameters())
                    + list(rel_emb.parameters()))
    opt = torch.optim.Adam(model_params, lr=2e-5)

    rng = np.random.default_rng(0)
    tok = torch.from_numpy(rng.integers(1, 28996, (2 * B, L)))
    mask = torch.ones(2 * B, L)
    rels = torch.from_numpy(rng.integers(0, 16, (B,)))
    neg_idx = torch.from_numpy(rng.integers(0, 2 * B, (B, K, 2)))

    def step():
        embs = proj(encoder(tok, attention_mask=mask)[0][:, 0])
        embs = F.normalize(embs, dim=-1)
        ent = embs.view(B, 2, DIM)
        r = rel_emb(rels)
        pos = -(ent[:, 0] + r - ent[:, 1]).abs().sum(-1, keepdim=True)
        flat = embs
        neg = -(flat[neg_idx[..., 0]] + r.unsqueeze(1) - flat[neg_idx[..., 1]]).abs().sum(-1)
        loss = F.relu(1 - pos + neg).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(WARMUP):
        step()
    t0 = time.time()
    for _ in range(STEPS):
        step()
    dt = (time.time() - t0) / STEPS
    tput = B / dt
    out = {
        "metric": "train_triples_per_sec",
        "value": tput,
        "unit": "triples/s",
        "hardware": "cpu (torch, reference-equivalent hot path)",
        "config": {"batch": B, "max_len": L, "num_negatives": K,
                   "encoder": "bert-base (random init)", "rel_model": "transe"},
        "sec_per_step": dt,
    }
    with open("bench_baseline.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

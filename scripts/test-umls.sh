#!/bin/bash

# UMLS itself is not redistributable; when data/umls is absent, synthesize a
# UMLS-scale stand-in (135 entities, 46 relations, typed => learnable) so the
# smoke test runs out of the box with no downloads.
[ -d data/umls ] || python -c "from blp_tpu.data.synth import \
write_synth_dataset as w; w('data/umls', num_entities=135, num_relations=46, \
num_triples=5200, num_types=8, seed=0)"

python -m blp_tpu.train link_prediction with \
dataset='umls' \
inductive=False \
dim=128 \
model='bert-bow' \
rel_model='transe' \
loss_fn='margin' \
encoder_name='bert-base-cased' \
regularizer=1e-2 \
max_len=32 \
num_negatives=64 \
lr=1e-3 \
use_scheduler=False \
batch_size=64 \
emb_batch_size=512 \
eval_batch_size=64 \
max_epochs=5 \
checkpoint=None \
use_cached_text=False \
large_dataset=False \
bf16=False
